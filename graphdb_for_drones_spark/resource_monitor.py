"""1 Hz CPU%/RSS sampling for benchmark runs — the reference's
resource-usage metric (demo_sqlite_cdc/02_benchmark/
01_local_cdc_capture.py:17-26,138-145 samples psutil cpu_percent/rss
once per second in a monitor thread and reports avg/max/p95).

psutil is not available in this environment, so samples come straight
from ``/proc``.  The measured tree is the Python driver AND all its
descendants: unlike the reference (whose work is in-process psycopg),
this engine's memory and CPU live mostly in the Spark JVM child
process, so a self-only sample would miss the engine entirely.
"""

from __future__ import annotations

import os
import statistics
import threading
import time

_CLK = os.sysconf("SC_CLK_TCK")
_PAGE = os.sysconf("SC_PAGE_SIZE")


def _descendants(root: int) -> list[int]:
    """root + all live descendant pids via /proc/<pid>/task/*/children."""
    out, stack = [root], [root]
    while stack:
        p = stack.pop()
        try:
            tasks = os.listdir(f"/proc/{p}/task")
        except OSError:
            continue
        for t in tasks:
            try:
                with open(f"/proc/{p}/task/{t}/children") as f:
                    kids = [int(c) for c in f.read().split()]
            except (OSError, ValueError):
                continue
            out.extend(kids)
            stack.extend(kids)
    return out


def _read_tree(root: int) -> tuple[int, int]:
    """(cpu ticks utime+stime, rss bytes) summed over the process tree."""
    ticks = 0
    rss_pages = 0
    for p in _descendants(root):
        try:
            with open(f"/proc/{p}/stat") as f:
                # comm may contain spaces/parens: split after the LAST ')'
                rest = f.read().rsplit(")", 1)[1].split()
            # /proc stat field k (1-based, utime=14, stime=15) → rest[k-3]
            ticks += int(rest[11]) + int(rest[12])
            with open(f"/proc/{p}/statm") as f:
                rss_pages += int(f.read().split()[1])
        except (OSError, IndexError, ValueError):
            continue  # process exited between listdir and read
    return ticks, rss_pages * _PAGE


class ResourceMonitor:
    """Background sampler: CPU% (of one core, so >100 on multicore — the
    reference's psutil convention) and RSS for self + descendants.

    Usage::

        mon = ResourceMonitor().start()
        ...  # workload
        stats = mon.stop()   # {cpu_avg_pct, cpu_max_pct, cpu_p95_pct,
                             #  rss_avg_mb, rss_max_mb, rss_p95_mb, samples}

    A final reading is always taken at ``stop()``, so even sub-interval
    workloads get one whole-run CPU sample.
    """

    def __init__(self, interval: float = 1.0, pid: int | None = None):
        self.interval = interval
        self.pid = pid or os.getpid()
        self.cpu_pct: list[float] = []
        self.rss_bytes: list[int] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last: tuple[float, int] | None = None  # (wall, ticks)

    def _take(self) -> None:
        now = time.time()
        ticks, rss = _read_tree(self.pid)
        if self._last is not None:
            dt = now - self._last[0]
            if dt > 0:
                self.cpu_pct.append(
                    (ticks - self._last[1]) / _CLK / dt * 100.0
                )
        self._last = (now, ticks)
        self.rss_bytes.append(rss)

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            self._take()

    def start(self) -> "ResourceMonitor":
        self._take()  # baseline reading (records RSS, arms CPU delta)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
        self._take()  # final reading: guarantees >=1 CPU sample
        return self.summary()

    def summary(self) -> dict:
        def p95(xs):
            if len(xs) < 2:
                return xs[0]
            # quantiles() (exclusive method) extrapolates past the data
            # range on small samples — a p95 above the observed max is
            # nonsense for a resource report, so clamp
            return min(statistics.quantiles(xs, n=100)[94], max(xs))

        cpu, rss = self.cpu_pct, self.rss_bytes
        mb = 1024 * 1024
        return {
            "cpu_avg_pct": round(statistics.mean(cpu), 1) if cpu else None,
            "cpu_max_pct": round(max(cpu), 1) if cpu else None,
            "cpu_p95_pct": round(p95(cpu), 1) if cpu else None,
            "rss_avg_mb": round(statistics.mean(rss) / mb, 1) if rss else None,
            "rss_max_mb": round(max(rss) / mb, 1) if rss else None,
            "rss_p95_mb": round(p95(rss) / mb, 1) if rss else None,
            "samples": len(rss),
        }
