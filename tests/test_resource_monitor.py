"""ResourceMonitor: /proc tree sampling sanity."""

import time

from graphdb_for_drones_spark.resource_monitor import (
    ResourceMonitor,
    _descendants,
    _read_tree,
)


def test_descendants_includes_self():
    import os

    pids = _descendants(os.getpid())
    assert os.getpid() in pids


def test_read_tree_positive():
    ticks, rss = _read_tree(__import__("os").getpid())
    assert ticks >= 0 and rss > 0  # this process has RSS


def test_monitor_short_run_has_samples():
    mon = ResourceMonitor(interval=0.2).start()
    # burn a little CPU so the delta is visible
    x = 0
    t0 = time.time()
    while time.time() - t0 < 0.5:
        x += 1
    stats = mon.stop()
    assert stats["samples"] >= 2
    assert stats["rss_avg_mb"] > 0
    assert stats["cpu_avg_pct"] is not None and stats["cpu_avg_pct"] > 0
    assert stats["cpu_max_pct"] >= stats["cpu_avg_pct"] - 1e-9
    for k in ("cpu_p95_pct", "rss_max_mb", "rss_p95_mb"):
        assert stats[k] is not None


def test_monitor_sub_interval_run():
    mon = ResourceMonitor(interval=30.0).start()  # thread never fires
    stats = mon.stop()  # final take() still yields one CPU sample
    assert stats["samples"] >= 2
    assert stats["cpu_avg_pct"] is not None


def test_p95_never_exceeds_max():
    # statistics.quantiles extrapolates beyond the data on small samples;
    # the summary must clamp (regression: cpu_p95 > cpu_max in reports)
    mon = ResourceMonitor(interval=30.0)
    mon.cpu_pct = [100.0, 900.0, 1780.0]  # skewed small sample
    mon.rss_bytes = [1 << 30, 2 << 30, 3 << 30]
    s = mon.summary()
    assert s["cpu_p95_pct"] <= s["cpu_max_pct"]
    assert s["rss_p95_mb"] <= s["rss_max_mb"]
