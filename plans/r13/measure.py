#!/usr/bin/env python
"""Round-12 optimization measurement harness (guide §1).

Times individual catalog queries in isolation with the noop sink (so the
computation is measured, not collect/driver transfer) and captures
``explain("formatted")`` for each, labelled in the UI via
setJobDescription.  Usage:

    python plans/r13/measure.py <query> [<query> ...] [--runs N]
        [--sf DIR] [--tag before|after] [--no-plan]

Writes plans to plans/r13/<query>_<tag>.txt and prints one timing line
per query (min over N timed runs after one warm-up, fresh plan each run,
same drop-leftover-caches hygiene as bench.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from graphdb_for_drones_spark.session import get_spark  # noqa: E402
from graphdb_for_drones_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default=None, help="write plans/r13/<q>_<tag>.txt")
    ap.add_argument("--collect", action="store_true", help="time .collect() like bench.py instead of the noop sink")
    ap.add_argument("--profile", action="store_true", help="enable the UI and dump per-stage metrics after each timed run")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = {"spark.ui.enabled": "true"} if args.profile else None
    spark = get_spark("measure-r13", master=f"local[{cpus}]", shuffle_partitions=int(cpus), extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.abspath(__file__))

    def drop_leftover_caches():
        sc = spark.sparkContext
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        sc._jvm.System.gc()

    def run_once(name: str) -> float:
        # plan construction INSIDE the timed region: eager-pinned kernels
        # (localCheckpoint during build) do their work here, and bench.py
        # times the function call too
        t0 = time.time()
        df = QUERIES[name](spark, args.sf)
        if args.collect:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        drop_leftover_caches()
        return dt

    # JVM warm-up: one run of the first query untimed twice
    spark.sparkContext.setJobDescription("warmup")
    run_once(args.names[0])

    for name in args.names:
        if name not in QUERIES:
            print(f"{name}: NOT IN CATALOG", flush=True)
            continue
        if args.tag:
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            plan = QUERIES[name](spark, args.sf)._jdf.queryExecution().explainString(mode)
            with open(os.path.join(here, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        run_once(name)  # warm-up (page cache, codegen)
        times = []
        stage_mark = None
        if args.profile:
            import urllib.request, json as _json
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            def stages():
                with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
                    return _json.load(r)
            stage_mark = max((s["stageId"] for s in stages()), default=-1)
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            times.append(run_once(name))
        if args.profile:
            new = [s for s in stages() if s["stageId"] > stage_mark]
            new.sort(key=lambda s: -s.get("executorRunTime", 0))
            print(f"--- {name}: top stages over {args.runs} timed runs (executorRunTime ms / tasks / shuffleRead MB / desc)")
            for s in new[:14]:
                desc = (s.get("description") or s.get("name", ""))[:110]
                print(f"  {s.get('executorRunTime',0):8d}ms cpu={s.get('executorCpuTime',0)//1000000:7d}ms t={s.get('numCompleteTasks',0):3d} "
                      f"sr={s.get('shuffleReadBytes',0)//1048576}MB {desc}", flush=True)
        print(
            f"{name}: min={min(times):.3f} med={sorted(times)[len(times)//2]:.3f} "
            f"all={[round(t, 3) for t in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
