#!/usr/bin/env python3
"""Round-6 optimization helper bench.  ``bench.py`` is FROZEN for
measurement; this file exists so the optimization work can time
individual queries in isolation (guide §1.4: noop sink, labeled jobs)
and dump ``explain("formatted")`` plans without touching the frozen
harness.

Usage:
  python bench_extra.py                        # all BENCH_QUERIES, sf1.0
  python bench_extra.py --queries a,b --reps 3
  python bench_extra.py --explain plans/r06 --suffix before

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32).

Prints one JSON line: {"queries": {name: best_sec}, "samples": {...},
"sf_dir": ..., "loadavg": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default="",
                    help="directory to write <name>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip timing")
    args = ap.parse_args()

    from __spark_entry__ import queries as entry_queries
    from bench import BENCH_QUERIES
    from table_transformer_spark.pipeline.session import get_spark

    QUERIES = entry_queries()
    names = ([q.strip() for q in args.queries.split(",") if q.strip()]
             or [q for q in BENCH_QUERIES])

    spark = get_spark(app_name="ttspark-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: worker pool + parquet reader + shuffle
    from pyspark.sql import functions as F
    from table_transformer_spark.fixtures.spark_io import documents_df
    t0 = time.perf_counter()
    documents_df(spark, 2 * CPUS).write.format("noop").mode(
        "overwrite").save()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (li.limit(2048).groupBy("l_returnflag")
     .agg(F.sum("l_quantity").alias("s")).orderBy("l_returnflag")
     .write.format("noop").mode("overwrite").save())
    print(f"[bench_extra] warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        import contextlib
        import io
        for name in names:
            try:
                df = QUERIES[name](spark, SF_DIR)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            except Exception as exc:  # streaming queries have no df plan
                plan = f"(explain unavailable: {exc})"
            out = os.path.join(args.explain,
                               f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"[bench_extra] wrote {out}", file=sys.stderr)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    probes: list[float] = []
    if not args.no_time:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from probe_gate import probe_sec
        for rep in range(args.reps):
            # gate each pass on host health: in a co-tenant degradation
            # window walls inflate 2-10x and best-of-N just measures
            # the least-bad noise.  Wait (bounded) for a healthy probe.
            for _ in range(20):
                p = probe_sec()
                probes.append(round(p, 3))
                if p <= 0.75:
                    break
                print(f"[bench_extra] degraded host (probe {p:.2f}s) — "
                      f"waiting 30s", file=sys.stderr)
                time.sleep(30)
            for name in names:
                spark.sparkContext.setJobDescription(
                    f"bench_extra:{name}")
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                wall = time.perf_counter() - t0
                spark.sparkContext.setJobDescription(None)
                samples[name].append(round(wall, 3))
                timings[name] = round(
                    min(timings.get(name, float("inf")), wall), 3)
                print(f"[bench_extra] {name}: {wall:.3f}s "
                      f"(rep {rep + 1}, best {timings[name]}s)",
                      file=sys.stderr)

    print(json.dumps({"queries": timings, "samples": samples,
                      "sf_dir": SF_DIR, "probes": probes,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
