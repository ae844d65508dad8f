"""Per-query profiler for the optimization rounds.

Usage:
    python tools/profile_query.py [--sf DIR] [--plans OUTDIR] [--suffix _before]
        [--no-prewarm] [--runs 3] name1 name2 ...

For each named registry query: build it against the bench scale
(default sf0.1), run cold + warm x RUNS through the noop sink (the
bench's timed action), and write `.explain('formatted')` to
OUTDIR/<name><suffix>.txt.  Mirrors bench.py's session + family-cache
pre-warm so times are comparable to bench cells, and labels every job
so the SQL UI (if enabled) is readable.
"""

from __future__ import annotations

import argparse
import gc
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="directory for explain dumps (optional)")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument(
        "--runs",
        type=int,
        default=3,
        help="warm runs per query, >= 1 (one cold run is always added first, "
        "so each query executes runs+1 times)",
    )
    ap.add_argument("--no-prewarm", action="store_true")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="build each query and dump its plan without timed noop runs "
        "(for noisy-host sessions where only plan shape is wanted)",
    )
    args = ap.parse_args()
    if args.runs < 1:
        # min(warm)/min(builds[1:]) below need at least one warm run
        ap.error("--runs must be >= 1 (use --plan-only for untimed dumps)")

    from soccerpredictor_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("profile")
    qs = entry_mod.queries()
    sf = args.sf

    # same table warm as bench.py
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            if t == "events":
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(p).count()

    if not args.no_prewarm:
        for warmer in ("dedup_clusters", "embedding_threshold_sweep",
                       "graph_degree_stats", "semdedup"):
            if warmer in qs:
                t0 = time.perf_counter()
                try:
                    qs[warmer](spark, sf).write.format("noop").mode("overwrite").save()
                    print(f"prewarm {warmer}: {time.perf_counter()-t0:.2f}s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"prewarm {warmer} FAILED: {e}", flush=True)
                gc.collect()

    for name in args.names:
        if name not in qs:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        if args.plan_only:
            t0 = time.perf_counter()
            df = qs[name](spark, sf)
            dt = time.perf_counter() - t0
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                    f.write(buf.getvalue())
            print(f"{name}: plan dumped (build {dt:.2f}s)", flush=True)
            del df
            gc.collect()
            continue
        times = []
        builds = []
        for i in range(args.runs + 1):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            builds.append(t1 - t0)
            if i == 0 and args.plans:
                os.makedirs(args.plans, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                    f.write(buf.getvalue())
            del df
            gc.collect()
        spark.sparkContext.setJobDescription(None)
        warm = times[1:]
        print(
            f"{name}: cold {times[0]:.2f}s  warm {' '.join(f'{t:.2f}' for t in warm)}"
            f"  (warm min {min(warm):.2f}; build {builds[0]:.2f} cold"
            f" / {min(builds[1:]):.2f} warm-min)",
            flush=True,
        )


if __name__ == "__main__":
    main()
