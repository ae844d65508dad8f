"""Registry-wide physical-plan audit (optimization rounds).

For every registered query (or a subset), build it at the given scale
and tabulate plan-shape stats from the executed plan string:

  key exchanges (hash/range, excluding fan_out's round-robin and
  reused exchanges), round-robin exchanges, sort-merge joins,
  shuffled-hash joins, broadcast joins (hash + nested-loop),
  Python-boundary nodes (BatchEvalPython / ArrowEvalPython /
  MapInArrow / MapInPandas / FlatMapGroupsInPandas), file scans,
  whether any scan carries PushedFilters, sorts, and window nodes.

Output: TSV on stdout (one row per query) — meant to be diffed between
rounds and grepped for anomalies (e.g. a SortMergeJoin where a
broadcast was expected, or an unexpected second FileScan).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from soccerpredictor_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plan-audit")
    qs = entry_mod.queries()
    names = args.names or list(qs)

    cols = [
        "query", "key_exch", "rr_exch", "reused_exch", "smj", "shj", "bhj",
        "bnlj", "cartesian", "py_nodes", "filescan", "scan_rdd", "pushed",
        "sorts", "windows", "err",
    ]
    print("\t".join(cols), flush=True)
    for name in names:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            lines = plan.splitlines()
            key_exch = sum(
                1 for ln in lines
                if "Exchange" in ln and "ReusedExchange" not in ln
                and "RoundRobinPartitioning" not in ln
            )
            rr = sum(
                1 for ln in lines
                if "Exchange" in ln and "RoundRobinPartitioning" in ln
            )
            reused = sum(1 for ln in lines if "ReusedExchange" in ln)
            smj = plan.count("SortMergeJoin")
            shj = plan.count("ShuffledHashJoin")
            bhj = plan.count("BroadcastHashJoin")
            bnlj = plan.count("BroadcastNestedLoopJoin")
            cart = plan.count("CartesianProduct")
            py = sum(
                plan.count(t)
                for t in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                          "MapInPandas", "FlatMapGroupsInPandas")
            )
            fscan = sum(1 for ln in lines if re.search(r"FileScan|Scan parquet", ln))
            srdd = sum(1 for ln in lines if "Scan ExistingRDD" in ln)
            pushed = int(bool(re.search(r"PushedFilters: \[[^\]]", plan)))
            sorts = sum(1 for ln in lines if re.search(r"\bSort\b(?!MergeJoin)", ln))
            wins = sum(1 for ln in lines if re.search(r"\bWindow\b|WindowGroupLimit", ln))
            print(
                "\t".join(str(x) for x in (
                    name, key_exch, rr, reused, smj, shj, bhj, bnlj, cart,
                    py, fscan, srdd, pushed, sorts, wins, "",
                )),
                flush=True,
            )
            del df
        except Exception as e:  # noqa: BLE001
            print(f"{name}\t" + "\t".join([""] * 14) + f"\t{type(e).__name__}: {e}"[:160],
                  flush=True)


if __name__ == "__main__":
    main()
