"""One-off registration-readiness sweep: run EVERY staged operator
(including the two-table and streaming specials) against its DuckDB
twin at sf0.01 — the DRIVER's correctness scale — with exact value
comparison. Run before splicing staged entries into the registry:

    python tools/verify_staged_sf001.py
"""

import sys, time
sys.path.insert(0, "/root/repo")
import importlib
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions","16").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from soccerpredictor_spark.sources.catalog import read_table
from soccerpredictor_spark.operators.scale import clear_caches
sys.path.insert(0, "/root/repo/tests")
from test_staged_round11 import STAGED

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def compare(name, sdf, odf):
    if len(sdf) != len(odf):
        return f"rows {len(sdf)} vs {len(odf)}"
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    if sc != oc:
        return f"cols {sc} vs {oc}"
    a = sdf[sc].sort_values(sc).reset_index(drop=True)
    b = odf[oc].sort_values(oc).reset_index(drop=True)
    for c in sc:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} <= {"i","u","f"} and (ka in "iu") != (kb in "iu"):
            return f"{c}: kind {a[c].dtype} vs {b[c].dtype}"
        try:
            pd.testing.assert_series_equal(a[c], b[c], check_dtype=False, check_names=False, check_exact=True)
        except AssertionError as e:
            return f"{c}: {str(e).splitlines()[-1][:120]}"
    return None

fails = []
for name, module, table in STAGED:
    clear_caches()
    t0 = time.time()
    try:
        mod = importlib.import_module(module)
        sdf = getattr(mod, name)(read_table(spark, SF, table)).toPandas()
        odf = con.execute(getattr(mod, f"{name}_sql")()).fetchdf()
        msg = compare(name, sdf, odf)
    except Exception as e:
        msg = f"ERROR {type(e).__name__}: {str(e)[:160]}"
    print(f"{name}: {'OK' if msg is None else 'FAIL ' + msg} ({time.time()-t0:.1f}s)", flush=True)
    if msg: fails.append(name)

# two-table + streaming staged ops
from soccerpredictor_spark.operators.sketch import bloom_size_sweep, bloom_size_sweep_sql
from soccerpredictor_spark.operators.joins import ship_lag_profile, ship_lag_profile_sql
from soccerpredictor_spark.streaming.events import value_histogram_available_now, value_histogram_sql
extra = [
    ("bloom_size_sweep", lambda: bloom_size_sweep(read_table(spark, SF, "orders"), read_table(spark, SF, "customer")), bloom_size_sweep_sql()),
    ("ship_lag_profile", lambda: ship_lag_profile(read_table(spark, SF, "lineitem"), read_table(spark, SF, "orders")), ship_lag_profile_sql()),
    ("value_histogram", lambda: value_histogram_available_now(spark, SF), value_histogram_sql()),
]
for name, build, sql in extra:
    clear_caches()
    t0 = time.time()
    try:
        msg = compare(name, build().toPandas(), con.execute(sql).fetchdf())
    except Exception as e:
        msg = f"ERROR {type(e).__name__}: {str(e)[:160]}"
    print(f"{name}: {'OK' if msg is None else 'FAIL ' + msg} ({time.time()-t0:.1f}s)", flush=True)
    if msg: fails.append(name)
print("FAILS:", fails)
