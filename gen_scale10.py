"""Generate a 10x scale-out copy of the sf0.1 documents/embeddings
fixtures with TRUE-DUPLICATE DENSITY HELD CONSTANT, for the
pair-generation scaling curves in PLANS.md (round-5 verdict #5).

Construction (deterministic, no RNG state):

- documents: 10 vocabulary-disjoint shards. Shard k remaps every
  token t -> "t_k" and offsets doc_id by k * 10_000_000. Within a
  shard the shingle structure is BIT-IDENTICAL to sf0.1 (same
  near-dup pairs, same df profile over its own vocabulary); across
  shards no shingle is ever shared. Total true near-dup pairs are
  therefore exactly 10x sf0.1's — i.e., linear in corpus size — so
  any super-linear growth measured on this corpus is an algorithmic
  artifact (bucket collisions, skew, shuffle scaling), which is
  precisely what the curve is meant to expose.

- embeddings: 10 shards; shard k applies a fixed sign-flip mask to
  the vector axes (dimension d flipped iff md5("{k}:{d}") is odd) and
  offsets vec_id. A common axis-flip preserves every WITHIN-shard dot
  product and norm exactly (flips cancel pairwise), so within-shard
  near-dup structure is identical to sf0.1; cross-shard cosines are
  sign-scrambled ~ random, contributing no systematic new pairs.

Output: $SCALE10_DIR (default /tmp/sf1x)/documents.parquet,
embeddings.parquet. Usage: python gen_scale10.py
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SCALE10_DIR", "/tmp/sf1x")
SHARDS = 10
DOC_ID_STRIDE = 10_000_000
VEC_ID_STRIDE = 10_000_000


def main() -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    out_docs = []
    for k in range(SHARDS):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * DOC_ID_STRIDE
        suffix = f"_{k}"
        d["text"] = d["text"].map(
            lambda t: " ".join(w + suffix for w in t.split())
        )
        d["n_chars"] = d["text"].str.len().astype("int64")
        out_docs.append(d)
    import pandas as pd

    alldocs = pd.concat(out_docs, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(alldocs, preserve_index=False),
                   os.path.join(OUT, "documents.parquet"))
    print(f"documents: {len(alldocs)} rows ({len(docs)} x {SHARDS})")

    emb = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchdf()
    dim = len(emb["embedding"].iloc[0])
    mat = np.stack(emb["embedding"].to_numpy())  # (n, dim) float
    out_emb = []
    for k in range(SHARDS):
        mask = np.array(
            [
                1.0 if int(hashlib.md5(f"{k}:{d}".encode()).hexdigest(), 16) % 2 == 0
                else -1.0
                for d in range(dim)
            ],
            dtype=mat.dtype,
        )
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * VEC_ID_STRIDE
        flipped = mat * mask[None, :]
        e["embedding"] = list(flipped)
        out_emb.append(e)
    allemb = pd.concat(out_emb, ignore_index=True)
    # preserve the list<float> arrow type of the source
    src_schema = pq.read_schema(os.path.join(SRC, "embeddings.parquet"))
    tbl = pa.Table.from_pandas(allemb, preserve_index=False)
    cast = tbl.cast(pa.schema([src_schema.field(n) for n in tbl.schema.names]))
    pq.write_table(cast, os.path.join(OUT, "embeddings.parquet"))
    print(f"embeddings: {len(allemb)} rows ({len(emb)} x {SHARDS}, dim {dim})")

    # events: 10 shards with DISJOINT user populations AND disjoint
    # time ranges (each shard shifted by k x 40 days, past the 30-day
    # span) — co-activity bucket sizes and edge density are therefore
    # IDENTICAL per shard, so the expected graph-operator curve is
    # linear in rows; overlapping timelines would instead inflate
    # per-bucket user counts 10x and the cap would zero the graph out.
    ev = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/events.parquet') ORDER BY event_id"
    ).fetchdf()
    out_ev = []
    for k in range(SHARDS):
        e = ev.copy()
        e["event_id"] = e["event_id"] + k * DOC_ID_STRIDE
        e["user_id"] = e["user_id"] + k * 1_000_000
        e["ts"] = e["ts"] + pd.Timedelta(days=40 * k)
        out_ev.append(e)
    allev = pd.concat(out_ev, ignore_index=True)
    ev_schema = pq.read_schema(os.path.join(SRC, "events.parquet"))
    tbl_ev = pa.Table.from_pandas(allev, preserve_index=False)
    cast_ev = tbl_ev.cast(
        pa.schema([ev_schema.field(n) for n in tbl_ev.schema.names])
    )
    pq.write_table(cast_ev, os.path.join(OUT, "events.parquet"))
    print(f"events: {len(allev)} rows ({len(ev)} x {SHARDS})")

    # orders + customer: 10 shards with DISJOINT key spaces (custkey
    # and orderkey offset per shard). Prices/priorities are copied
    # verbatim, so the per-shard score distribution — and therefore
    # the Bloom fp geometry, the per-customer Pareto structure, and
    # the distinct-score count per AUC bucket — is identical per
    # shard; the expected curve for the orders-family operators is
    # linear in rows.
    for tname, key_cols in (
        ("orders", {"o_orderkey": DOC_ID_STRIDE, "o_custkey": 1_000_000}),
        ("customer", {"c_custkey": 1_000_000}),
        # lineitem shards ride the SAME orderkey offsets as orders, so
        # orders ⋈ lineitem stays shard-local; l_partkey is copied
        # verbatim -> per-order basket structure (and the pair fan-out
        # of basket_rules) is identical per shard, item counts scale
        # exactly 10x: expected curve linear in rows.
        ("lineitem", {"l_orderkey": DOC_ID_STRIDE}),
    ):
        t = con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{tname}.parquet')"
            f" ORDER BY {next(iter(key_cols))}"
        ).fetchdf()
        shards = []
        for k in range(SHARDS):
            s = t.copy()
            for col, stride in key_cols.items():
                s[col] = s[col] + k * stride
            shards.append(s)
        allt = pd.concat(shards, ignore_index=True)
        t_schema = pq.read_schema(os.path.join(SRC, f"{tname}.parquet"))
        tbl_t = pa.Table.from_pandas(allt, preserve_index=False)
        cast_t = tbl_t.cast(
            pa.schema([t_schema.field(n) for n in tbl_t.schema.names])
        )
        pq.write_table(cast_t, os.path.join(OUT, f"{tname}.parquet"))
        print(f"{tname}: {len(allt)} rows ({len(t)} x {SHARDS})")

    # small dimensions copied verbatim (broadcast sides; their size is
    # not part of any scaling hypothesis)
    import shutil

    for dim in ("nation", "region", "part", "supplier"):
        srcp = os.path.join(SRC, f"{dim}.parquet")
        if os.path.exists(srcp):
            shutil.copyfile(srcp, os.path.join(OUT, f"{dim}.parquet"))
            print(f"{dim}: copied verbatim")


if __name__ == "__main__":
    main()
