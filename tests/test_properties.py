"""Property-based tests (hypothesis): invariants that must hold for
ARBITRARY inputs, not just the fixtures — the guard against
fixture-shaped blind spots.

Examples are kept small and few (Spark jobs per example); the
properties target the operators whose contracts are order/layout
sensitivity traps: upsert conflict resolution, hash-gated sampling,
session gap merging.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from soccerpredictor_spark.operators.textops import group_sample_topk
from soccerpredictor_spark.sources.upsert import upsert_df

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # pk
        st.integers(min_value=0, max_value=99),  # seq (may collide)
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing_rows=ROWS, batch_rows=ROWS)
def test_upsert_latest_wins_property(spark, existing_rows, batch_rows):
    """For any PK table and batch: exactly one row per PK survives;
    the batch beats existing on PK collision regardless of seq; among
    same-PK batch rows the highest seq wins. Preconditions match the
    operator's contract: ``existing`` is a PK table (one row per PK —
    the invariant upsert itself maintains, so it holds inductively),
    and batch rows are unique on (pk, seq) so the winner is
    well-defined."""
    existing_rows = list({p: (p, s, v) for p, s, v in existing_rows}.values())
    batch_rows = list({(p, s): (p, s, v) for p, s, v in batch_rows}.values())
    cols = ["pk", "seq", "val"]
    existing = spark.createDataFrame(pd.DataFrame(existing_rows, columns=cols))
    batch = spark.createDataFrame(pd.DataFrame(batch_rows, columns=cols))
    got = {
        r["pk"]: (r["seq"], r["val"])
        for r in upsert_df(existing, batch, ["pk"], seq_col="seq").collect()
    }
    batch_pks = {p for p, _, _ in batch_rows}
    expect: dict[int, tuple[int, int]] = {}
    # existing rows survive only where the batch has no row for the PK
    for p, s, v in existing_rows:
        if p not in batch_pks:
            expect[p] = (s, v)
    for p in batch_pks:
        expect[p] = max((s, v) for q, s, v in batch_rows if q == p)
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True),
    nparts=st.integers(min_value=1, max_value=4),
)
def test_group_sample_topk_layout_independent(spark, ids, nparts):
    """The fixed-quota sampler must pick the SAME rows regardless of
    partitioning/row order — the reproducibility contract that makes a
    100 TB sample auditable."""
    pdf = pd.DataFrame({"doc_id": ids, "lang": ["en" if i % 2 else "fr" for i in ids]})
    a = spark.createDataFrame(pdf)
    b = spark.createDataFrame(pdf.iloc[::-1]).repartition(nparts)
    k = 3
    ga = {(r["lang"], r["doc_id"], r["rk"]) for r in group_sample_topk(a, k).collect()}
    gb = {(r["lang"], r["doc_id"], r["rk"]) for r in group_sample_topk(b, k).collect()}
    assert ga == gb
    for lang in ("en", "fr"):
        n_lang = sum(1 for i in ids if (i % 2 == 1) == (lang == "en"))
        assert sum(1 for l, _, _ in ga if l == lang) == min(k, n_lang)


CDC_CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),        # pk
        st.integers(min_value=0, max_value=99),       # seq
        st.sampled_from(["I", "U", "D"]),             # op
        st.integers(min_value=-100, max_value=100),   # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing_rows=ROWS, change_rows=CDC_CHANGES)
def test_apply_cdc_matches_sequential_model(spark, existing_rows, change_rows):
    """apply_cdc must equal the sequential one-row-at-a-time model:
    replay the change stream in seq order over a dict keyed by PK
    (I/U set, D removes). Preconditions per contract: existing is a
    PK table; (pk, seq) unique within the change batch."""
    from soccerpredictor_spark.sources.upsert import apply_cdc

    existing_rows = list({p: (p, s, v) for p, s, v in existing_rows}.values())
    change_rows = list(
        {(p, s): (p, s, o, v) for p, s, o, v in change_rows}.values()
    )
    existing = spark.createDataFrame(
        pd.DataFrame([(p, v) for p, s, v in existing_rows], columns=["pk", "val"])
    )
    changes = spark.createDataFrame(
        pd.DataFrame(change_rows, columns=["pk", "seq", "op", "val"])
    )
    got = {
        r["pk"]: r["val"]
        for r in apply_cdc(existing, changes, ["pk"], "op", "seq").collect()
    }
    model = {p: v for p, s, v in existing_rows}
    for p, s, o, v in sorted(change_rows, key=lambda t: t[1]):
        if o == "D":
            model.pop(p, None)
        else:
            model[p] = v
    assert got == model
