"""Relational operators from SURVEY.md §2, as composable DataFrame fns.

Each function is lazy (returns a DataFrame; no action) so chained
calls form one Catalyst DAG: the whole reference pipeline
(game-list semi-join -> top-10 agg -> IN-scan -> pivot -> left join ->
drop-any-null) executes as a single optimized job.

Scale design:
- ``top_companies`` plans as TakeOrderedAndProject (partial per-partition
  top-K, no full sort) — O(k) per partition at any data size.
- ``game_list`` / IN-list filters are broadcast semi-joins, not literal
  IN strings (the reference's list2str anti-pattern,
  XGBoost/Predictor.py:201-208) — no 10k-literal SQL, no driver round-trip.
- ``label_odds`` pivots with an explicit value list: no extra
  distinct-collection job, static plan, deterministic column order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_companies(odds_df: DataFrame, k: int = 10, company_col: str = "odds_company") -> DataFrame:
    """Top-K odds companies by row count (A1+A2).

    Reference: XGBoost/Predictor.py:210-225 (``group by odd_comp order
    by count(*) desc limit 10``). Divergence (SURVEY.md §2.11): the
    reference's tie order is engine-dependent; we add a secondary
    ascending sort on the company name for determinism.

    Returns columns ``(company_col, cnt)``.
    """
    return (
        odds_df.groupBy(company_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(company_col).asc())
        .limit(k)
    )


def game_list(
    team_list_df: DataFrame,
    game_record_df: DataFrame,
    team_id: str,
    hg: int,
) -> DataFrame:
    """Game ids where a team plays home (hg=0) or away (hg=1) (J4).

    The reference runs this as two sequential queries — name lookup
    then id scan (DAO/ImpalaCon.py:33-62). Here it is one declarative
    left-semi join; the single-team name side is broadcast so the big
    game_record scan never shuffles.

    Returns a single-column DataFrame ``(id)``.
    """
    venue_col = "host_team" if hg == 0 else "guest_team"
    names = team_list_df.filter(F.col("team_id") == team_id).select("name")
    return (
        game_record_df.join(
            F.broadcast(names),
            game_record_df[venue_col] == names["name"],
            "left_semi",
        ).select("id")
    )


def label_odds(
    odds_df: DataFrame,
    games: DataFrame | None,
    companies: Sequence[str],
    value_cols: Sequence[str],
    flag: str,
    id_col: str = "id",
    company_col: str = "odds_company",
    line_cols: Sequence[str] = (),
) -> DataFrame:
    """Wide per-game feature matrix from long odds rows (P3+A4+A5).

    Reference: XGBoost/Predictor.py:174-187,227-241 — filter to the
    top-10 companies and the team's games, then
    ``pd.pivot_table(index='id', columns='company', values=[...])``
    (default aggfunc mean) and flatten column names to
    ``{value}_{flag}_{company}``.

    Spark-first re-expression:
    - games filter = broadcast left-semi join (no literal IN list);
    - company filter = ``isin`` over the explicit top-K list (tiny,
      collected once by the caller);
    - pivot with the explicit ``companies`` value list and ``avg`` per
      value column (mean reproduces the reference exactly; it only
      differs from 'any' if PK-dedup failed upstream);
    - deterministic flattened column order sorted by (value, company),
      matching pandas' MultiIndex ordering so train/predict matrices
      align (SURVEY.md §2.11 feature-contract fix).
    """
    filtered = odds_df.filter(F.col(company_col).isin(list(companies)))
    if games is not None:
        filtered = filtered.join(
            F.broadcast(games.select(id_col).distinct()), id_col, "left_semi"
        )
    # Exact-decimal mean (order-independent; see plans/tpch.py docstring):
    # sum over decimal(18,4) casts, divided by the non-null count — identical
    # to pandas pivot_table's NaN-skipping mean, and bit-stable at any
    # partition count / cluster size. Asian-handicap line columns go
    # through the fraction parser first (E4, scoped per SURVEY.md §2.11:
    # the reference's scan-time cleaner applied cell-wise; we apply it
    # only to declared line columns).
    from soccerpredictor_spark.functions.expressions import fraction_avg

    def _typed(v: str):
        if v in line_cols:
            return fraction_avg(v).cast("decimal(18,4)")
        return F.col(v).try_cast("decimal(18,4)")

    aggs = [
        F.try_divide(F.sum(_typed(v)).cast("double"), F.count(_typed(v))).alias(v)
        for v in value_cols
    ]
    wide = filtered.groupBy(id_col).pivot(company_col, list(companies)).agg(*aggs)
    # Spark names pivot output "{company}_{value}" (single-agg: "{company}");
    # flatten to the reference's "{value}_{flag}_{company}" contract.
    ordered = []
    for v in sorted(value_cols):
        for c in sorted(companies):
            src = f"{c}_{v}" if len(value_cols) > 1 else str(c)
            ordered.append(F.col(f"`{src}`").alias(f"{v}_{flag}_{c}"))
    return wide.select(F.col(id_col), *ordered)


def results_labels(game_record_df: DataFrame, games: DataFrame | None = None) -> DataFrame:
    """Per-game encoded labels (E1/E2 + A3).

    Reference: XGBoost/Predictor.py:189-199 — ``select distinct id,
    <CASE win_draw_lose>, <CASE total_overunder> where id in (...)``.

    Returns ``(id, flat, overunder)`` with the reference's string
    encodings ('3'/'1'/'0' and '1'/'0'; unknown labels -> NULL).
    """
    from soccerpredictor_spark.functions.expressions import (
        encode_overunder,
        encode_win_draw_lose,
    )

    df = game_record_df
    if games is not None:
        df = df.join(F.broadcast(games.select("id").distinct()), "id", "left_semi")
    return df.select(
        "id",
        encode_win_draw_lose("win_draw_lose").alias("flat"),
        encode_overunder("total_overunder").alias("overunder"),
    ).distinct()


def assemble_features(
    feature_dfs: Sequence[DataFrame],
    labels_df: DataFrame | None = None,
    drop_null: bool = True,
    id_col: str = "id",
) -> DataFrame:
    """Chained left joins on the game id + optional drop-any-null (J1-J3, N1).

    Reference: XGBoost/Predictor.py:47-49 (train: join + dropna) and
    :157 (predict: join only — NaNs flow to the model, N2). The
    train/predict asymmetry is the ``drop_null`` flag.
    """
    if not feature_dfs:
        raise ValueError("need at least one feature DataFrame")
    out = feature_dfs[0]
    for other in feature_dfs[1:]:
        out = out.join(other, id_col, "left")
    if labels_df is not None:
        out = out.join(labels_df, id_col, "left")
    if drop_null:
        out = out.na.drop("any")
    return out
