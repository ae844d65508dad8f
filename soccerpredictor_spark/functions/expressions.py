"""Scalar expressions re-expressing the reference's Python cell logic.

All are compositions of built-in pyspark.sql.functions — they stay
inside Catalyst/whole-stage codegen (no Python UDF in the hot path),
which is what makes them viable over 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fraction_avg(col: Column | str) -> Column:
    """Asian-handicap line parser: ``"a/b"`` -> ``(a+b)/2`` as double.

    Reference semantics (DAO/ImpalaCon.py:95-99): cells containing '/'
    are split and averaged; anything non-parsable keeps its original
    value. Here a plain numeric string casts directly; a fractional
    line averages its two sides; a non-numeric value yields NULL (the
    typed-column analogue of "keep original" — the raw string column
    is still available untouched, see schemas.LINE_COLUMNS scoping).
    """
    c = F.col(col) if isinstance(col, str) else col
    left = F.split(c, "/").getItem(0).try_cast("double")
    right = F.split(c, "/").getItem(1).try_cast("double")
    return F.when(c.contains("/"), (left + right) / F.lit(2.0)).otherwise(c.try_cast("double"))


def encode_win_draw_lose(col: Column | str) -> Column:
    """3-class label encode: Win->'3', Draw->'1', Loss->'0'.

    Reference: XGBoost/Predictor.py:30. Deliberately no ``.otherwise``:
    unknown labels become NULL and are dropped by the drop-any-null
    step, matching the reference's CASE-without-ELSE.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "Win", "3").when(c == "Draw", "1").when(c == "Loss", "0")


def encode_overunder(col: Column | str) -> Column:
    """Binary label encode: Under->'0', Over->'1' (XGBoost/Predictor.py:31)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "Under", "0").when(c == "Over", "1")


def score_goals(col: Column | str, side: str) -> Column:
    """Parse an ``"H-G"`` score string (Spider/GameSpider.py:89) into
    the host (side='host') or guest (side='guest') goal count as int.
    """
    c = F.col(col) if isinstance(col, str) else col
    if side not in ("host", "guest"):
        raise ValueError(f"side must be 'host' or 'guest', got {side!r}")
    idx = 0 if side == "host" else 1
    return F.split(c, "-").getItem(idx).try_cast("int")
