"""Column-expression library (JVM-side, codegen-friendly; no Python UDFs)."""

from soccerpredictor_spark.functions.expressions import (
    encode_overunder,
    encode_win_draw_lose,
    fraction_avg,
    score_goals,
)

__all__ = [
    "fraction_avg",
    "encode_win_draw_lose",
    "encode_overunder",
    "score_goals",
]
