"""Operator layer: relational compositions + large-scale extensions."""

from soccerpredictor_spark.operators.relational import (
    assemble_features,
    game_list,
    label_odds,
    results_labels,
    top_companies,
)

__all__ = [
    "top_companies",
    "game_list",
    "label_odds",
    "results_labels",
    "assemble_features",
]
