"""Deterministic in-memory soccer-domain fixtures (FIXTURES.md §A).

Seeded random generator producing the reference's five-table shape
with the edge cases the operators key on: fraction lines, rank-10
count tie, unknown labels, missing odds rows, duplicate upsert batch.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from soccerpredictor_spark.schemas import SOCCER_TABLES

COMPANIES = [f"Book{i:02d}" for i in range(15)]
TEAMS = [(str(i), f"Team {i}") for i in range(1, 41)]


def _mk(spark: SparkSession, table: str, rows: list[list[str]]) -> DataFrame:
    schema, _ = SOCCER_TABLES[table]
    return spark.createDataFrame(rows, schema=schema)


def build_fixtures(spark: SparkSession, n_games: int = 1200, seed: int = 7):
    rng = random.Random(seed)
    team_names = [n for _, n in TEAMS]

    team_list = _mk(spark, "team_list", [[tid, name] for tid, name in TEAMS])

    games = []
    for g in range(n_games):
        gid = str(1400000 + g * 500)  # spans the 1.5M / 1.6M boundaries
        host, guest = rng.sample(team_names, 2)
        hs, gs = rng.randint(0, 4), rng.randint(0, 3)
        wdl = "Win" if hs > gs else ("Draw" if hs == gs else "Loss")
        ou = "Over" if hs + gs > 2 else "Under"
        if rng.random() < 0.02:
            wdl = rng.choice(["", "Unknown", None])
        if rng.random() < 0.02:
            ou = None
        line = rng.choice(["0.5", "0.5/1", "-0.25", "0/0.5", "1", "0.75"])
        games.append(
            [
                gid, "EPL", f"2019-{rng.randint(1,12):02d}-{rng.randint(1,28):02d}",
                f"{rng.randint(12,21)}:00", host, f"{hs}-{gs}", guest,
                f"{rng.randint(0,2)}-{rng.randint(0,2)}", line, ou, wdl,
            ]
        )
    game_record = _mk(spark, "game_record", games)

    # skewed company coverage: the top-10 books quote nearly every game
    # (so the reference's drop-any-null survives), the tail is sparse.
    coverage = [0.99, 0.98, 0.97, 0.96, 0.95, 0.94, 0.93, 0.92, 0.91, 0.90, 0.6, 0.4, 0.3, 0.2, 0.1]
    odds_rows, ou_rows = [], []
    for g in games:
        gid = g[0]
        for ci, comp in enumerate(COMPANIES):
            if rng.random() < coverage[ci]:
                odds_rows.append(
                    [gid, comp] + [f"{rng.uniform(1.2, 6.0):.2f}" for _ in range(6)]
                )
            if rng.random() < coverage[ci] * 0.95:
                lines = rng.choice(["2.5", "2.5/3", "2/2.5", "3"])
                ou_rows.append(
                    [
                        gid, comp,
                        f"{rng.uniform(0.8, 1.1):.2f}", lines, f"{rng.uniform(0.8, 1.1):.2f}",
                        f"{rng.uniform(0.8, 1.1):.2f}", lines, f"{rng.uniform(0.8, 1.1):.2f}",
                    ]
                )
    game_odds = _mk(spark, "game_odds", odds_rows)
    game_overunder = _mk(spark, "game_overunder", ou_rows)

    # duplicate upsert batch: ~10% of odds PKs with changed values
    dup_rows = [
        [r[0], r[1]] + [f"{float(v) + 0.11:.2f}" for v in r[2:]]
        for r in odds_rows[:: 10]
    ]
    dup_batch = _mk(spark, "game_odds", dup_rows)

    return {
        "team_list": team_list,
        "game_record": game_record,
        "game_odds": game_odds,
        "game_overunder": game_overunder,
        "dup_batch": dup_batch,
    }
