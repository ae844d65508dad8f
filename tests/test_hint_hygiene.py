"""Static guard: broadcast hints must sit on a side the planner can
actually build.

Spark silently drops a ``broadcast()`` hint it cannot honor (logging
only ``HintErrorLogger: build left for left outer join``), so the
executed plan quietly diverges from the one the code claims. The
buildable sides are:

- inner/cross: either side
- LEFT outer/semi/anti: build RIGHT only — a hint on the
  row-preserving left operand is unusable
- RIGHT outer: build LEFT only
- FULL outer: neither

This pattern slipped in four times before this guard existed
(ann_recall_k_sweep's rung spines, robots_rule_marginal_sweep's cum
join — round-18 advice — plus url_path_filter and
blocklist_coverage_sweep, found via the bench stderr in round 19),
so it is now enforced at the source level: an AST walk over the
package flags any ``F.broadcast(x).join(y, ..., how=<left-ish>)``
and any ``x.join(F.broadcast(y), ..., how=<right-ish/full>)`` with a
literal join type.
"""

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: join types where only the RIGHT side is buildable (hint on the
#: broadcast-wrapped LEFT operand is silently unusable).
LEFT_PRESERVED = {
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}
#: join types where only the LEFT side is buildable.
RIGHT_PRESERVED = {"right", "rightouter", "right_outer"}
#: join types where neither side is buildable by broadcast hash join.
FULL = {"full", "outer", "fullouter", "full_outer"}


def _is_broadcast_call(node: ast.AST) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "broadcast"
    ) or (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id == "broadcast"
    )


def _join_how(call: ast.Call) -> str | None:
    """Literal join type of a .join(...) call, or None (inner/dynamic)."""
    for kw in call.keywords:
        if kw.arg == "how" and isinstance(kw.value, ast.Constant):
            return str(kw.value.value).lower()
    # positional: join(other, on, how) — `how` is only ever the THIRD
    # positional or the keyword; a 2-positional join(other, "left")
    # is an INNER join on a column literally named "left" in PySpark,
    # so a 2-arg call never carries a join type.
    if len(call.args) >= 3 and isinstance(call.args[2], ast.Constant):
        return str(call.args[2].value).lower()
    return None


def _scan_file(path: str) -> list[str]:
    tree = ast.parse(open(path).read(), filename=path)
    bad = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "join"
        ):
            continue
        how = _join_how(node)
        if how is None:
            continue
        rel = os.path.relpath(path, REPO)
        if _is_broadcast_call(node.func.value) and how in (
            LEFT_PRESERVED | FULL
        ):
            bad.append(
                f"{rel}:{node.lineno}: broadcast() on the preserved LEFT "
                f"side of a '{how}' join — the hint is unusable"
            )
        if (
            node.args
            and _is_broadcast_call(node.args[0])
            and how in (RIGHT_PRESERVED | FULL)
        ):
            bad.append(
                f"{rel}:{node.lineno}: broadcast() on the preserved RIGHT "
                f"side of a '{how}' join — the hint is unusable"
            )
    return bad


def test_no_unusable_broadcast_hints():
    files = glob.glob(
        os.path.join(REPO, "soccerpredictor_spark", "**", "*.py"),
        recursive=True,
    ) + [os.path.join(REPO, "__spark_entry__.py")]
    assert files
    bad = [msg for f in files for msg in _scan_file(f)]
    assert not bad, "unusable broadcast hints:\n" + "\n".join(bad)


def test_scanner_catches_the_known_bad_shapes(tmp_path):
    """The guard must actually fire on the four historical shapes."""
    src = """
from pyspark.sql import functions as F

def bad1(spine, by_idx):
    return F.broadcast(spine).join(by_idx, "rule_idx", "left")

def bad2(rungs, by_idx):
    return F.broadcast(rungs).join(
        by_idx, F.col("idx") <= F.col("rung"), how="left"
    )

def bad3(a, b):
    return a.join(F.broadcast(b), "k", "right")

def ok1(spine, exact_r):
    return spine.join(F.broadcast(exact_r), "k", "left")

def ok2(a, b):
    return F.broadcast(a).join(b, "k")  # inner: either side builds

def ok3(a, b):
    return F.broadcast(a).join(b, how="cross")

def ok4(a, b):
    # PySpark treats the 2nd positional as the ON column, never the
    # join type: this is an INNER join on a column named "left", so
    # the hint is usable and must NOT be flagged.
    return F.broadcast(a).join(b, "left")
"""
    p = tmp_path / "sample.py"
    p.write_text(src)
    msgs = _scan_file(str(p))
    assert len(msgs) == 3, msgs
    assert sum("LEFT" in m for m in msgs) == 2
    assert sum("RIGHT" in m for m in msgs) == 1


# ---------------------------------------------------------------------------
# r20 (verdict item 2): df-cap HOT sets must never carry a forced
# broadcast hint. The hot set (every shingle/term with df > max_df) is
# unbounded — on a boilerplate-heavy 100 TB crawl it is millions of
# strings, and a forced broadcast OOMs the driver where AQE would
# degrade to a shuffle. Two layers: a static guard on the naming
# convention (the df-cap hot sets are all bound to a variable named
# ``hot``), and a runtime check that AQE still CHOOSES the broadcast
# anti-join at fixture scale, so dropping the hint cost nothing here.
# ---------------------------------------------------------------------------


def test_no_forced_broadcast_of_hot_sets():
    files = glob.glob(
        os.path.join(REPO, "soccerpredictor_spark", "**", "*.py"),
        recursive=True,
    )
    bad = []
    for path in files:
        tree = ast.parse(open(path).read(), filename=path)
        for node in ast.walk(tree):
            if (
                _is_broadcast_call(node)
                and node.args
                and isinstance(node.args[0], ast.Name)
                and node.args[0].id == "hot"
            ):
                rel = os.path.relpath(path, REPO)
                bad.append(
                    f"{rel}:{node.lineno}: forced broadcast of a df-cap "
                    "hot set (unbounded at crawl scale)"
                )
    assert not bad, "\n".join(bad)


def test_hot_set_anti_join_broadcasts_via_aqe(spark, sf_dir):
    """Without the hint, AQE must still pick a broadcast LeftAnti at
    fixture scale (from the hot aggregate's real materialized size)."""
    from soccerpredictor_spark.operators.dedup import _sized_shingles
    from soccerpredictor_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    df = _sized_shingles(docs, 3, 100)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
