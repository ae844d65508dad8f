"""Vector (embedding) column expressions.

Dot products and cosines over ``array<float>`` columns, computed with
built-in higher-order functions (``zip_with`` + ``aggregate`` — JVM
codegen, no Python UDF).

Cross-engine determinism: each float component is quantized to an
int64 (``round(x * 1e7)``) and dots/norms are exact integer sums.
Integer addition is order-independent, so results are bit-identical at
any partition count, cluster size, or engine. (A double or even
decimal-cast accumulation is NOT: double sums vary with order, and the
double->decimal conversion itself disagrees between engines in the
last digit near rounding boundaries. ``round`` at the quantization
step is safe because halfway points of x*1e7 are dyadic rationals —
exactly representable — and both Spark and DuckDB round them away from
zero.) The ~1e-7 relative quantization error is far below any
similarity-threshold granularity that matters for dedup/ANN.

Sign-LSH hyperplanes are derived deterministically from md5 in Python
(hashlib) and embedded as literal arrays — both the Spark plan and the
DuckDB oracle SQL see the exact same constants.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: quantization scale: float32 has ~7 significant decimal digits.
SCALE = 10_000_000.0


def int_vec(a: Column) -> Column:
    """Quantize a float array to an exact int64 array."""
    return F.transform(a, lambda x: F.round(x.cast("double") * F.lit(SCALE)).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized arrays (as long).

    Magnitudes: 64 dims x (1e7)^2 max per term ~ 6.4e15 < 2^63.
    """
    terms = F.zip_with(int_vec(a), int_vec(b), lambda x, y: x * y)
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity on the quantized vectors; double output.

    The final divide/sqrt are double ops on identical exact integers —
    bit-deterministic across engines.
    """
    return int_dot(a, b).cast("double") / (
        F.sqrt(int_dot(a, a).cast("double")) * F.sqrt(int_dot(b, b).cast("double"))
    )


def sql_int_vec(a: str) -> str:
    return f"list_transform({a}, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of int_dot (emits an integer)."""
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CAST(round(CAST({a}[i] AS DOUBLE) * {SCALE}) AS BIGINT)"
        f" * CAST(round(CAST({b}[i] AS DOUBLE) * {SCALE}) AS BIGINT)))"
    )


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of cosine."""
    return (
        f"CAST({sql_dot(a, b)} AS DOUBLE) / "
        f"(sqrt(CAST({sql_dot(a, a)} AS DOUBLE)) * sqrt(CAST({sql_dot(b, b)} AS DOUBLE)))"
    )


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes for sign-LSH, seeded by md5 so any
    engine (or future session) regenerates the identical planes."""
    planes = []
    for p in range(num_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def int_dot_iv(iv_a: Column, iv_b: Column) -> Column:
    """Exact int64 dot of two ALREADY-quantized arrays. Use this in
    pair joins: quantize once per row upstream, not once per pair."""
    terms = F.zip_with(iv_a, iv_b, lambda x, y: x * y)
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def sq_norm_iv(iv: Column) -> Column:
    """Exact int64 squared norm of a quantized array."""
    return int_dot_iv(iv, iv)


def plane_dot(vec: Column, plane: list[float]) -> Column:
    """Exact integer dot of a quantized array column with a ±1 plane."""
    return plane_dot_iv(int_vec(vec), plane)


def plane_dot_iv(iv: Column, plane: list[float]) -> Column:
    """Same, for an already-quantized array column."""
    lit_plane = F.array(*[F.lit(int(v)).cast("long") for v in plane])
    terms = F.zip_with(iv, lit_plane, lambda x, y: x * y)
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (1 = non-negative
    projection), concatenated into a bit-string."""
    bits = [F.when(plane_dot(vec, p) >= 0, "1").otherwise("0") for p in planes]
    return F.concat(*bits)


def lsh_bucket_iv(iv: Column, planes: list[list[float]]) -> Column:
    """Same, for an already-quantized array column."""
    bits = [F.when(plane_dot_iv(iv, p) >= 0, "1").otherwise("0") for p in planes]
    return F.concat(*bits)


def sql_plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(str(int(v)) for v in plane) + "]"


def sql_plane_dot(vec: str, plane: list[float]) -> str:
    lit = sql_plane_literal(plane)
    return (
        f"list_sum(list_transform(range(1, len({vec})+1), "
        f"i -> CAST(round(CAST({vec}[i] AS DOUBLE) * {SCALE}) AS BIGINT) * ({lit})[i]))"
    )


def sql_lsh_bucket(vec: str, planes: list[list[float]]) -> str:
    """DuckDB twin of lsh_bucket."""
    bits = []
    for p in planes:
        bits.append(f"CASE WHEN {sql_plane_dot(vec, p)} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)
