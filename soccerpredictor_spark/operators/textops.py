"""Text-analysis operators over the documents table.

The training-data-pipeline text layer: language ID, quality scoring,
token counting, fingerprinting (BASELINE.json north star; no
counterpart in the reference, which has no text analytics). Everything
is built-in column expressions — a 100 TB documents table runs this as
a single embarrassingly-parallel scan projection with no shuffle.

Each operator has a DuckDB-SQL twin generator kept adjacent so the
Spark expression and the oracle can't drift silently; the parity tests
compare them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soccerpredictor_spark.functions import text as X


def text_profile(docs: DataFrame) -> DataFrame:
    """Per-document text metrics: token counts, fingerprint, predicted
    language, stopword ratio, quality score.

    The lowercased token array is materialized once and every
    token-level metric reads it — without this, each of lang-ID's four
    marker intersections and both ratio terms re-runs the regexp split
    over the full text (~8 passes/row; see the perf note on
    ``functions.text.shingles_from_tokens``). Whitespace tokenization
    is case-invariant, so token counts from the lowered array equal
    the raw ones.
    """
    wl = F.col("wl")
    n_tok = F.size(wl)
    stop_ratio = X.stopword_ratio_from_tokens(wl)
    avg_len = F.length(F.col("text")).cast("double") / n_tok.cast("double")
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
        + F.lit(0.3) * F.least(F.lit(1.0), avg_len / F.lit(8.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
    )
    return docs.select(
        "doc_id",
        "lang",
        "text",
        X.tokens(F.lower(F.col("text"))).alias("wl"),
    ).select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        X.bpe_token_count("text").alias("n_bpe_tokens"),
        X.fingerprint("text").alias("fp"),
        X.lang_id_from_tokens(wl).alias("lang_pred"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


#: rolling-hash parameters (polynomial hash over token hashes).
ROLL_BASE = 1_000_003
ROLL_MOD = 2_147_483_647  # 2^31 - 1
#: per-token hash = first 12 md5 hex digits as int, mod ROLL_MOD —
#: keeps every intermediate < 2^52, exact in int64 in both engines.
_TOKEN_HASH_HEX_DIGITS = 12


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint.

    h = fold(tokens, h_i = (h_{i-1} * BASE + hash(w_i)) mod M) — unlike
    the md5-of-normalized-text fingerprint this is a *polynomial* hash,
    the building block for winnowing/chunk-level fingerprints. Pure
    per-row column expression: a 100 TB corpus runs it as one scan with
    no shuffle.

    The token array is materialized first (see shingles_from_tokens's
    perf note), then token hashes, then the fold — so the md5s compute
    once per token, not once per fold step.
    """
    tok = docs.select("doc_id", X.tokens("text").alias("w"))
    th = tok.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.transform(
            F.col("w"),
            lambda w: F.conv(
                F.substring(F.md5(w), 1, _TOKEN_HASH_HEX_DIGITS), 16, 10
            ).cast("long")
            % ROLL_MOD,
        ).alias("h"),
    )
    rolled = F.aggregate(
        F.slice(F.col("h"), 2, F.greatest(F.size("h") - 1, F.lit(0))),
        F.try_element_at(F.col("h"), F.lit(1)),
        lambda acc, x: (acc * ROLL_BASE + x) % ROLL_MOD,
    )
    return th.select("doc_id", "n_tokens", rolled.alias("rolling_fp"))


def doc_fingerprint_sql() -> str:
    """DuckDB twin of doc_fingerprint (list_reduce has no init value in
    DuckDB 1.0, so the first token hash seeds the fold — matching the
    Spark aggregate over the tail with head as init)."""
    toks = _sql_tokens()
    th = (
        f"list_transform({toks}, w -> "
        f"CAST(concat('0x', substr(md5(w), 1, {_TOKEN_HASH_HEX_DIGITS})) AS BIGINT) % {ROLL_MOD})"
    )
    return f"""
WITH th AS (SELECT doc_id, len({toks}) AS n_tokens, {th} AS h FROM documents)
SELECT doc_id, n_tokens,
       CASE WHEN len(h) = 0 THEN NULL
            ELSE list_reduce(h, (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})
       END AS rolling_fp
FROM th
"""


def _sql_tokens(col: str = "text") -> str:
    return f"string_split_regex(trim({col}), '\\s+')"


def _sql_marker_hits(markers: tuple[str, ...]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in markers) + "]"
    return (
        f"len(list_intersect(list_distinct({_sql_tokens('lower(text)')}), {lit}))"
    )


def text_profile_sql() -> str:
    """DuckDB twin of text_profile."""
    toks = _sql_tokens()
    stop_lit = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS) + "]"
    langs = list(X.LANG_MARKERS)
    hits = {lang: _sql_marker_hits(ws) for lang, ws in X.LANG_MARKERS.items()}
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} > 0"] + [f"h_{lang} >= h_{other}" for other in langs[i + 1 :]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    hit_cols = ", ".join(f"{sql} AS h_{lang}" for lang, sql in hits.items())
    return f"""
WITH base AS (
  SELECT doc_id, lang, text,
         len({toks}) AS n_tokens,
         len(regexp_extract_all(lower(text), '{X.TOKEN_PATTERN}')) AS n_bpe_tokens,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         CAST(len(list_filter({_sql_tokens('lower(text)')},
              w -> list_contains({stop_lit}, w))) AS DOUBLE)
           / CAST(len({_sql_tokens('lower(text)')}) AS DOUBLE) AS stop_ratio,
         {hit_cols}
  FROM documents
)
SELECT doc_id, lang, n_tokens, n_bpe_tokens, fp,
       {lang_case} AS lang_pred,
       stop_ratio,
       0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
       + 0.3 * least(1.0, (CAST(length(text) AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 8.0)
       + 0.3 * (1.0 - stop_ratio) AS quality
FROM base
"""
