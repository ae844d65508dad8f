"""Text-analysis column expressions for the documents table.

All built-in pyspark.sql.functions compositions (JVM-side, codegen'd,
no Python in the hot path), designed so an equivalent ANSI-SQL twin
exists for the DuckDB oracle. Cross-engine determinism notes:
- hashing is md5 (identical lowercase hex in Spark and DuckDB);
- per-row double arithmetic (ratios, scores) is IEEE-deterministic
  because both engines evaluate the identical expression tree;
- no floating aggregation happens here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: simple per-language marker words for the lang-ID heuristic.
#: Ordered dict: CASE tie-break prefers earlier languages.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

#: stopwords for the quality-score ratio (union of markers).
STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_MARKERS.values() for w in ws})
)

#: BPE-ish token pattern: letter runs, digit runs, single other symbol.
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), "\\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of TOKEN_PATTERN matches over lowercased text — a cheap
    BPE-ish proxy for model-token counting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(TOKEN_PATTERN))


def normalized(col: Column | str) -> Column:
    """Canonical text form: lowercase, whitespace collapsed to single
    spaces, trimmed — the input to fingerprints and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column (pure column ops, no shuffle); fewer than n tokens yields
    an empty array.

    ``t`` must be a bound column (an attribute produced by an earlier
    projection), not an expression tree: outer expressions referenced
    inside a ``transform`` lambda are re-evaluated per element, so
    passing ``split(text)`` directly re-runs the regexp split for
    every element_at — ~150x per row for 3-grams (measured 14x
    end-to-end on the shingle stream). Callers project the token array
    first; see ``operators/dedup._shingle_rows``.
    """
    idx = F.sequence(F.lit(0), F.size(t) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]),
    )
    # guard: sequence(0, negative) counts DOWN in Spark, so short docs
    # must short-circuit to an empty array instead.
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def marker_hits(col: Column | str, markers: tuple[str, ...]) -> Column:
    """Number of distinct marker words present in the token set."""
    return marker_hits_from_tokens(
        tokens(F.lower(col if isinstance(col, Column) else F.col(col))), markers
    )


def marker_hits_from_tokens(wl: Column, markers: tuple[str, ...]) -> Column:
    """Same, over a materialized lowercased token array (see the perf
    note on shingles_from_tokens — expression-tree token args would
    re-split per use)."""
    return F.size(
        F.array_intersect(
            F.array_distinct(wl),
            F.array(*[F.lit(w) for w in markers]),
        )
    )


def lang_id(col: Column | str) -> Column:
    """Language-ID heuristic: the language whose marker-word set has
    the most distinct hits in the document; ties and zero hits resolve
    in LANG_MARKERS order with 'und' (undetermined) for no hits at all.
    """
    langs = list(LANG_MARKERS)
    hit_cols = {lang: marker_hits(col, ws) for lang, ws in LANG_MARKERS.items()}
    return _lang_case(hit_cols)


def lang_id_from_tokens(wl: Column) -> Column:
    """lang_id over a materialized lowercased token array."""
    hit_cols = {
        lang: marker_hits_from_tokens(wl, ws) for lang, ws in LANG_MARKERS.items()
    }
    return _lang_case(hit_cols)


def _lang_case(hit_cols: dict[str, Column]) -> Column:
    langs = list(LANG_MARKERS)
    best = None
    for i, lang in enumerate(langs):
        h = hit_cols[lang]
        # ordered CASE: first match wins, so only compare against the
        # languages that come later; earlier ones already failed.
        cond = h > 0
        for other in langs[i + 1 :]:
            cond = cond & (h >= hit_cols[other])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("und")


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are stopwords (occurrence-based)."""
    return stopword_ratio_from_tokens(
        tokens(F.lower(col if isinstance(col, Column) else F.col(col)))
    )


def stopword_ratio_from_tokens(wl: Column) -> Column:
    """Same, over a materialized lowercased token array."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(wl, lambda w: F.array_contains(stop_arr, w)))
    return n_stop.cast("double") / F.size(wl).cast("double")


def quality_score(col: Column | str) -> Column:
    """Document quality score in [0,1]: length, average-token-length,
    and non-stopword components (fixed weights 0.4/0.3/0.3).

    Per-row double arithmetic on an identical expression tree is
    bit-deterministic across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    avg_len = n_chars / n_tok
    len_component = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    word_component = F.least(F.lit(1.0), avg_len / F.lit(8.0))
    stop_component = F.lit(1.0) - stopword_ratio(c)
    return (
        F.lit(0.4) * len_component + F.lit(0.3) * word_component + F.lit(0.3) * stop_component
    )
