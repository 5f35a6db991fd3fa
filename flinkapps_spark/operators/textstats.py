"""Text-analysis operators for training-data pipelines (beyond-reference):
language-ID heuristic, quality scoring, token counting, document
fingerprinting.

All pure Column expressions (array lambdas — JVM-side, codegen) so they run
at 100 TB without Python in the loop.  Every function is defined over
arithmetic/semantics that ANSI SQL can mirror exactly, so the DuckDB
oracles verify values, not just shapes: the doc fingerprint is a poly-31 /
poly-1000003 rolling hash over code points (NOT Spark's murmur3 ``hash()``,
which no other engine reproduces).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from flinkapps_spark.functions.text import HASH_MOD, tokenize, word_code

# shared constant surface (mirrored into oracle SQL by plans/pipeline_queries)
STOPWORDS = ("the", "a", "and", "of", "to")
LANG_MARKERS = {
    "de": ("der", "die", "und"),
    "en": ("the", "and", "is"),
    "es": ("el", "la", "y"),
    "fr": ("le", "la", "et"),
    "zh": ("zh", "shi", "de"),
}
LANG_PRIORITY = ("de", "en", "es", "fr", "zh")  # deterministic tie-break
FINGERPRINT_BASE = 1000003


def token_count(tokens: Column) -> Column:
    return F.size(tokens)


def punct_ratio(text: Column) -> Column:
    """(chars that are neither word chars nor whitespace) / total chars."""
    stripped = F.regexp_replace(text, "[^\\w\\s]", "")
    return (F.length(text) - F.length(stripped)) / F.length(text)


def stopword_ratio(tokens: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(stops, t)))
    return hits / F.size(tokens)


def avg_word_len(tokens: Column) -> Column:
    total = F.aggregate(F.transform(tokens, F.length),
                        F.lit(0).cast("long"), lambda a, x: a + x)
    return total / F.size(tokens)


def quality_score(n_tokens: Column, punct: Column, stop: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length, cleanliness, naturalness."""
    return (F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5
            + (F.lit(1.0) - punct) * 0.3
            + F.least(F.lit(1.0), stop * 5.0) * 0.2)


def lang_scores(tokens: Column) -> dict[str, Column]:
    """Marker-word hit counts per language (n-gram-heuristic style)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))
    return out


def predict_lang(scores: dict[str, Column]) -> Column:
    """argmax over lang scores; ties resolved by LANG_PRIORITY order."""
    best = F.greatest(*[scores[lang] for lang in LANG_PRIORITY])
    expr = F.lit(LANG_PRIORITY[-1])
    for lang in reversed(LANG_PRIORITY[:-1]):
        expr = F.when(scores[lang] >= best, F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(tokens: Column) -> Column:
    """Rolling polynomial fingerprint over per-word poly-31 codes:
    fp = fold(codes, 0, (acc, c) -> (acc*1000003 + c) mod (2^31-1))."""
    # Unary lambda is load-bearing: passing ``word_code`` directly would let
    # F.transform see its (col, base) arity and bind the element INDEX to
    # ``base``, silently changing the hash per position.
    codes = F.transform(tokens, lambda w: word_code(w))
    return F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + c) % HASH_MOD)


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams as space-joined strings, built with ``zip_with`` over
    aligned ``slice``s — each slice evaluates the token array once per row;
    a ``transform(sequence(...), i -> element_at(tokens, i))`` formulation
    would re-evaluate the array per ELEMENT (the O(n²) higher-order-function
    trap).  Pass ``tokens`` as a materialized column, not a nested
    expression, so the n slices share one evaluation of the tokenizer.
    """
    m = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    grams = F.slice(tokens, 1, m)
    for k in range(1, n):
        grams = F.zip_with(grams, F.slice(tokens, k + 1, m),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return grams


def dup_fraction(arr: Column) -> Column:
    """Fraction of entries that are repeats of an earlier entry — the
    Gopher/C4-style intra-document repetition signal; NULL for empty input."""
    n = F.size(arr)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(arr))).cast("double") / n)
