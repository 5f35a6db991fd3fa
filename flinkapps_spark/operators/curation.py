"""Training-data curation operators beyond dedup/similarity: benchmark
decontamination, document chunking, sequence packing, PII scrubbing.

These are the remaining data-engineering stages of an LLM pre-training
pipeline (the reference has none of this — SURVEY §2.10; the dedup/text
family lives in operators/dedup.py and operators/textstats.py).  All are
pure DataFrame plans — no UDFs — so they stay in codegen and scale by
partitioning alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flinkapps_spark.functions.text import tokenize
from flinkapps_spark.operators.dedup import doc_shingle_table

CONTAM_MIN_SHARED = 5      # shared shingles before a doc counts as contaminated
CHUNK_WINDOW = 40          # words per training chunk
CHUNK_STRIDE = 20          # overlap = WINDOW - STRIDE
PACK_BUDGET = 256          # tokens per packed sequence
BOILER_MIN_DOCS = 3        # shingle in ≥ this many docs counts as "common"
BOILER_FRAC = 0.15         # doc flagged when ≥ this fraction of shingles common

# PII patterns restricted to syntax Java regex and RE2/DuckDB agree on
# (character classes, +, ?, {m,n} — no lookaround).  Order matters: emails
# first (their local part may contain digits), then IPs (dotted quads would
# otherwise be eaten by the phone pattern), then phones.
PII_PATTERNS = [
    ("[A-Za-z0-9_.]+@[A-Za-z0-9.-]+", "<EMAIL>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("\\+?[0-9][0-9-]{6,}[0-9]", "<PHONE>"),
]


def contamination_flags(docs: DataFrame, bench: DataFrame,
                        min_shared: int = CONTAM_MIN_SHARED,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag documents sharing ≥ min_shared
    distinct 3-word shingles with a benchmark corpus.

    Plan: both sides explode to (id, shingle_code) inverted-index rows;
    the benchmark side collapses to DISTINCT codes (small — benchmark
    suites are KBs-to-MBs even when the corpus is 100 TB) and broadcasts;
    the join counts hits per document.  The corpus is never compared
    doc-to-doc — cost is |corpus shingles| ⋈ |bench vocabulary|.
    """
    corpus_sh = doc_shingle_table(docs, text_col, id_col)
    bench_codes = doc_shingle_table(bench, text_col, id_col) \
        .select("code").distinct()
    hits = (corpus_sh.join(F.broadcast(bench_codes), "code")
            .groupBy("doc").agg(F.count("*").alias("n_shared")))
    ids = docs.select(F.col(id_col).alias("doc"))
    return (ids.join(hits, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
                    (F.coalesce("n_shared", F.lit(0)) >= min_shared)
                    .alias("contaminated")))


def boilerplate_flags(docs: DataFrame, min_docs: int = BOILER_MIN_DOCS,
                      frac: float = BOILER_FRAC, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Corpus-frequency boilerplate detection (the C4/RefinedWeb-style
    "repeated across many pages" filter, applied at shingle granularity):
    a 3-word shingle is *common* when it appears in ≥ ``min_docs``
    distinct documents; a document is flagged when ≥ ``frac`` of its
    distinct shingles are common.

    Plan (two shuffles, one join, no doc-to-doc comparison):
    1. inverted index (doc, code) with per-doc-distinct codes;
    2. groupBy(code) → document frequency  [shuffle 1, partial agg];
    3. join index ⋈ freq on code — freq is already hash-partitioned by
       code from step 2, so Spark reuses that exchange and only the
       index side shuffles (same key);
    4. groupBy(doc) computes n_shingles and n_common in one pass
       [shuffle 2].

    Unlike :func:`contamination_flags` the frequency table derives from
    the full corpus, so it is NOT broadcast — the join stays a shuffle
    hash join keyed by shingle code, which is how it must run at 100 TB
    (the common subset alone can be millions of shingles).
    """
    sh = doc_shingle_table(docs, text_col, id_col)      # per-doc DISTINCT
    freq = sh.groupBy("code").agg(F.count("*").alias("nd"))
    per_doc = (sh.join(freq, "code")
               .groupBy("doc")
               .agg(F.count("*").alias("n_shingles"),
                    F.count(F.when(F.col("nd") >= min_docs, 1))
                    .alias("n_common")))
    ids = docs.select(F.col(id_col).alias("doc"))
    n_sh = F.coalesce("n_shingles", F.lit(0)).cast("long")
    n_co = F.coalesce("n_common", F.lit(0)).cast("long")
    # int/int → exact IEEE division: bit-identical on both engines
    bfrac = F.when(n_sh == 0, F.lit(0.0)) \
        .otherwise(n_co.cast("double") / n_sh)
    return (ids.join(per_doc, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    n_sh.alias("n_shingles"), n_co.alias("n_common"),
                    bfrac.alias("boiler_frac"),
                    (bfrac >= frac).alias("is_boilerplate")))


def chunk_windows(docs: DataFrame, window: int = CHUNK_WINDOW,
                  stride: int = CHUNK_STRIDE, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Overlapping word-window chunks (the long-document → training-sample
    splitter): windows of ``window`` words every ``stride`` words, partial
    tail kept.  Zero-shuffle: tokenize + sequence + posexplode are all
    map-side; output rows ≈ n_words/stride per doc.
    """
    # materialize the token array as a column BEFORE the lambda: an
    # expression referenced inside transform() is re-evaluated per element
    # (the O(n²) trap documented in operators/dedup.py)
    with_ws = (docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("ws"))
               .filter(F.size("ws") > 0))
    starts = F.sequence(F.lit(0), F.size("ws") - 1, F.lit(stride))
    chunks = F.transform(starts,
                         lambda s: F.slice(F.col("ws"), s + 1, window))
    exploded = with_ws.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "chunk_words"))
    return exploded.select(
        id_col, F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk_words").cast("long").alias("n_words"),
        F.array_join("chunk_words", " ").alias("chunk_text"))


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET,
                   part_col: str = "lang", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget packs by
    cumulative offset — pack_id = floor(start_offset / budget) over a
    deterministic per-partition order.  This is the streaming-friendly
    "concatenate then split every N tokens" packing (documents crossing a
    boundary belong to the pack where they start), not NP-hard bin packing.

    Scale: the running sum is per ``part_col`` (language/shard), so the
    sort parallelizes across partitions — a single global ORDER BY would
    serialize; at 100 TB pack per shard and never globally.
    """
    n_tok = F.size(tokenize(F.col(text_col))).cast("long")
    w = (Window.partitionBy(part_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = docs.select(part_col, F.col(id_col), n_tok.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        part_col, id_col, "n_tokens",
        F.floor((cum - F.col("n_tokens")) / float(budget)).cast("long")
        .alias("pack_id"))


def scrub_pii(col, patterns=None):
    """Chain of regex redactions over a string column (codegen'd
    regexp_replace — no UDF; patterns are RE2/Java-portable)."""
    out = col
    for pat, repl in (patterns or PII_PATTERNS):
        out = F.regexp_replace(out, pat, repl)
    return out
