"""Training-data pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing — over the documents/embeddings fixtures.

The fixtures contain no duplicates (500 distinct texts; max pairwise
embedding cosine ≈ 0.51), so dedup queries *construct* deterministic
near/exact duplicates in-query — identically on both engines — to make the
results non-trivial:

- text near-dups: every document re-appears (id+1000000) with its first
  word removed → Jaccard ≈ (n-3)/(n-2) over 3-shingles;
- text exact dups: docs with id%10==0 re-appear verbatim (id+2000000);
- embedding near-dups: every vector re-appears (id+10000000) with +0.05 on
  component 0 → cosine ≈ 0.9987 vs its original (vectors are unit-norm;
  a +0.5 bump would land at ≈0.895, silently below the 0.99 threshold).

Oracle SQL is *generated* from the same constants the Spark operators use
(MINHASH_COEFFS, STOPWORDS, ...), so both sides share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flinkapps_spark.functions.text import HASH_MOD, tokenize
from flinkapps_spark.operators import dedup, multimodal, similarity, textstats
from flinkapps_spark.operators.dedup import (
    MINHASH_COEFFS, N_BANDS, N_MINHASH, ROWS_PER_BAND, SHINGLE_BASE,
    SIMHASH_BITS, SPAN_SIZE,
)
from flinkapps_spark.operators.textstats import (
    FINGERPRINT_BASE, LANG_MARKERS, LANG_PRIORITY, STOPWORDS,
)
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import sql_avg, sql_units
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect) mirroring functions/text.py
# ---------------------------------------------------------------------------

# tokenize: lowercase, split \W+, drop empties  →  list of words
SQL_WORDS = ("list_filter(string_split_regex(lower(text), '\\W+'), "
             "w -> w <> '')")

# poly-31 code of a string expression {s}: fold (a*31 + codepoint) mod 2^31-1
def _sql_word_code(s: str) -> str:
    return (f"list_reduce([CAST(0 AS BIGINT)] || "
            f"list_transform(string_split({s}, ''), "
            f"c -> CAST(ascii(c) AS BIGINT)), "
            f"(a, b) -> (a * 31 + b) % {HASH_MOD})")


# distinct 3-word shingle codes from a word-code list {wc} — mirrors
# operators/dedup.py shingle_codes: ((w1*B + w2) mod M * B + w3) mod M
def _sql_shingle_codes(wc: str) -> str:
    from flinkapps_spark.operators.dedup import SHINGLE_BASE
    return (f"list_distinct(list_transform(range(1, len({wc}) - 1), "
            f"i -> ((({wc}[i] * {SHINGLE_BASE} + {wc}[i+1]) % {HASH_MOD}) "
            f"* {SHINGLE_BASE} + {wc}[i+2]) % {HASH_MOD}))")


# documents augmented with constructed near/exact duplicates
SQL_AUG_NEAR = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, regexp_replace(text, '^\\w+\\W+', '')
    FROM documents
"""
SQL_AUG_EXACT = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
"""


def _guarded_offset(id_col: str, offset: int):
    """id + offset with an execution-time tripwire: a real id at or above
    the offset would COLLIDE with an augmented id and silently merge rows
    in every GROUP BY downstream (ADVICE r8 — the embedding offset hit
    exactly this at sf10 when it was +100000).  The guard is a codegen'd
    conditional (zero cost below the boundary) that fails the query
    loudly at the sf where collision becomes possible."""
    return F.when(
        F.col(id_col) < offset, F.col(id_col) + offset
    ).otherwise(F.raise_error(F.lit(
        f"{id_col} >= {offset}: augmentation offset would collide with "
        f"real ids — raise the offset (and its oracle literals) before "
        f"running at this scale")).cast("long"))


def _augment_near(docs: DataFrame) -> DataFrame:
    mod = docs.select(
        _guarded_offset("doc_id", 1000000).alias("doc_id"),
        F.regexp_replace("text", "^\\w+\\W+", "").alias("text"))
    return docs.select("doc_id", "text").unionByName(mod)


def _augment_exact(docs: DataFrame) -> DataFrame:
    dup = docs.filter(F.col("doc_id") % 10 == 0).select(
        _guarded_offset("doc_id", 2000000).alias("doc_id"), F.col("text"))
    return docs.select("doc_id", "text").unionByName(dup)


# shared CTE prefix: aug docs → exploded distinct shingle codes + sizes.
#
# `common` (every candidate pair + exact shingle-set intersection) is
# generated with the SAME lossless prefix filtering the engine uses
# (operators/dedup.py jaccard_pairs/containment_pairs; Bayardo/Ma/Srikant
# 2007): under a global rare-first shingle order, any pair with
# J(A,B) ≥ JT shares its globally-smallest common shingle inside BOTH
# (n − ceil(JT·n) + 1)-prefixes, and any pair with containment ≥ CT
# shares it inside the SMALLER doc's (n − ceil(CT·n) + 1)-prefix — so
# prefix×prefix (+ the Jaccard size-ratio bound) ∪ smaller-prefix×full
# is a complete candidate set for every downstream consumer (jac ≥ 0.6
# filters, containment ≥ 0.95 filters, cluster edges).  The naive
# inverted-index self-join (Σ_code freq² pairs, then a COUNT(*) GROUP BY
# over every pair sharing ANY shingle) explodes to ~4·10⁸ groups on the
# sf1 fixture (uniform 31-word vocabulary → ~8% of ALL doc pairs
# collide) and ran DuckDB past 48 GB; the prefix form verifies ~10×
# fewer candidates with list_intersect on the full sets.  Candidates are
# a SUPERSET of the true pairs on both paths; exact verification makes
# the final result identical — parity with the engine is unchanged.
_SHINGLE_JT = 0.6             # Jaccard threshold all consumers filter at
_SHINGLE_CT = 0.95            # containment threshold (min-size denominator)


def _sql_shingle_cte(aug_sql: str) -> str:
    jt, ct, eps = repr(_SHINGLE_JT), repr(_SHINGLE_CT), "1e-9"
    return f"""
        WITH aug AS ({aug_sql}),
        docs_w AS (
            SELECT doc_id, {SQL_WORDS} AS ws FROM aug
        ),
        wcodes AS (
            SELECT doc_id,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= 3
        ),
        codes AS (
            SELECT doc_id, {_sql_shingle_codes('wc')} AS cset FROM wcodes
        ),
        ex AS (
            SELECT doc_id AS doc, unnest(cset) AS code FROM codes
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM ex GROUP BY doc),
        cfreq AS (SELECT code, COUNT(*) AS cf FROM ex GROUP BY code),
        ordd AS (
            SELECT ex.doc, ex.code, s.n_sh,
                   row_number() OVER (PARTITION BY ex.doc
                                      ORDER BY cfreq.cf ASC, ex.code ASC)
                       AS pos
            FROM ex
            JOIN cfreq ON cfreq.code = ex.code
            JOIN sizes s ON s.doc = ex.doc
        ),
        pref_j AS (
            SELECT doc, code, n_sh, pos FROM ordd
            WHERE pos <= n_sh - floor({jt} * n_sh - {eps})
        ),
        pref_c AS (
            SELECT doc, code, n_sh, pos FROM ordd
            WHERE pos <= n_sh - floor({ct} * n_sh - {eps})
        ),
        cand AS (
            -- PPJoin positional filter (Xiao et al. 2008) on top of the
            -- prefix join: all common elements rank ≥ the matching code
            -- in BOTH docs, so overlap ≤ 1 + min(suffix lengths); prune
            -- when that upper bound cannot reach the required overlap
            -- (J ≥ t needs o ≥ t/(1+t)·(na+nb); containment ≥ t needs
            -- o ≥ t·min).  Lossless: the bound is exact set arithmetic.
            SELECT a.doc AS doc_a, b.doc AS doc_b
            FROM pref_j a JOIN pref_j b
              ON a.code = b.code AND a.doc < b.doc
             AND b.n_sh >= {jt} * a.n_sh - {eps}
             AND b.n_sh <= a.n_sh / {jt} + {eps}
             AND 1 + LEAST(a.n_sh - a.pos, b.n_sh - b.pos)
                 >= {jt} / (1 + {jt}) * (a.n_sh + b.n_sh) - {eps}
            UNION
            SELECT LEAST(p.doc, e.doc), GREATEST(p.doc, e.doc)
            FROM pref_c p
            JOIN ordd e ON p.code = e.code AND p.doc <> e.doc
            WHERE (p.n_sh < e.n_sh
                   OR (p.n_sh = e.n_sh AND p.doc < e.doc))
              AND 1 + LEAST(p.n_sh - p.pos, e.n_sh - e.pos)
                  >= {ct} * p.n_sh - {eps}
        ),
        common AS (
            -- exact |A∩B| for candidate pairs only.  Shape matters at
            -- sf1: the IN-subquery becomes a SEMI-join hash built on
            -- cand (fixed-width pair keys), probed by the streaming
            -- inverted-index join — no per-pair shingle-list payload is
            -- ever materialized (joining cand against the cset lists
            -- directly carries ~400 B of list per candidate row through
            -- two hash joins ≈ 20+ GB at sf1).
            SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
            FROM ex a
            JOIN ex b ON a.code = b.code AND a.doc < b.doc
            SEMI JOIN cand
              ON cand.doc_a = a.doc AND cand.doc_b = b.doc
            GROUP BY a.doc, b.doc
        ),
        jac AS (
            SELECT doc_a, doc_b,
                   ROUND(CAST(n_common AS DOUBLE)
                         / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc = doc_a
            JOIN sizes sb ON sb.doc = doc_b
        )
    """


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
        WITH aug AS ({SQL_AUG_EXACT})
        SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM aug GROUP BY md5(text)
    """,
    category="extension: dedup (exact)",
    doc="Exact dedup by content digest: hash-groupBy on md5(text), keep "
        "min id. One shuffle keyed by digest — at 100 TB the digest is "
        "uniformly distributed, no skew. Constructed dups: id%10 docs "
        "duplicated verbatim.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_exact(load_table(spark, sf_dir, "documents"))
    return dedup.exact_dedup(docs)


@query(
    "ngram_jaccard_pairs",
    oracle=_sql_shingle_cte(SQL_AUG_NEAR) + """
        SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.6
    """,
    category="extension: dedup (n-gram Jaccard)",
    doc="Exact 3-shingle Jaccard near-dup pairs via inverted-index join "
        "(shared-shingle candidates only — never an O(n²) cross join). "
        "Constructed near-dups: first word dropped → J≈(n-3)/(n-2).",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    return dedup.jaccard_pairs(docs, threshold=0.6)


@query(
    "dedup_containment_pairs",
    oracle=_sql_shingle_cte(SQL_AUG_NEAR) + """
        SELECT doc_a, doc_b,
               ROUND(CAST(n_common AS DOUBLE)
                     / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
        FROM common
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE ROUND(CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6)
              >= 0.95
    """,
    category="extension: dedup (containment / subset detection)",
    doc="Asymmetric containment pairs |A∩B|/min(|A|,|B|) ≥ 0.95: catches "
        "a document EMBEDDED in a larger one (quotes, excerpt pages, "
        "boilerplate wrappers) which symmetric Jaccard under-scores as "
        "sizes diverge. The constructed first-word-dropped copies have "
        "containment 1.0 in their originals (every copy shingle appears "
        "in the original). Same inverted-index candidate join as the "
        "Jaccard query — only the verification ratio differs.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    return dedup.containment_pairs(docs, threshold=0.95)


@query(
    "dedup_incremental_newbatch",
    oracle=_sql_shingle_cte(SQL_AUG_NEAR) + """
        SELECT doc_a, doc_b, jaccard FROM jac
        WHERE jaccard >= 0.6
          AND (doc_a >= 1000000 OR doc_b >= 1000000)
    """,
    category="extension: dedup (incremental new-batch)",
    doc="Incremental dedup: the constructed near-dup copies (id+1000000) "
        "play a NEW ingest batch arriving into an already-deduplicated "
        "corpus — candidates are generated only through (new × all) "
        "inverted-index joins, never history × history, so a daily "
        "increment costs the increment, not the corpus². The oracle is "
        "the FULL pairwise computation filtered to pairs touching the "
        "new batch: parity proves incremental ≡ recompute-restricted.",
)
def dedup_incremental_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    return dedup.jaccard_pairs_incremental(
        docs, lambda d: d >= 1000000, threshold=0.6)


@query(
    "dedup_repeated_spans",
    oracle=f"""
        WITH aug AS ({SQL_AUG_EXACT}),
        docs_w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM aug),
        wcodes AS (
            SELECT doc_id,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= {SPAN_SIZE}
        ),
        spans AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(wc) - {SPAN_SIZE - 2}),
                       i -> list_reduce(wc[i:i+{SPAN_SIZE - 1}],
                            (a, b) -> (a * {SHINGLE_BASE} + b)
                                      % {HASH_MOD}))) AS span_code
            FROM wcodes
        )
        SELECT span_code, COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occ
        FROM spans GROUP BY span_code
        HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    category="extension: dedup (repeated spans / exact substring)",
    doc="Exact-substring dedup hot-list (Lee et al. 2022 'Deduplicating "
        "Training Data Makes Language Models Better'): 8-word spans "
        "recurring in ≥2 distinct documents, with doc and occurrence "
        "counts — the spans a substring-removal pass subtracts. Rolling "
        "poly-31 span codes (engine-portable, mirrored in the oracle); "
        "explode → one partial-agg shuffle on the 8-byte code, "
        "hash-uniform so no skew at 100 TB. Constructed exact dups "
        "(id%10 docs repeated) guarantee non-trivial output.",
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_exact(load_table(spark, sf_dir, "documents"))
    return dedup.repeated_spans(docs, min_docs=2)


def _sql_minhash_sig() -> str:
    exprs = ", ".join(
        f"list_min(list_transform(cset, c -> ({a} * c + {b}) % {HASH_MOD}))"
        for a, b in MINHASH_COEFFS)
    return f"[{exprs}]"


def _sql_band_keys() -> str:
    keys = []
    for band in range(N_BANDS):
        lo = band * ROWS_PER_BAND
        parts = " || '-' || ".join(
            f"CAST(sig[{i + 1}] AS VARCHAR)"
            for i in range(lo, lo + ROWS_PER_BAND))
        keys.append(f"({parts})")
    return ", ".join(keys)


def _sql_minhash_pair_ctes(threshold: float) -> str:
    """CTE chain ``aug``→``mh_pairs`` reproducing minhash_lsh_pairs in
    DuckDB: poly-31 shingle codes → affine-permutation MinHash signature
    → band keys → band self-join candidates → exact-Jaccard verify at
    ``threshold``.  Shared by dedup_minhash_lsh and the LSH-fed cluster
    pipeline (dedup_clusters_lsh)."""
    return f"""
        aug AS ({SQL_AUG_NEAR}),
        docs_w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM aug),
        wcodes AS (
            SELECT doc_id,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= 3
        ),
        codes AS (
            SELECT doc_id, {_sql_shingle_codes('wc')} AS cset FROM wcodes
        ),
        sig_t AS (
            SELECT doc_id AS doc, {_sql_minhash_sig()} AS sig FROM codes
        ),
        bands AS (
            SELECT doc, unnest([{_sql_band_keys()}]) AS band_key,
                   unnest({list(range(1, N_BANDS + 1))}) AS band_idx
            FROM sig_t
        ),
        cand AS (
            SELECT x.doc AS doc_a, y.doc AS doc_b,
                   COUNT(*) AS shared_bands
            FROM bands x JOIN bands y
              ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc < y.doc
            GROUP BY x.doc, y.doc
        ),
        mh_pairs AS (
            SELECT c.doc_a, c.doc_b, c.shared_bands,
                   ROUND(CAST(len(list_intersect(ca.cset, cb.cset))
                              AS DOUBLE)
                         / (len(ca.cset) + len(cb.cset)
                            - len(list_intersect(ca.cset, cb.cset))), 6)
                       AS jaccard
            FROM cand c
            JOIN codes ca ON ca.doc_id = c.doc_a
            JOIN codes cb ON cb.doc_id = c.doc_b
            WHERE ROUND(CAST(len(list_intersect(ca.cset, cb.cset))
                             AS DOUBLE)
                        / (len(ca.cset) + len(cb.cset)
                           - len(list_intersect(ca.cset, cb.cset))), 6)
                  >= {threshold!r}
        )"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
        WITH {_sql_minhash_pair_ctes(0.5)}
        SELECT doc_a, doc_b, shared_bands, jaccard FROM mh_pairs
    """,
    category="extension: dedup (MinHash+LSH)",
    doc="MinHash(16 hashes)+LSH(4 bands×4 rows) near-dup candidates, "
        "verified with exact Jaccard. Affine permutations over the "
        "engine-portable poly-31 shingle codes so the oracle reproduces "
        "every signature bit. Scale: signature is per-row array math (no "
        "shuffle); the only shuffle is the tiny band-key join.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_pairs(docs, threshold=0.5)


def _sql_simhash(aug_sql: str) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (code >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS))
    bits = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS))
    return f"""
        WITH aug AS ({aug_sql}),
        toks AS (
            SELECT doc_id AS doc,
                   {_sql_word_code('t.tok')} AS code
            FROM aug, unnest({SQL_WORDS}) AS t(tok)
        ),
        votes AS (SELECT doc, {votes} FROM toks GROUP BY doc)
        SELECT doc AS doc_id, {bits} AS simhash FROM votes
    """


@query(
    "dedup_simhash",
    oracle=_sql_simhash(SQL_AUG_NEAR),
    category="extension: dedup (SimHash)",
    doc="Per-doc 31-bit SimHash: tokens vote ±1 per bit of their poly-31 "
        "code; bit set iff vote sum > 0. One explode + one groupBy(doc).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    return dedup.simhash(docs)


def _sql_word_code37(s: str) -> str:
    # the second hash family of simhash_wide: same fold, base 37
    return (f"list_reduce([CAST(0 AS BIGINT)] || "
            f"list_transform(string_split({s}, ''), "
            f"c -> CAST(ascii(c) AS BIGINT)), "
            f"(a, b) -> (a * 37 + b) % {HASH_MOD})")


def _sql_simhash_wide(aug_sql: str) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN ({c} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS {p}{b}"
        for p, c in (("a", "c1"), ("b", "c2"))
        for b in range(SIMHASH_BITS))
    bits = " + ".join(
        [f"(CASE WHEN a{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
         for b in range(SIMHASH_BITS)]
        + [f"(CASE WHEN b{b} > 0 THEN "
           f"CAST({1 << (b + SIMHASH_BITS)} AS BIGINT) ELSE 0 END)"
           for b in range(SIMHASH_BITS)])
    return f"""
        WITH aug AS ({aug_sql}),
        toks AS (
            SELECT doc_id AS doc,
                   {_sql_word_code('t.tok')} AS c1,
                   {_sql_word_code37('t.tok')} AS c2
            FROM aug, unnest({SQL_WORDS}) AS t(tok)
        ),
        votes AS (SELECT doc, {votes} FROM toks GROUP BY doc)
        SELECT doc AS doc_id, {bits} AS simhash FROM votes
    """


@query(
    "dedup_simhash_pairs",
    oracle=f"""
        WITH sims AS ({_sql_simhash_wide(SQL_AUG_NEAR)})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    category="extension: dedup (SimHash pairs)",
    doc="Near-dup pairs with 62-bit two-hash SimHash hamming ≤ 3 "
        "(simhash_wide: poly-31 + poly-37 signatures packed in one "
        "BIGINT). The oracle is the O(n²) cross join; the engine blocks "
        "with 4 pigeonhole chunks of 15-16 bits — chunk width is what "
        "bounds per-band candidates: the original 31-bit/hamming-6 form "
        "(4-5 bit chunks) measured ~10⁹ candidates at sf1 and its "
        "pair DENSITY on the tight-vocabulary fixture was 4% of all "
        "pairs (a quadratic result set); 62-bit/hamming-3 keeps 79% of "
        "the constructed near-dups at 0.3% density, i.e. a usable "
        "dedup cut that also scales.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    return dedup.simhash_pairs(docs, max_hamming=3)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

SQL_EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _sql_cos(a: str, b: str) -> str:
    dot = (f"list_sum(list_transform(range(1, len({a}) + 1), "
           f"i -> {a}[i] * {b}[i]))")
    na = f"sqrt(list_sum(list_transform({a}, x -> x * x)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x * x)))"
    return f"({dot} / ({na} * {nb}))"


EMB_DIM = 64  # embeddings fixture dimension (TESTDATA.md; constant per sf)
_BAND_DIMS = 16  # unit components band-filtered before the full dot


def _sql_blocked_pair_ctes(threshold: float) -> str:
    """CTE chain ``emb``→``pairs`` for the cosine near-dup oracles, scaled
    the same way the shingle-pair oracles were: the plain all-pairs cross
    join is O(n²) with a 64-term dot per pair — fine at sf0.01 (the driver
    gate) but ~8e8 pairs at sf1.  This reproduces the Spark side's
    RECALL-LOSSLESS grid blocking (operators/similarity.py) in independent
    DuckDB SQL: same cell width w, same balanced-base packed key, same
    3^d additive probe deltas, plus exact per-component band filters
    |Δu_i| ≤ w on the first {_BAND_DIMS} unit components (each implied by
    cos ≥ t − 5e-7 via the unit-vector L2 bound, so no recall loss).  The
    blocked-equals-exhaustive property itself is pinned by
    tests/test_engine_units.py::test_neardup_blocking_lossless against the
    exhaustive=True plan, and remains empirically re-proven against a
    plain cross join by the pytest parity suite at sf0.001/0.01 fixtures.
    The final cosine is an unrolled {EMB_DIM}-term sum — plain vectorized
    arithmetic instead of per-pair list lambdas (~40× at sf1)."""
    import math
    from itertools import product
    w = math.sqrt(2.0 - 2.0 * (threshold - 5e-7)) * 1.02
    gd = 6  # GRID_DIMS on the Spark side
    max_cell = int(math.ceil(1.0 / w)) + 1
    base = 2 * (max_cell + 2) + 1
    dot = " + ".join(f"bpa.v[{i}]*bpb.v[{i}]" for i in range(1, EMB_DIM + 1))
    nrm = " + ".join(f"v[{i}]*v[{i}]" for i in range(1, EMB_DIM + 1))
    key = " + ".join(f"CAST(floor(v[{i + 1}]/nrm/{w!r}) AS BIGINT)"
                     f"*{base ** i}" for i in range(gd))
    ucols = ", ".join(f"v[{i}]/nrm AS u{i}"
                      for i in range(1, _BAND_DIMS + 1))
    bands = " AND ".join(f"abs(a.u{i} - b.u{i}) <= {w!r}"
                         for i in range(1, _BAND_DIMS + 1))
    deltas = ", ".join(
        f"({sum(d * base ** i for i, d in enumerate(ds))})"
        for ds in product((-1, 0, 1), repeat=gd))
    return f"""
        emb AS (
            SELECT vec_id, {SQL_EMB_D} AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 10000000,
                   [v2[1] + 0.05] || v2[2:]
            FROM (SELECT vec_id, {SQL_EMB_D} AS v2 FROM embeddings)
        ),
        bp_n AS (SELECT vec_id, v, sqrt({nrm}) AS nrm FROM emb),
        bp_u AS (SELECT vec_id, {key} AS key, {ucols} FROM bp_n),
        bp_d(delta) AS (VALUES {deltas}),
        bp_cand AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bp_u a JOIN bp_d ON true
                 JOIN bp_u b ON b.key = a.key + bp_d.delta
                            AND a.vec_id < b.vec_id
            WHERE {bands}
        ),
        pairs AS MATERIALIZED (
            -- MATERIALIZED: same multi-reference rationale as the LSH
            -- pair CTE — edge symmetrization and recall joins read this
            -- twice; the grid-blocked pipeline must run once
            SELECT c.id_a, c.id_b,
                   ROUND(({dot}) / (bpa.nrm * bpb.nrm), 6) AS cosine
            FROM bp_cand c
            JOIN bp_n bpa ON bpa.vec_id = c.id_a
            JOIN bp_n bpb ON bpb.vec_id = c.id_b
            WHERE ROUND(({dot}) / (bpa.nrm * bpb.nrm), 6) >= {threshold!r}
        )"""


def _sql_lsh_pair_ctes(threshold: float, final: str = "lsh_pairs",
                       with_emb: bool = True) -> str:
    """CTE chain ``emb``→``{final}`` reproducing the hyperplane-banded
    LSH near-dup generator (operators/similarity.py
    embedding_neardup_pairs_lsh) in independent DuckDB SQL.  This is an
    EXACT mirror, not a recall gate: signatures are integer arithmetic
    end-to-end (unit-normalize with a left-to-right norm fold, quantize
    via floor(u·Q + 0.5), integer plane dots — every intermediate an
    integer-valued double < 2^53, so numpy matmul and list_sum compute
    the identical integer and the sign bit can never diverge).  The
    plane ints are built ONCE in Python (lsh_plane_ints) and inlined
    into both engines.  ``with_emb=False`` skips re-declaring the
    ``emb`` CTE (for composition after _sql_blocked_pair_ctes)."""
    from flinkapps_spark.operators.similarity import (
        LSH_BANDS, LSH_BITS, LSH_Q, lsh_plane_ints)
    planes = lsh_plane_ints(LSH_BANDS * LSH_BITS, EMB_DIM)
    vals = ", ".join(f"({p}, {w})" for p, w in enumerate(planes))
    nrm = " + ".join(f"v[{i}]*v[{i}]" for i in range(1, EMB_DIM + 1))
    dot = " + ".join(f"lna.v[{i}]*lnb.v[{i}]"
                     for i in range(1, EMB_DIM + 1))
    emb = f"""
        emb AS (
            SELECT vec_id, {SQL_EMB_D} AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 10000000,
                   [v2[1] + 0.05] || v2[2:]
            FROM (SELECT vec_id, {SQL_EMB_D} AS v2 FROM embeddings)
        ),""" if with_emb else ""
    return f"""{emb}
        lshn AS (SELECT vec_id, v, sqrt({nrm}) AS nrm FROM emb),
        lshq AS (
            SELECT vec_id,
                   list_transform(v, x -> CAST(floor(x / nrm * {LSH_Q!r}
                                                     + 0.5) AS BIGINT)) AS q
            FROM lshn WHERE nrm > 0
        ),
        lshp(pid, w) AS (VALUES {vals}),
        lshd AS (
            -- list_dot_product returns DOUBLE, but every operand is an
            -- integer-valued double < 2^53, so the result is the EXACT
            -- integer in any evaluation order (native vectorized form:
            -- 13 s at sf1 vs ~20 min for the list_transform lambda)
            SELECT vec_id, pid, list_dot_product(q, w) AS d
            FROM lshq, lshp
        ),
        lshs AS (
            SELECT vec_id, pid // {LSH_BITS} AS band,
                   SUM(CASE WHEN d >= 0
                       THEN CAST(1 << (pid % {LSH_BITS}) AS BIGINT)
                       ELSE 0 END) AS sig
            FROM lshd GROUP BY vec_id, pid // {LSH_BITS}
        ),
        lshc AS (
            SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
            FROM lshs x JOIN lshs y
              ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
        ),
        {final} AS MATERIALIZED (
            -- MATERIALIZED: consumers reference the pair set more than
            -- once (recall joins, symmetrized edge lists, recursive
            -- reachability); without the hint DuckDB re-inlines the whole
            -- signature+self-join pipeline per reference — the sf10
            -- semdedup oracle ran past its 600 s timeout that way
            SELECT c.id_a, c.id_b,
                   ROUND(({dot}) / (lna.nrm * lnb.nrm), 6) AS cosine
            FROM lshc c
            JOIN lshn lna ON lna.vec_id = c.id_a
            JOIN lshn lnb ON lnb.vec_id = c.id_b
            WHERE ROUND(({dot}) / (lna.nrm * lnb.nrm), 6) >= {threshold!r}
        )"""


@query(
    "knn_cosine_bruteforce",
    oracle=f"""
        WITH emb AS (SELECT vec_id, {SQL_EMB_D} AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10)
        SELECT query_id, vec_id,
               ROUND({_sql_cos('qv', 'v')}, 6) AS cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND({_sql_cos('qv', 'v')}, 6) DESC, vec_id)
                   AS INT) AS rank
        FROM emb CROSS JOIN q
        WHERE vec_id <> query_id
        QUALIFY rank <= 5
    """,
    category="extension: similarity (brute-force k-NN)",
    doc="Exact top-5 cosine neighbors for query vectors (vec_id<10): "
        "queries broadcast, corpus single-pass, per-query top-k rank. "
        "Ranking key is cosine rounded to 6dp + vec_id tiebreak → ulp-proof.",
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), k=5)


def _ann_selfcheck(brute: DataFrame, ann: DataFrame,
                   floor: float) -> DataFrame:
    """Deterministic ANN quality gate: recall@k of ``ann`` against the
    brute-force truth computed in the same plan.  Emits (n_queries,
    recall_ok) — the estimate-independent shape a cross-engine oracle can
    assert (the neighbor lists themselves are index-specific)."""
    hits = ann.select("query_id", "vec_id").withColumn("hit", F.lit(1))
    j = brute.select("query_id", "vec_id").join(
        hits, ["query_id", "vec_id"], "left")
    return j.agg(
        F.countDistinct("query_id").alias("n_queries"),
        ((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
          / F.count(F.lit(1))) >= floor).alias("recall_ok"))


def _ann_gate(brute: DataFrame, ann: DataFrame, cand: DataFrame,
              corpus_n: int, recall_floor: float,
              frac_budget: float) -> DataFrame:
    """ANN quality gate with a candidate-volume audit: recall@k of ``ann``
    against the brute-force truth PLUS a check that the measured candidate
    fraction (|cand| / (n_queries · corpus_n)) stays within the i.i.d.-
    plane prediction.  A correlated plane family (the round-8 bug class —
    buckets collapse, candidates explode toward n²) trips cand_frac_ok
    even while recall looks fine.  Emits (n_queries, recall_ok,
    cand_frac_ok) — the estimate-independent shape a cross-engine oracle
    can assert (neighbor lists themselves are index-specific)."""
    hits = ann.select("query_id", "vec_id").withColumn("hit", F.lit(1))
    j = brute.select("query_id", "vec_id").join(
        hits, ["query_id", "vec_id"], "left")
    rec = j.agg(
        F.countDistinct("query_id").alias("n_queries"),
        ((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
          / F.count(F.lit(1))) >= recall_floor).alias("recall_ok"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    return (rec.crossJoin(nc)
            .select("n_queries", "recall_ok",
                    (F.col("n_cand")
                     <= F.lit(float(frac_budget) * corpus_n)
                     * F.col("n_queries")).alias("cand_frac_ok")))


@query(
    "knn_cosine_lsh",
    oracle="""
        SELECT COUNT(*) AS n_queries, true AS recall_ok,
               true AS cand_frac_ok
        FROM embeddings WHERE vec_id < 10
    """,
    category="extension: similarity (LSH ANN)",
    doc="Band-OR multi-code hyperplane LSH ANN (round 9 — replaces the "
        "single 5-bit code whose recall was 0.24-0.32): L independent "
        "r-bit codes sized from the corpus count (r ≈ log2 n − 1; L "
        "solves the target-recall equation at the fixture-measured "
        "worst-case per-bit agreement 0.60), hamming≤1 multi-probe, "
        "exact cosine re-rank of the candidate union. Measured recall@5 "
        "0.98-1.0 across fixtures (floor 0.9). The isotropic fixture's "
        "top-5 neighbors sit at cosine 0.26-0.49 (p1 ≈ 0.6), where the "
        "Indyk-Motwani exponent ρ = ln(1/p1)/ln(1/p2) ≈ 0.74 bounds ANY "
        "sublinear index: candidate fraction is Θ(n^(ρ−1)) — measured "
        "0.62 @ n=500 → 0.52 @ n=2000 → 0.38 @ n=20000 under the sizing "
        "law (falling exactly as ρ predicts; the <5% regime is large-n "
        "and/or real near neighbors — knn_lsh_neardup measures 3e-4). "
        "cand_frac_ok asserts the measured fraction ≤ 1.5× the i.i.d.-"
        "plane prediction, which catches plane-correlation bugs "
        "(the round-8 class) as candidate explosions.",
)
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: emb feeds the sig table, the re-rank, the brute-force
    # baseline and the gate — the count below materializes it (guide §1.2)
    emb = load_table(spark, sf_dir, "embeddings").persist()
    q = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    r, lbands = similarity.knn_lsh_params(n)
    cand = similarity.knn_lsh_candidates(
        emb, q, n_bands=lbands, band_bits=r).persist()
    ann = similarity.knn_rerank(cand, emb, q, k=5)
    budget = min(1.0, 1.5 * similarity.knn_lsh_expected_frac(lbands, r))
    return _ann_gate(similarity.knn_bruteforce(emb, q, k=5), ann, cand,
                     corpus_n=n, recall_floor=0.9, frac_budget=budget)


@query(
    "knn_lsh_neardup",
    oracle="""
        SELECT COUNT(*) AS n_queries, true AS recall_ok,
               true AS cand_frac_ok
        FROM embeddings WHERE vec_id < 10
    """,
    category="extension: similarity (LSH ANN, near-neighbor regime)",
    doc="The band-OR index in the regime ANN is actually deployed for — "
        "queries that HAVE a true near neighbor (each query is a "
        "perturbed copy at cosine ≈ 0.9987 of its original; per-bit "
        "agreement p1 ≈ 0.984): a fixed 8×16-bit single-probe index "
        "finds the true top-1 with P(miss) = (1−p1^16)^8 ≈ 8e-6 while "
        "random vectors collide at 8/2^16 ≈ 1.2e-4 — measured recall@1 "
        "= 1.0 at a 3e-4 candidate fraction (gate: recall ≥ 0.9, "
        "fraction < 5%). Together with knn_cosine_lsh this brackets the "
        "index: ρ-law-bounded on isotropic needles, 3000× sublinear on "
        "real near-dup queries.",
)
def knn_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_embeddings(spark, sf_dir)
    q = aug.filter((F.col("vec_id") >= 10000000)
                   & (F.col("vec_id") < 10000010))
    n = aug.count()
    cand = similarity.knn_lsh_candidates(
        aug, q, n_bands=8, band_bits=16, multi_probe=False).persist()
    ann = similarity.knn_rerank(cand, aug, q, k=1)
    return _ann_gate(similarity.knn_bruteforce(aug, q, k=1), ann, cand,
                     corpus_n=n, recall_floor=0.9, frac_budget=0.05)


def _aug_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus a +0.05-perturbed copy of each vector
    (id+10000000 — the offset must exceed vec_id at EVERY sf this fixture
    reaches: +100000 collided with real ids at sf10's 200k vectors,
    which silently merged colliding rows in GROUP BY vec_id oracles):
    the fixture has no natural near-dups, so near-dup queries share this
    augmentation to stay non-vacuous (cosine ≈ 0.9987 per orig/copy pair).

    Persisted + materialized: every caller fans this frame into several
    heavy subtrees (signature/cell tables, both verify sides, node lists,
    brute-force baselines), and an un-persisted aug re-ran the double
    scan + transform once PER SUBTREE — knn_lsh_neardup's captured plan
    had 28 parquet scans of embeddings before this (round-9, guide §1.2:
    don't compute things twice).  ~n·dim doubles, MEMORY_AND_DISK-class
    size at any sf this repo runs."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    pert = emb_d.select(
        _guarded_offset("vec_id", 10000000).alias("vec_id"),
        F.concat(F.array(F.element_at("v", 1) + 0.05),
                 F.slice("v", 2, 10_000)).alias("v"))
    aug = (emb_d.unionByName(pert).withColumnRenamed("v", "embedding")
           .persist())
    aug.count()
    return aug


@query(
    "embedding_neardup_pairs",
    oracle=f"""
        WITH {_sql_blocked_pair_ctes(0.99)}
        SELECT id_a, id_b, cosine FROM pairs
    """,
    category="extension: dedup (embedding cosine)",
    doc="Embedding near-dup pairs (cosine ≥ 0.99). Fixture has no natural "
        "near-dups (max random-pair cosine ≈ 0.51), so each vector is "
        "duplicated with +0.05 on component 0 — the vectors are unit-norm, "
        "giving pair cosine ≈ 0.9987, above threshold (a +0.5 bump lands "
        "at ≈ 0.895 and would make the whole query a vacuous empty set). "
        "Spark side "
        "runs the recall-LOSSLESS grid-blocked join (normalized leading "
        "components, 27-cell probe — see operators/similarity.py); the "
        "oracle reproduces the same lossless blocking in independent "
        "DuckDB SQL (_sql_blocked_pair_ctes — all-pairs is ~8e8 pairs at "
        "sf1), and the blocked-equals-exhaustive property is pinned by "
        "tests/test_engine_units.py::test_neardup_blocking_lossless.",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_neardup_pairs(
        _aug_embeddings(spark, sf_dir), threshold=0.99)


@query(
    "embedding_pq_audit",
    oracle="""
        SELECT COUNT(*) AS n_vectors, true AS mean_ok, true AS min_ok
        FROM embeddings
    """,
    category="extension: similarity (product quantization)",
    doc="Product-quantization audit — the IVF-PQ billion-vector "
        "compression path: 8 subspaces × 16-word seeded-KMeans codebooks "
        "encode each 64-dim vector as 8 bytes (64× smaller than raw "
        "doubles); reconstruction cosine against the original is gated "
        "by conservative floors (observed mean ≈ 0.65-0.68 and min ≈ "
        "0.52-0.57 across fixtures; floors 0.5 / 0.3 — the LSH/IVF "
        "recall-gate pattern, since codebooks are seed-specific and the "
        "codes themselves cannot be cross-engine-hashed). Encode and "
        "reconstruct are pure Column expressions (element_at into "
        "literal codebooks): the corpus-scale pass is map-only codegen.",
)
def embedding_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_encode_audit(emb)


NEARDUP_SWEEP_THRESHOLDS = (0.99, 0.995, 0.998, 0.999)


@query(
    "neardup_threshold_sweep",
    oracle=f"""
        WITH {_sql_blocked_pair_ctes(NEARDUP_SWEEP_THRESHOLDS[0])}
        SELECT t.threshold, COUNT(p.cosine) AS n_pairs
        FROM (VALUES {', '.join(f'({t})' for t in NEARDUP_SWEEP_THRESHOLDS)})
             t(threshold)
        LEFT JOIN pairs p ON p.cosine >= t.threshold
        GROUP BY t.threshold
    """,
    category="extension: dedup (threshold sensitivity sweep)",
    doc="Near-dup pair counts at several cosine thresholds in ONE pass — "
        "the calibration table a dedup pipeline produces before choosing "
        "its cutoff. Pairs are generated once by the lossless grid-blocked "
        "join at the LOWEST threshold (0.99, so every sweep point sees the "
        "complete pair set), then a 4-row broadcast threshold grid "
        "re-buckets them; cost is one pair generation regardless of sweep "
        "size. Zero-pair thresholds still emit a row (left join).",
)
def neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity.embedding_neardup_pairs(
        _aug_embeddings(spark, sf_dir),
        threshold=NEARDUP_SWEEP_THRESHOLDS[0]).select("cosine")
    grid = spark.createDataFrame(
        [(t,) for t in NEARDUP_SWEEP_THRESHOLDS], "threshold double")
    return (F.broadcast(grid)
            .join(pairs, F.col("cosine") >= F.col("threshold"), "left")
            .groupBy("threshold").agg(F.count("cosine").alias("n_pairs")))


# non-recursive CTE prefix shared by the semantic-dedup oracle: the same
# augmented-embedding pair graph embedding_neardup_pairs verifies, via the
# same scaled blocked-pair CTEs (exposes ``emb`` and ``pairs``).
_SQL_SEM_PAIRS = _sql_blocked_pair_ctes(0.99)


@query(
    "semdedup_keep",
    oracle=f"""
        WITH RECURSIVE {_SQL_SEM_PAIRS},
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT vec_id AS node, vec_id AS r FROM emb
            UNION
            SELECT reach.node, e.dst
            FROM reach JOIN edges e ON reach.r = e.src
        ),
        comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM comp GROUP BY cluster_id)
        SELECT comp.node AS vec_id, comp.cluster_id, s.cluster_size,
               comp.node = comp.cluster_id AS is_kept
        FROM comp JOIN sizes s USING (cluster_id)
    """,
    category="extension: dedup (semantic / embedding clusters)",
    doc="Semantic dedup over embeddings (the SemDeDup recipe from the "
        "public Meta paper, made deterministic): near-dup pairs at cosine "
        "≥ 0.99 via the recall-lossless grid-blocked join, transitive "
        "closure via min-label-propagation connected components, keep the "
        "minimum vec_id per cluster. Deviation from the paper: "
        "deterministic grid blocking replaces k-means (whose cluster "
        "assignments are seed/engine-specific and would make an exact "
        "oracle impossible); at the 0.99 threshold blocking is "
        "recall-lossless, so the kept set is exact, not approximate. "
        "Scale: pairs shuffle on grid cells, components shuffle on node "
        "id per round (O(diameter) rounds, tiny for dedup graphs) — no "
        "all-pairs stage anywhere.",
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_embeddings(spark, sf_dir)
    pairs = similarity.embedding_neardup_pairs(aug, threshold=0.99) \
        .select("id_a", "id_b")
    nodes = aug.select(F.col("vec_id").alias("node"))
    comp = dedup.connected_components(nodes, pairs)
    sizes = comp.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (comp.join(sizes, "label")
            .select(F.col("node").alias("vec_id"),
                    F.col("label").alias("cluster_id"),
                    "cluster_size",
                    (F.col("node") == F.col("label")).alias("is_kept")))


@query(
    "embedding_neardup_lsh",
    oracle=f"""
        WITH {_sql_lsh_pair_ctes(0.99)}
        SELECT id_a, id_b, cosine FROM lsh_pairs
    """,
    category="extension: dedup (embedding cosine, LSH-banded)",
    doc="Embedding near-dup pairs (cosine ≥ 0.99) via hyperplane-banded "
        "LSH + exact cosine verify — the candidate generator whose "
        "volume does NOT depend on corpus clustering (VERDICT r7 #1: the "
        "grid-blocked path goes quadratic on isotropic embeddings — sf10 "
        "measured 4.6e10 candidates / disk exhaustion; banding prunes by "
        "ANGLE, ~n²·b/2^r candidates on any shape). Signatures are "
        "integer arithmetic end-to-end (quantized unit components × "
        "integer planes, every intermediate < 2^53), so the oracle "
        "mirrors the banding BIT-FOR-BIT — an exact-hash check, not a "
        "recall gate. Recall vs the lossless grid path is measured by "
        "neardup_lsh_recall (theory: miss ≈ 4e-4 at the 0.99 boundary, "
        "2e-8 for the fixture's 0.9987 pairs).",
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_neardup_pairs_lsh(
        _aug_embeddings(spark, sf_dir), threshold=0.99)


@query(
    "neardup_lsh_recall",
    oracle=f"""
        WITH {_sql_blocked_pair_ctes(0.99)},
        {_sql_lsh_pair_ctes(0.99, with_emb=False)},
        rc AS (
            SELECT (SELECT COUNT(*) FROM pairs) AS n_exact,
                   (SELECT COUNT(*) FROM lsh_pairs) AS n_lsh,
                   (SELECT COUNT(*) FROM pairs p JOIN lsh_pairs l
                      ON p.id_a = l.id_a AND p.id_b = l.id_b) AS n_common
        )
        SELECT n_exact, n_lsh, n_common,
               ROUND(CAST(n_common AS DOUBLE) / n_exact, 6) AS recall
        FROM rc
    """,
    category="extension: dedup (LSH recall audit)",
    doc="Measured recall of the LSH-banded near-dup generator against "
        "the recall-LOSSLESS grid path at the same threshold (0.99), in "
        "ONE plan: pair counts from both generators plus their overlap. "
        "Every LSH pair passes the exact cosine verify, so lsh ⊆ exact "
        "and n_common = n_lsh — the join PROVES the subset property "
        "rather than assuming it. Runs both generators, so this query "
        "is bounded by the grid path's input-shape behavior — it is the "
        "sf≤1 calibration table, not the sf10 scale path.",
)
def neardup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_embeddings(spark, sf_dir)
    exact = similarity.embedding_neardup_pairs(aug, threshold=0.99) \
        .select("id_a", "id_b")
    lsh = similarity.embedding_neardup_pairs_lsh(aug, threshold=0.99) \
        .select("id_a", "id_b").withColumn("hit", F.lit(1))
    stats = (exact.join(lsh, ["id_a", "id_b"], "left")
             .agg(F.count(F.lit(1)).alias("n_exact"),
                  F.coalesce(F.sum("hit"), F.lit(0)).alias("n_common")))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    return (stats.crossJoin(n_lsh)
            .select("n_exact", "n_lsh", "n_common",
                    F.round(F.col("n_common") / F.col("n_exact"), 6)
                    .alias("recall")))


@query(
    "semdedup_keep_lsh",
    oracle=f"""
        WITH RECURSIVE {_sql_lsh_pair_ctes(0.99)},
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM lsh_pairs
            UNION ALL
            SELECT id_b, id_a FROM lsh_pairs
        ),
        reach AS (
            SELECT vec_id AS node, vec_id AS r FROM emb
            UNION
            SELECT reach.node, e.dst
            FROM reach JOIN edges e ON reach.r = e.src
        ),
        comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM comp GROUP BY cluster_id)
        SELECT comp.node AS vec_id, comp.cluster_id, s.cluster_size,
               comp.node = comp.cluster_id AS is_kept
        FROM comp JOIN sizes s USING (cluster_id)
    """,
    category="extension: dedup (semantic / embedding clusters, LSH)",
    doc="Semantic dedup end-to-end on the SCALE path (VERDICT r7 #1-2): "
        "near-dup pairs from the hyperplane-banded LSH generator (exact "
        "oracle mirror — see embedding_neardup_lsh), transitive closure "
        "via edge-contracting connected components, keep the minimum "
        "vec_id per cluster. Same output contract as semdedup_keep; the "
        "pair generator is the only difference — grid blocking needs "
        "clustered embeddings to prune, banding stays ~n²·b/2^r on any "
        "input shape, which is what survives an isotropic 100 TB corpus.",
)
def semdedup_keep_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_embeddings(spark, sf_dir)
    pairs = similarity.embedding_neardup_pairs_lsh(aug, threshold=0.99) \
        .select("id_a", "id_b")
    nodes = aug.select(F.col("vec_id").alias("node"))
    comp = dedup.connected_components(nodes, pairs)
    sizes = comp.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (comp.join(sizes, "label")
            .select(F.col("node").alias("vec_id"),
                    F.col("label").alias("cluster_id"),
                    "cluster_size",
                    (F.col("node") == F.col("label")).alias("is_kept")))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

SQL_STOPS = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@query(
    "text_quality_score",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {SQL_WORDS} AS ws FROM documents),
        m AS (
            SELECT doc_id,
                   len(ws) AS n_tokens,
                   ROUND(CAST(list_sum(list_transform(ws, w -> length(w)))
                              AS DOUBLE) / len(ws), 4) AS avg_word_len,
                   ROUND(CAST(length(text) - length(regexp_replace(text,
                         '[^\\w\\s]', '', 'g')) AS DOUBLE)
                         / length(text), 6) AS punct_ratio,
                   ROUND(CAST(len(list_filter(ws,
                         w -> list_contains({SQL_STOPS}, w))) AS DOUBLE)
                         / len(ws), 6) AS stopword_ratio
            FROM t
        )
        SELECT doc_id, n_tokens, avg_word_len, punct_ratio, stopword_ratio,
               ROUND(LEAST(1.0, n_tokens / 100.0) * 0.5
                     + (1.0 - punct_ratio) * 0.3
                     + LEAST(1.0, stopword_ratio * 5.0) * 0.2, 6)
                   AS quality_score
        FROM m
    """,
    category="extension: text analysis (quality)",
    doc="Per-document quality metrics: token count, avg word length, "
        "punctuation ratio, stopword ratio, composite score — all builtin "
        "array lambdas, zero Python.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = textstats.tokenize(F.col("text"))
    base = docs.select(
        "doc_id", "text",
        textstats.token_count(toks).alias("n_tokens"),
        F.round(textstats.avg_word_len(toks), 4).alias("avg_word_len"),
        F.round(textstats.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(textstats.stopword_ratio(toks), 6).alias("stopword_ratio"))
    return base.select(
        "doc_id", "n_tokens", "avg_word_len", "punct_ratio", "stopword_ratio",
        F.round(textstats.quality_score(
            F.col("n_tokens"), F.col("punct_ratio"),
            F.col("stopword_ratio")), 6).alias("quality_score"))


def _sql_lang_case() -> tuple[str, str]:
    score_cols = []
    for lang in LANG_PRIORITY:
        markers = "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
        score_cols.append(
            f"len(list_filter(ws, w -> list_contains({markers}, w))) "
            f"AS score_{lang}")
    greatest = "GREATEST(" + ", ".join(
        f"score_{lang}" for lang in LANG_PRIORITY) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} >= {greatest} THEN '{lang}'"
        for lang in LANG_PRIORITY) + " END"
    return ", ".join(score_cols), case


_SQL_LANG_SCORES, _SQL_LANG_CASE = _sql_lang_case()


@query(
    "text_langid",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {SQL_WORDS} AS ws FROM documents),
        s AS (SELECT doc_id, lang, {_SQL_LANG_SCORES} FROM t)
        SELECT doc_id, lang AS labeled_lang,
               {_SQL_LANG_CASE} AS predicted_lang,
               {", ".join(f"score_{lang}" for lang in LANG_PRIORITY)}
        FROM s
    """,
    category="extension: text analysis (language ID)",
    doc="Marker-word language-ID heuristic: per-language hit counts, argmax "
        "with deterministic priority tie-break. (Fixture text is synthetic "
        "English-ish regardless of its lang label; the operator surface is "
        "what's verified.)",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = textstats.tokenize(F.col("text"))
    scores = textstats.lang_scores(toks)
    return docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        textstats.predict_lang(scores).alias("predicted_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_PRIORITY])


@query(
    "doc_fingerprint",
    oracle=f"""
        WITH t AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents)
        SELECT doc_id,
               list_reduce(
                   [CAST(0 AS BIGINT)] ||
                   list_transform(ws, w -> {_sql_word_code('w')}),
                   (a, b) -> (a * {FINGERPRINT_BASE} + b) % {HASH_MOD})
                   AS fingerprint
        FROM t
    """,
    category="extension: text analysis (fingerprint)",
    doc="Order-sensitive rolling document fingerprint: poly-1000003 fold "
        "over per-word poly-31 codes, mod 2^31-1 — engine-portable (oracle "
        "reproduces exact values).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = textstats.tokenize(F.col("text"))
    return docs.select(
        "doc_id", textstats.doc_fingerprint(toks).alias("fingerprint"))


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "multimodal_byte_features",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               CAST(ascii(text[1]) AS INT) AS first_byte,
               md5(text) AS content_md5
        FROM documents
    """,
    category="extension: multimodal (binary plumbing)",
    doc="Opaque binary payload column + Arrow-batched mapInPandas feature "
        "extraction (deterministic byte features stand in for the stubbed "
        "image/audio codecs — operators/multimodal.py). md5(utf-8 bytes) "
        "matches DuckDB md5(text); fixture text is pure ASCII so "
        "first_byte == ascii(first char).",
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = multimodal.attach_binary_payload(docs)
    return multimodal.extract_byte_features(with_payload)


@query(
    "text_domain_stats",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id, text, lang, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 2000000, text, lang, source, n_chars
            FROM documents WHERE doc_id % 10 = 0)
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_unique_texts,
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
                   / COUNT(*) AS dup_rate,
               CAST(SUM(len({SQL_WORDS})) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               COUNT(DISTINCT lang) AS n_langs
        FROM aug GROUP BY source
    """,
    category="extension: curation (domain mix report)",
    doc="Per-source (domain) corpus report: doc counts, exact-dup rate "
        "by content digest, token/char totals, language spread — the "
        "mix audit run before choosing training sampling weights "
        "(constructed dups: id%10 docs duplicated verbatim, keeping "
        "their source). Scale: one partial-agg shuffle keyed by source; "
        "distinct-counts shuffle the md5 digest (16 bytes), never the "
        "text.",
)
def text_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source", "n_chars")
    dup = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        "text", "lang", "source", "n_chars")
    aug = docs.unionByName(dup)
    digest = F.md5(F.encode("text", "UTF-8"))
    n_docs = F.count(F.lit(1))
    n_uniq = F.countDistinct(digest)
    return (aug.groupBy("source")
            .agg(n_docs.alias("n_docs"),
                 n_uniq.alias("n_unique_texts"),
                 ((n_docs - n_uniq).cast("double") / n_docs)
                 .alias("dup_rate"),
                 F.sum(F.size(tokenize(F.col("text")))).cast("long")
                 .alias("total_tokens"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.countDistinct("lang").alias("n_langs")))


# all xor masks of popcount ≤ 2 over the 24-bit phash code: the radius-2
# hamming ball the oracle enumerates (1 + 24 + C(24,2) = 301 values)
_PHASH_BALL_MASKS = ", ".join(
    f"({m})" for m in
    [0] + [1 << i for i in range(24)]
    + [(1 << i) | (1 << j) for i in range(24) for j in range(i + 1, 24)])


@query(
    "multimodal_phash_neardup",
    oracle=f"""
        WITH aug AS ({SQL_AUG_NEAR}),
        cl AS (
            SELECT doc_id,
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT)) AS cs,
                   len(text) AS n
            FROM aug
        ),
        blk AS (
            SELECT doc_id, j,
                   COALESCE(list_sum(
                       cs[((j * n) // 25) + 1 : ((j + 1) * n) // 25]), 0)
                       AS bsum,
                   ((j + 1) * n) // 25 - (j * n) // 25 AS blen
            FROM (SELECT doc_id, cs, n, unnest(range(25)) AS j FROM cl) t
        ),
        bits AS (
            SELECT x.doc_id,
                   CASE WHEN x.bsum * y.blen > y.bsum * x.blen
                        THEN CAST(1 AS BIGINT) << CAST(x.j AS INT)
                        ELSE 0 END AS bit
            FROM blk x JOIN blk y
              ON x.doc_id = y.doc_id AND y.j = x.j + 1
            WHERE x.j < 24
        ),
        sig AS (
            SELECT doc_id, CAST(COALESCE(SUM(bit), 0) AS BIGINT) AS sig
            FROM bits GROUP BY doc_id
        ),
        -- hamming-ball candidate enumeration (round 9): the banded
        -- pigeonhole mirror generated 3·Σ C(block,2) ≈ 7e9 candidate
        -- rows + a DISTINCT at the sf10 fixture (8-bit band values over
        -- 1M docs → ~4k-doc blocks) and timed out at 600 s.  Radius-2
        -- over a 24-bit code is only 1+24+C(24,2) = 301 xor masks, and
        -- xor(sig_a, sig_b) is ONE specific mask, so joining each doc's
        -- sig against the ball of DISTINCT sig values yields every
        -- qualifying pair EXACTLY once — candidates = output, no
        -- verify surplus, no DISTINCT.  Same final set as the banded
        -- (lossless) form, therefore same result as the Spark side.
        sv AS MATERIALIZED (SELECT DISTINCT sig AS s FROM sig),
        masks(m) AS (VALUES {_PHASH_BALL_MASKS}),
        ball AS (SELECT s, xor(s, CAST(m AS BIGINT)) AS ns FROM sv, masks)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM sig a JOIN ball ON ball.s = a.sig
                   JOIN sig b ON b.sig = ball.ns
                              AND a.doc_id < b.doc_id
    """,
    category="extension: multimodal (perceptual-hash near-dup)",
    doc="Perceptual-hash near-duplicate detection over binary payloads: "
        "a dHash-style 24-bit gradient signature (25 integer block "
        "means, compared via exact cross-products so no float enters "
        "the signature) with banded hamming LSH — 3 x 8-bit bands, "
        "pigeonhole-LOSSLESS for the hamming<=2 cut, exact popcount "
        "verification. This is the image near-dup shape (resize -> "
        "grayscale gradient -> band join) running on the byte-level "
        "stand-in payloads, bridging the multimodal plumbing and the "
        "dedup family. Scale: the signature pass is one map-side Arrow "
        "stage; only 8-byte signatures ride the band-join shuffle, "
        "payloads never do.",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    with_payload = multimodal.attach_binary_payload(docs)
    return multimodal.phash_neardup_pairs(with_payload)


@query(
    "multimodal_audio_energy",
    oracle="""
        WITH codes AS (
            SELECT doc_id,
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT)) AS cs
            FROM documents),
        w AS (SELECT doc_id, cs, unnest(range(0, len(cs), 64)) AS st
              FROM codes WHERE len(cs) > 0),
        seg AS (SELECT doc_id, CAST(st / 64 AS BIGINT) AS window_idx,
                       cs[st + 1 : st + 64] AS s
                FROM w)
        SELECT doc_id, window_idx,
               CAST(len(s) AS INT) AS n_samples,
               sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE)
                    / len(s)) AS rms,
               CAST(list_max(s) AS INT) AS peak
        FROM seg
    """,
    category="extension: multimodal (audio plumbing)",
    doc="Windowed audio energy (RMS + peak per 64-'sample' window) over "
        "binary payloads via 1→N mapInPandas — the audio-feature batch "
        "shape (VAD / loudness / silence-trim); codec stubbed, byte "
        "samples stand in for PCM (operators/multimodal.py). Exact: sum "
        "of squares is int64, rms = one IEEE division + sqrt, identical "
        "on both engines. Map-side only — no shuffle; payloads never "
        "move.",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_window_energy(
        multimodal.attach_binary_payload(docs))


@query(
    "dedup_keep_set",
    oracle=f"""
        WITH aug AS ({SQL_AUG_NEAR}),
        docs_w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM aug),
        wcodes AS (
            SELECT doc_id,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= 3
        ),
        codes AS (
            SELECT doc_id, {_sql_shingle_codes('wc')} AS cset FROM wcodes
        ),
        ex AS (SELECT doc_id AS doc, unnest(cset) AS code FROM codes),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM ex GROUP BY doc),
        common AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
            FROM ex a JOIN ex b ON a.code = b.code AND a.doc < b.doc
            GROUP BY a.doc, b.doc
        ),
        dupes AS (
            SELECT DISTINCT doc_b AS doc FROM common
            JOIN sizes sa ON sa.doc = doc_a
            JOIN sizes sb ON sb.doc = doc_b
            WHERE ROUND(CAST(n_common AS DOUBLE)
                        / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.6
        )
        SELECT a.doc_id, COUNT(*) OVER () AS kept_total
        FROM aug a LEFT JOIN dupes d ON a.doc_id = d.doc
        WHERE d.doc IS NULL
    """,
    category="extension: dedup (keep-set)",
    doc="End-to-end dedup: the corpus MINUS every doc that near-duplicates "
        "(Jaccard ≥ 0.6) a lower-id doc — the keep-the-first policy a "
        "training pipeline actually applies after pair-finding. Anti-join "
        "against the higher-id side of the pair set.",
)
def dedup_keep_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    # exact prefix-join pair generator — the oracle/verify form; its
    # candidate volume is fixture-quadratic at sf10 (4.6e10), so the
    # scale rung runs dedup_keep_set_lsh instead (same policy, banded
    # generator)
    pairs = dedup.jaccard_pairs(docs, threshold=0.6)
    dupes = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # Persist the id-only dupe set and force it NOW: the expensive pair
    # search upstream then runs exactly once no matter how many consumers
    # the final plan has (the earlier form cached the corpus-sized keep
    # set lazily; under session storage pressure the cache evicted and
    # the pair search re-ran — 222 s vs 61 s at sf1).  doc_ids are unique
    # on both sides, so kept_total = |docs| − |dupes| without a second
    # pass or a partition-less window (which would drag every kept id
    # through one task at 100 TB).
    from pyspark import StorageLevel
    dupes = dupes.persist(StorageLevel.MEMORY_AND_DISK)
    n_dupes = dupes.count()
    n_docs = docs.count()
    kept = docs.join(dupes, "doc_id", "left_anti").select("doc_id")
    return kept.withColumn("kept_total", F.lit(n_docs - n_dupes))


@query(
    "dedup_keep_set_lsh",
    oracle=f"""
        WITH {_sql_minhash_pair_ctes(0.6)},
        dupes AS (SELECT DISTINCT doc_b AS doc FROM mh_pairs)
        SELECT a.doc_id,
               (SELECT COUNT(*) FROM aug)
                 - (SELECT COUNT(*) FROM dupes) AS kept_total
        FROM aug a LEFT JOIN dupes d ON a.doc_id = d.doc
        WHERE d.doc IS NULL
    """,
    category="extension: dedup (keep-set, LSH)",
    doc="The keep-the-first dedup policy on the SCALE path: docs minus "
        "every doc that near-duplicates (exact-verified Jaccard ≥ 0.6) a "
        "lower-id doc, with the pair graph from MinHash-LSH banding "
        "instead of the exact prefix join — the exact form "
        "(dedup_keep_set) is fixture-quadratic at sf10 (4.6e10 "
        "candidates → heap exhaustion), while banded candidate volume "
        "is ~n²·b/|key-space| on any vocabulary shape. The oracle "
        "mirrors every signature bit (shared _sql_minhash_pair_ctes), "
        "so the kept set is exact-hash-checked. Anti-join against the "
        "higher-id pair side; kept_total = |docs| − |dupes| computed "
        "from two bounded counts, never a partition-less window.",
)
def dedup_keep_set_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.6)
    dupes = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    from pyspark import StorageLevel
    dupes = dupes.persist(StorageLevel.MEMORY_AND_DISK)
    n_dupes = dupes.count()
    n_docs = docs.count()
    kept = docs.join(dupes, "doc_id", "left_anti").select("doc_id")
    return kept.withColumn("kept_total", F.lit(n_docs - n_dupes))


@query(
    "sample_hash_stratified",
    oracle=f"""
        WITH coded AS (
            SELECT doc_id, lang,
                   {_sql_word_code("lang || '-' || CAST(doc_id AS VARCHAR)")}
                       % 100 AS bucket
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_sampled,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM coded
        WHERE (lang = 'en' AND bucket < 50)
           OR (lang <> 'en' AND bucket < 20)
        GROUP BY lang
    """,
    category="extension: deterministic stratified sampling",
    doc="Reproducible stratified sampling for training-data curation: "
        "per-stratum rates (50% en, 20% others) decided by a deterministic "
        "content hash, NOT an RNG — reruns and other engines select the "
        "exact same rows (the oracle proves it). At 100 TB this is a "
        "stateless map-side filter; no sampling state, no seed drift.",
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import word_code
    docs = load_table(spark, sf_dir, "documents")
    bucket = word_code(
        F.concat(F.col("lang"), F.lit("-"),
                 F.col("doc_id").cast("string"))) % 100
    sampled = docs.withColumn("bucket", bucket).filter(
        ((F.col("lang") == "en") & (F.col("bucket") < 50))
        | ((F.col("lang") != "en") & (F.col("bucket") < 20)))
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"))


@query(
    "dedup_clusters",
    oracle=(_sql_shingle_cte(SQL_AUG_NEAR) + """,
        edges AS MATERIALIZED (
            -- MATERIALIZED: the recursive reach re-references edges each
            -- iteration; without the hint DuckDB re-inlines the whole
            -- prefix-join pipeline per iteration (~4x the cost at sf1)
            SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.6
            UNION ALL
            SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.6
        ),
        reach AS (
            SELECT doc_id AS doc, doc_id AS r FROM aug
            UNION
            SELECT reach.doc, e.dst
            FROM reach JOIN edges e ON reach.r = e.src
        )
        SELECT doc AS doc_id, MIN(r) AS cluster_id
        FROM reach GROUP BY doc
    """).replace("WITH ", "WITH RECURSIVE ", 1),
    category="extension: dedup (connected components, iterative)",
    doc="Transitive near-dup clusters: iterative min-label propagation "
        "(the DataFrame connected-components algorithm, localCheckpoint "
        "per round to truncate lineage) vs a recursive-CTE reachability "
        "oracle — every doc labeled with the min doc id in its component.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    # strategy pinned to the exact prefix generator — this query IS the
    # oracle/verify form (library callers get pairs="auto", which routes
    # corpora past DEDUP_CLUSTERS_LSH_THRESHOLD through the LSH form
    # that dedup_clusters_lsh pins and measures)
    return dedup.dedup_clusters(docs, threshold=0.6, pairs="prefix")


@query(
    "dedup_clusters_lsh",
    oracle=("WITH RECURSIVE " + _sql_minhash_pair_ctes(0.6) + """,
        edges AS MATERIALIZED (
            SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
            UNION ALL
            SELECT doc_b, doc_a FROM mh_pairs
        ),
        reach AS (
            SELECT doc_id AS doc, doc_id AS r FROM aug
            UNION
            SELECT reach.doc, e.dst
            FROM reach JOIN edges e ON reach.r = e.src
        )
        SELECT doc AS doc_id, MIN(r) AS cluster_id
        FROM reach GROUP BY doc
    """),
    category="extension: dedup (connected components, LSH-fed)",
    doc="The cluster pipeline on the SCALE path (VERDICT r7 #2): "
        "transitive near-dup clusters whose pair graph comes from "
        "MinHash-LSH banding (verified at Jaccard ≥ 0.6) instead of the "
        "Bayardo prefix join — banded candidate volume is "
        "~n²·b/|band-key-space| regardless of vocabulary shape, where "
        "the prefix path measured 99.5× candidate growth for 10× data "
        "on the uniform-vocabulary sf10 fixture (no rare head to prune). "
        "Same edge-contracting min-label connected components; the "
        "oracle mirrors every signature bit, so the check is exact. "
        "Banding recall < 1 vs the exact pair set (the S-curve — "
        "dedup_lsh_scurve documents it); both engines see the identical "
        "banded graph.",
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    # same unified API as dedup_clusters, strategy pinned to the LSH
    # generator ("auto" picks this form at corpus scale)
    return dedup.dedup_clusters(docs, threshold=0.6, pairs="lsh")


@query(
    "knn_cosine_ivf",
    oracle="""
        SELECT COUNT(*) AS n_queries, true AS recall_ok
        FROM embeddings WHERE vec_id < 10
    """,
    category="extension: similarity (IVF ANN)",
    doc="IVF inverted-file ANN: KMeans coarse quantizer (MLlib, fixed "
        "seed), per-query search limited to the n_probe nearest cells — "
        "the billion-vector scale path. Cell assignments are model-trained "
        "and engine-specific, so the query emits a recall@5 self-check "
        "against brute force computed in the same plan (observed ≥0.5 "
        "across fixtures with 3/16 cells probed; floor 0.25) and the "
        "oracle asserts literal true.",
)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: emb feeds the IVF index, its probes, and the brute-force
    # baseline (guide §1.2); the count materializes it
    emb = load_table(spark, sf_dir, "embeddings").persist()
    emb.count()
    q = emb.filter(F.col("vec_id") < 10)
    return _ann_selfcheck(similarity.knn_bruteforce(emb, q, k=5),
                          similarity.knn_ivf(emb, q, k=5), floor=0.25)


@query(
    "knn_cosine_ivfpq",
    oracle="""
        SELECT COUNT(*) AS n_queries, true AS recall_ok,
               true AS shortlist_ok, 32 AS compression_x
        FROM embeddings WHERE vec_id < 10
    """,
    category="extension: similarity (IVF-PQ ADC ANN)",
    doc="IVFADC (Jégou/Douze/Schmid 2011) — the billion-vector recipe "
        "completing the ANN ladder (bruteforce → LSH band-OR → IVF → "
        "IVF-PQ): coarse quantizer + RESIDUAL product quantization "
        "(m=8 subspaces × 256 words = 8-bit codes, 64-dim float32 → "
        "32× compression), asymmetric-distance shortlist that reads "
        "ONLY codes (m table lookups per candidate, LUTs amortized per "
        "query), exact cosine re-rank of the shortlist (sized "
        "8% of the probed volume — on this isotropic fixture the "
        "neighbor cosine gaps are comparable to ADC noise, so the "
        "fraction, not a constant, is what holds recall flat as cells "
        "grow; measured 1.7% → 0.76, 4% → 0.94 at n=20k). Codebooks "
        "are seed/sample-specific so neighbor lists can't be oracled; "
        "the gate is recall@5 vs brute force (floor 0.25 — IVF's "
        "3/16-cell probe loss dominates, same floor as knn_cosine_ivf) "
        "plus shortlist_ok: the ADC shortlist must recover ≥0.7 of the "
        "EXACT-within-probed-cells top-5 (same centroids, same probes — "
        "isolates PQ quantization noise from IVF probe loss; observed "
        "0.96-1.0 across fixtures). compression_x is the constructed "
        "dim·32 / (m·log2(words)) bits ratio.",
)
def knn_cosine_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist + count-first: emb feeds the trainer sample, the encode
    # pass, the re-rank, the brute-force baseline and the IVF-exact
    # baseline — seven scans un-persisted (guide §1.2)
    emb = load_table(spark, sf_dir, "embeddings").persist()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 10)
    X = similarity.training_sample(emb)  # one collect, both trainers
    centers = similarity.train_coarse_centroids(emb, sample=X)
    books = similarity.train_residual_books(emb, centers, sample=X)
    enc = similarity.ivfpq_encode(emb, centers, books)
    short = similarity.ivfpq_adc_shortlist(enc, q, centers, books,
                                           corpus_n=n)
    ann = similarity.knn_rerank(short.select("query_id", "vec_id"),
                                emb, q, k=5)
    rec = _ann_selfcheck(similarity.knn_bruteforce(emb, q, k=5),
                         ann, floor=0.25)
    ivf_exact = similarity.knn_ivf(emb, q, k=5, centroids=centers)
    sh = _ann_selfcheck(ivf_exact, short, floor=0.7) \
        .select(F.col("recall_ok").alias("shortlist_ok"))
    return (rec.crossJoin(sh)
            .withColumn("compression_x", F.lit(32))
            .select("n_queries", "recall_ok", "shortlist_ok",
                    "compression_x"))


# shortlist fraction sweep: per-mille of the probed volume → recall floor
# vs exact-within-probe.  Floors sit under the measured minima across
# fixtures (17‰: 0.48-0.76, 40‰: 0.66-0.94); 1000‰ keeps EVERY ranked
# candidate, so the set contains the exact-within-probe top-k by
# construction and recall is EXACTLY 1.0 (the deterministic endpoint,
# same role as n_probe=16 in knn_ivf_probe_sweep).
IVFPQ_SWEEP_PM = (17, 40, 1000)
IVFPQ_SWEEP_FLOORS = {17: 0.3, 40: 0.5, 1000: 1.0}


@query(
    "knn_ivfpq_shortlist_sweep",
    oracle=f"""
        SELECT p.frac_pm, COUNT(*) AS n_queries,
               true AS floor_ok, true AS monotone_ok
        FROM embeddings e CROSS JOIN (
            SELECT unnest([{", ".join(map(str, IVFPQ_SWEEP_PM))}])
                AS frac_pm) p
        WHERE e.vec_id < 10
        GROUP BY p.frac_pm
    """,
    category="extension: similarity (IVF-PQ shortlist calibration)",
    doc="The shortlist calibration table for the IVFADC index: ADC-"
        "shortlist recall of the exact-within-probed-cells top-5 at "
        "17‰, 40‰ and 1000‰ of the probed volume — the evidence behind "
        "the operator's fixed-FRACTION sizing rule (on this isotropic "
        "fixture neighbor cosine gaps ≈ 8-bit ADC noise, so a constant "
        "shortlist decays with cell growth while a constant fraction "
        "holds). One scoring pass: the full ADC-ranked candidate frame "
        "is computed once and the three cuts are srank filters, so the "
        "sweep costs one index scan, not three. Emitted values are the "
        "deterministic properties (floor checks, monotonicity — cuts "
        "NEST on one shared ranking — and the 1000‰ endpoint, which "
        "keeps every candidate and is therefore EXACTLY recall 1.0). "
        "Index internals are seed-specific; the oracle asserts the "
        "gate shape.",
)
def knn_ivfpq_shortlist_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    # persist: same multi-subtree fan-out as knn_cosine_ivfpq (guide §1.2)
    emb = load_table(spark, sf_dir, "embeddings").persist()
    q = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    X = similarity.training_sample(emb)  # one collect, both trainers
    centers = similarity.train_coarse_centroids(emb, sample=X)
    books = similarity.train_residual_books(emb, centers, sample=X)
    enc = similarity.ivfpq_encode(emb, centers, books)
    # persist: the three cuts below and the union re-reference these
    # plans — without the pin, "one scoring pass" would silently triple
    # (three aggregates each carrying the encode+ADC / cell-assign
    # lineage; ReuseExchange is not guaranteed across Python UDF nodes)
    ranked = similarity.ivfpq_adc_shortlist(
        enc, q, centers, books,
        shortlist=similarity.ALL_CANDIDATES).persist()
    truth = similarity.knn_ivf(emb, q, k=5, centroids=centers) \
        .select("query_id", "vec_id").persist()
    vol = 3 * n / 16          # n_probe·n/n_centroids, the probed volume
    rows = []
    for pm in IVFPQ_SWEEP_PM:
        if pm == 1000:
            # the endpoint keeps EVERY ranked candidate — the actual
            # all-candidates set, not an average-volume cut (cells are
            # not uniform; a cut at ceil(avg) could drop tail rows of an
            # overfull probe set and break the exact-1.0 property)
            hit = ranked.select("query_id", "vec_id") \
                .withColumn("hit", F.lit(1))
        else:
            r_cut = max(5, math.ceil(pm / 1000.0 * vol))
            hit = ranked.filter(F.col("srank") <= r_cut) \
                .select("query_id", "vec_id").withColumn("hit", F.lit(1))
        j = truth.join(hit, ["query_id", "vec_id"], "left")
        rows.append(j.agg(
            F.lit(pm).alias("frac_pm"),
            F.countDistinct("query_id").alias("n_queries"),
            (F.sum(F.coalesce(F.col("hit"), F.lit(0)))
             / F.count(F.lit(1))).alias("recall")))
    allp = rows[0]
    for df in rows[1:]:
        allp = allp.unionByName(df)
    from pyspark.sql import Window as W
    # partition-less window is safe: the frame is the 3-row sweep summary
    prev = F.lag("recall").over(W.orderBy("frac_pm"))
    floor = F.create_map(*[F.lit(x) for kv in IVFPQ_SWEEP_FLOORS.items()
                           for x in kv])
    return (allp.select(
        "frac_pm", "n_queries",
        (F.col("recall") >= floor.getItem(F.col("frac_pm")))
            .alias("floor_ok"),
        F.coalesce(F.col("recall") >= prev, F.lit(True))
            .alias("monotone_ok")))


@query(
    "text_token_counts",
    oracle=r"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                   AS n_ws_tokens,
               len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS n_bpe_tokens,
               CASE WHEN len(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9\s]+')) > 0
                    THEN CAST(n_chars AS DOUBLE)
                         / len(regexp_extract_all(lower(text),
                               '[a-z]+|[0-9]+|[^a-z0-9\s]+'))
               END AS chars_per_token
        FROM documents
    """,
    category="extension: text analysis (token counting)",
    doc="Per-document token counts two ways: whitespace split and a "
        "BPE-ish pre-tokenizer regex (letter runs | digit runs | "
        "punctuation runs — the GPT-2-style segmentation boundary, minus "
        "the learned merges), plus chars-per-token, the standard "
        "tokens~bytes budget estimator for training-data sizing. All "
        "JVM-side regexp builtins, zero Python; the quotient is left "
        "unrounded — identical int/int division on both engines is "
        "bit-deterministic, while ROUND on a repr boundary is not.",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # idx=0 = the whole match (Spark defaults to capture group 1)
    bpe = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), F.lit(0))
    n_bpe = F.size(bpe)
    n_ws = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+")))
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.when(n_bpe > 0,
               F.col("n_chars").cast("double") / n_bpe)
         .alias("chars_per_token"))


@query(
    "text_repetition",
    oracle=f"""
        WITH t AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
        g AS (SELECT doc_id, ws,
                     list_transform(range(greatest(len(ws) - 1, 0)),
                         i -> ws[i + 1] || ' ' || ws[i + 2]) AS g2,
                     list_transform(range(greatest(len(ws) - 2, 0)),
                         i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]) AS g3
              FROM t)
        SELECT doc_id, len(ws) AS n_tokens,
               CASE WHEN len(ws) > 0 THEN
                 CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
               END AS dup_word_frac,
               CASE WHEN len(g2) > 0 THEN
                 CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
               END AS dup_2gram_frac,
               CASE WHEN len(g3) > 0 THEN
                 CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
               END AS dup_3gram_frac
        FROM g
    """,
    category="extension: text analysis (repetition)",
    doc="Intra-document repetition signals (Gopher/C4-style quality "
        "filters): fraction of duplicate words / word-2-grams / "
        "word-3-grams per document. N-grams via zip_with over aligned "
        "slices of a materialized token column (array evaluated once per "
        "slice — not the per-element higher-order-function trap). All "
        "JVM-side; fractions are int/int divisions left unrounded "
        "(bit-identical on both engines).",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialize tokens once; downstream slices reference the column
    base = docs.select("doc_id", textstats.tokenize(F.col("text")).alias("ws"))
    g2 = textstats.word_ngrams(F.col("ws"), 2)
    g3 = textstats.word_ngrams(F.col("ws"), 3)
    staged = base.select(
        "doc_id", "ws", g2.alias("g2"), g3.alias("g3"))
    return staged.select(
        "doc_id",
        F.size("ws").alias("n_tokens"),
        textstats.dup_fraction(F.col("ws")).alias("dup_word_frac"),
        textstats.dup_fraction(F.col("g2")).alias("dup_2gram_frac"),
        textstats.dup_fraction(F.col("g3")).alias("dup_3gram_frac"))


@query(
    "multimodal_frame_sample",
    oracle="""
        WITH f AS (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(n_chars / 64.0) AS INT), 4))
                       AS frame_idx
            FROM documents
        )
        SELECT doc_id, frame_idx,
               length(substr(text, frame_idx * 64 + 1, 64)) AS frame_bytes,
               CAST(list_sum(list_transform(
                   string_split(substr(text, frame_idx * 64 + 1, 64), ''),
                   c -> ascii(c))) AS BIGINT) AS frame_sum
        FROM f
    """,
    category="extension: multimodal (frame sampling)",
    doc="Video-style frame sampling over opaque binary payloads: 64-byte "
        "frames, every 4th kept, one output row per frame (the 1:N "
        "mapInPandas expansion a real decoder produces; numpy byte "
        "slicing stands in for the codec). Runs map-side before any "
        "shuffle — payload bytes never enter an exchange. Oracle works "
        "because the fixture text is pure ASCII: UTF-8 byte sums equal "
        "code-point sums.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = multimodal.attach_binary_payload(docs)
    return multimodal.sample_frames(with_payload)


@query(
    "embedding_centroids",
    oracle=f"""
        WITH idx AS (
            SELECT label, embedding,
                   unnest(range(len(embedding))) AS pos
            FROM embeddings
        ),
        e AS (
            SELECT label, pos,
                   {sql_units('CAST(embedding[pos + 1] AS DOUBLE)', 10 ** 7)}
                       AS units
            FROM idx
        ),
        c AS (
            SELECT label, pos,
                   SUM(units) / COUNT(*) / 10000000 AS c,
                   COUNT(*) AS n
            FROM e GROUP BY label, pos
        )
        SELECT label, list(c ORDER BY pos) AS centroid,
               MAX(n) AS n_vectors
        FROM c GROUP BY label
    """,
    category="extension: embedding centroid agg",
    doc="Per-label centroid over array<float> embeddings (the cluster-"
        "center / class-prototype aggregation): posexplode → per-position "
        "fixed-point mean → position-ordered re-assembly. See "
        "operators/similarity.embedding_centroids for why ROUND(v*s, 0) "
        "int64 sums are the cross-engine-deterministic formulation.",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_centroids(emb)


@query(
    "pipeline_training_prep",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id, text, lang FROM documents
            UNION ALL
            SELECT doc_id + 2000000, text, lang FROM documents
            WHERE doc_id % 10 = 0
        ),
        keep AS (
            SELECT MIN(doc_id) AS doc_id FROM aug GROUP BY md5(text)
        ),
        kept AS (
            SELECT a.doc_id, a.text, a.lang
            FROM aug a JOIN keep USING (doc_id)
        ),
        tok AS (
            SELECT doc_id, lang, len({SQL_WORDS}) AS n_tokens FROM kept
        ),
        q AS (SELECT * FROM tok WHERE n_tokens >= 30),
        s AS (
            SELECT doc_id, lang, n_tokens,
                   {_sql_word_code("lang || '-' || CAST(doc_id AS VARCHAR)")}
                       % 100 AS bucket
            FROM q
        )
        SELECT doc_id, lang, n_tokens FROM s
        WHERE (lang = 'en' AND bucket < 50)
           OR (lang <> 'en' AND bucket < 20)
    """,
    category="extension: composed training-data pipeline",
    doc="The end-to-end curation pipeline as ONE declarative plan: exact "
        "dedup keep-set → length/quality gate → deterministic stratified "
        "sample → per-doc token counts. Because every stage is a Column "
        "expression or join, Catalyst fuses the whole chain — the quality "
        "filter and the hash-sample predicate run in the same codegen "
        "stage; the one shuffle is the md5 keep-set aggregate (the keep-set then BROADCASTS into a LeftSemi reused across both union branches — verified: 1 hash Exchange + ReusedExchange). "
        "This is the shape a 100 TB curation run takes: one pass + one "
        "digest shuffle, not four materialized intermediate datasets.",
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import word_code
    from flinkapps_spark.operators import joins

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    dup = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text", "lang")
    aug = docs.unionByName(dup)
    keep = (aug.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    kept = joins.semi_join(aug, keep, "doc_id")
    tok = kept.select(
        "doc_id", "lang",
        textstats.token_count(textstats.tokenize(F.col("text")))
        .alias("n_tokens"))
    q = tok.filter(F.col("n_tokens") >= 30)
    bucket = word_code(
        F.concat(F.col("lang"), F.lit("-"),
                 F.col("doc_id").cast("string"))) % 100
    s = q.withColumn("bucket", bucket)
    return (s.filter(((F.col("lang") == "en") & (F.col("bucket") < 50))
                     | ((F.col("lang") != "en") & (F.col("bucket") < 20)))
            .select("doc_id", "lang", "n_tokens"))


@query(
    "dedup_levenshtein_verify",
    oracle="""
        SELECT d.doc_id AS doc_a, d.doc_id + 1000000 AS doc_b,
               levenshtein(d.text,
                           regexp_replace(d.text, '^\\w+\\W+', '')) AS dist,
               CASE WHEN length(d.text) > 0 THEN
                 CAST(levenshtein(d.text,
                      regexp_replace(d.text, '^\\w+\\W+', '')) AS DOUBLE)
                 / length(d.text)
               END AS dist_ratio
        FROM documents d
    """,
    category="extension: dedup (edit distance)",
    doc="Edit-distance verification of near-dup candidates: levenshtein "
        "between each doc and its first-word-dropped variant (the "
        "constructed near-dup), absolute and normalized by length — the "
        "character-level fuzzy-match check that complements set-based "
        "Jaccard (catches reorderings Jaccard misses and vice versa). "
        "Scale: O(n*m) per pair — ONLY ever run on candidate pairs from "
        "LSH/banding, never as a pairwise pass; here the candidate set "
        "is the deterministic constructed pairs.",
)
def dedup_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = F.regexp_replace("text", "^\\w+\\W+", "")
    # materialize the O(n*m) levenshtein ONCE in an inner projection —
    # referencing the expression twice in one select would run the DP
    # twice per row (Catalyst subexpression elimination does not span
    # the two aliases under interpreted eval)
    base = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
        F.levenshtein(F.col("text"), variant).alias("dist"),
        F.length("text").alias("n"))
    return base.select(
        "doc_a", "doc_b", "dist",
        F.when(F.col("n") > 0,
               F.col("dist").cast("double") / F.col("n"))
            .alias("dist_ratio"))


@query(
    "multimodal_resize_profile",
    oracle="""
        WITH chars AS (
            SELECT doc_id, n_chars,
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT)) AS codes
            FROM documents
        )
        SELECT doc_id, n_chars AS n_bytes,
               list_transform(range(8), k ->
                   CASE WHEN ((k + 1) * n_chars) // 8 > (k * n_chars) // 8
                        THEN CAST(list_sum(codes[
                                 (k * n_chars) // 8 + 1 :
                                 ((k + 1) * n_chars) // 8]) AS DOUBLE)
                             / (((k + 1) * n_chars) // 8 - (k * n_chars) // 8)
                   END) AS profile
        FROM chars
    """,
    category="extension: multimodal (resize)",
    doc="Resize stage: block-mean downsample of each payload's byte "
        "sequence to a fixed 8-bin profile (1-D area interpolation — the "
        "deterministic stand-in for image resize, same fixed-size-output "
        "mapInPandas contract). Bin means are int-sum/int-count "
        "divisions → bit-identical across engines; oracle mirrors the "
        "bins with list slices over ASCII codes.",
)
def multimodal_resize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.resize_profile(multimodal.attach_binary_payload(docs))


@query(
    "udtf_first_words",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               w -> w <> '') AS ws
            FROM documents
        )
        SELECT doc_id,
               unnest(ws[1:3]) AS word,
               unnest(range(1, least(len(ws), 3) + 1)) AS pos
        FROM t
    """,
    category="extension: Python UDTF (lateral table function)",
    doc="User-defined TABLE function (Spark 4 @udtf): one input row → N "
        "output rows, registered in the session catalog and invoked "
        "through a SQL LATERAL join — the §2.8 scalar-UDF hook extended "
        "to table functions (the reference has no equivalent). The UDTF "
        "emits each document's first three whitespace tokens with "
        "positions; the oracle zips the same slice. Python-worker row "
        "path — a capability surface, not a hot-path choice (hot paths "
        "use explode/posexplode, which stay JVM-side).",
)
def udtf_first_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: bigint")
    class FirstWords:
        def eval(self, text: str):
            words = [w for w in (text or "").split() if w]
            for i, w in enumerate(words[:3], start=1):
                yield (w, i)

    spark.udtf.register("first_words_t", FirstWords)
    load_table(spark, sf_dir, "documents") \
        .createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT d.doc_id, t.word, t.pos "
        "FROM docs_for_udtf d, LATERAL first_words_t(d.text) t")


@query(
    "text_unigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({SQL_WORDS}) AS term FROM documents
        ),
        freq AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
        tot AS (SELECT COUNT(*) AS n FROM toks)
        SELECT doc_id, COUNT(*) AS n_tokens,
               {{AVG_NLL}} AS avg_nll
        FROM toks JOIN freq USING (term) CROSS JOIN tot
        GROUP BY doc_id
    """.format(AVG_NLL=sql_avg("-ln(CAST(tf AS DOUBLE) / n)", 10 ** 7)),
    category="extension: text analysis (unigram LM score)",
    doc="Unigram language-model quality score (the CCNet/Gopher-style "
        "perplexity filter, with the corpus itself as the LM): corpus "
        "unigram probabilities in one aggregation, then each document's "
        "mean negative log-probability — high avg_nll = rare-token-heavy "
        "(gibberish/OCR noise), low = repetitive boilerplate. Scale: the "
        "frequency table is vocabulary-sized and NOT force-broadcast "
        "(AQE decides, same policy as TF-IDF); the two shuffles are the "
        "token agg and the per-doc agg. Determinism: ln of the same "
        "int-ratio double is libm-identical on both engines, and the "
        "per-doc MEAN is a fixed-point exact_avg — token addition order "
        "cannot flip the result.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.plans.exact import exact_avg
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(textstats.tokenize(F.col("text"))).alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").alias("tf"))
    tot = toks.agg(F.count("*").alias("n"))
    nll = -F.log(F.col("tf").cast("double") / F.col("n"))
    return (toks.join(freq, "term").crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 exact_avg(nll, 10 ** 7).alias("avg_nll")))


@query(
    "sample_dsir_weights",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({SQL_WORDS}) AS term FROM documents
        ),
        tgt AS (SELECT term, COUNT(*) AS tc FROM toks
                WHERE doc_id % 7 = 0 GROUP BY term),
        src AS (SELECT term, COUNT(*) AS sc FROM toks GROUP BY term),
        scal AS (SELECT COUNT(DISTINCT term) AS v,
                        COUNT(*) AS tot_s,
                        COUNT(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS tot_t
                 FROM toks),
        lr AS (
            SELECT t.doc_id,
                   ln(CAST(COALESCE(g.tc, 0) + 1 AS DOUBLE))
                   + ln(CAST(tot_s + v AS DOUBLE))
                   - ln(CAST(tot_t + v AS DOUBLE))
                   - ln(CAST(s.sc + 1 AS DOUBLE)) AS lg
            FROM toks t
            JOIN src s USING (term)
            LEFT JOIN tgt g USING (term)
            CROSS JOIN scal
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               {{AVG_LR}} AS avg_log_ratio,
               ({{AVG_LR}} > 0.0) AS target_like
        FROM lr GROUP BY doc_id
    """.format(AVG_LR=sql_avg("lg", 10 ** 7)),
    category="extension: curation (DSIR importance weights)",
    doc="DSIR-style importance weighting (Xie et al. 2023, 'Data "
        "Selection for Language Models via Importance Resampling'): "
        "documents scored by mean log ratio of target-domain vs source "
        "unigram probabilities (Laplace-smoothed; the doc_id%7 subset "
        "plays the target domain) — the data-selection signal used to "
        "upweight wiki-like text in a 100 TB crawl. Both language models "
        "are one aggregation each; the ratio is a single double "
        "division in identical op order on both engines, and the per-doc "
        "mean is fixed-point exact so token order cannot flip a weight. "
        "target_like flags docs whose distribution leans toward the "
        "target (avg log ratio > 0).",
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.plans.exact import exact_avg
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(textstats.tokenize(F.col("text"))).alias("term"))
    tgt = (toks.filter(F.col("doc_id") % 7 == 0)
           .groupBy("term").agg(F.count("*").alias("tc")))
    src = toks.groupBy("term").agg(F.count("*").alias("sc"))
    scal = toks.agg(
        F.countDistinct("term").alias("v"),
        F.count("*").alias("tot_s"),
        F.count(F.when(F.col("doc_id") % 7 == 0, 1)).alias("tot_t"))
    # log-SUM form, not ln(product/product): at 100 TB corpus scale the
    # int64 products (tc+1)*(tot_s+v) overflow (~1e13 tokens squared);
    # four ln's of exact-int doubles, summed in fixed left-to-right order,
    # are engine-identical libm ops with no overflow (ADVICE r3).
    lg = (F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double"))
          + F.log((F.col("tot_s") + F.col("v")).cast("double"))
          - F.log((F.col("tot_t") + F.col("v")).cast("double"))
          - F.log((F.col("sc") + 1).cast("double")))
    lr = (toks.join(src, "term").join(tgt, "term", "left")
          .crossJoin(F.broadcast(scal))
          .select("doc_id", lg.alias("lg")))
    avg_lr = exact_avg(F.col("lg"), 10 ** 7)
    return (lr.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 avg_lr.alias("avg_log_ratio"),
                 (avg_lr > 0.0).alias("target_like")))


@query(
    "text_tfidf_topterms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({SQL_WORDS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term) AS rk
            FROM scored
        )
        SELECT doc_id, term, score, rk FROM ranked WHERE rk <= 3
    """,
    category="extension: text analysis (TF-IDF)",
    doc="Top-3 TF-IDF terms per document: explode → tf per (doc, term), "
        "df per term (COUNT DISTINCT), idf = ln(N/df) via a broadcast "
        "1-row N, windowed row_number with a term tiebreak. Scale: the "
        "document-frequency table grows with corpus VOCABULARY, so it is "
        "NOT force-broadcast — both sides already shuffle on `term` for "
        "their aggregations, and AQE picks broadcast only when the built "
        "side actually fits (open-web vocab would OOM a pinned broadcast; "
        "VERDICT r2 #5). The only big shuffles are the two token "
        "aggregations. Determinism: ln of identical int-ratio doubles is "
        "the same libm-correct value on both engines; ties break on the "
        "term string.",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(textstats.tokenize(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term",
                      (F.col("tf") * F.log(F.col("n_docs")
                                           .cast("double") / F.col("df")))
                      .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("doc_id", "term", "score", "rk"))


@query(
    "dedup_cluster_representative",
    oracle=(_sql_shingle_cte(SQL_AUG_NEAR) + """,
        edges AS MATERIALIZED (
            -- MATERIALIZED: the recursive reach re-references edges each
            -- iteration; without the hint DuckDB re-inlines the whole
            -- prefix-join pipeline per iteration (~4x the cost at sf1)
            SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.6
            UNION ALL
            SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.6
        ),
        reach AS (
            SELECT doc_id AS doc, doc_id AS r FROM aug
            UNION
            SELECT reach.doc, e.dst
            FROM reach JOIN edges e ON reach.r = e.src
        ),
        clusters AS (
            SELECT doc AS doc_id, MIN(r) AS cluster_id
            FROM reach GROUP BY doc
        ),
        sized AS (
            SELECT c.cluster_id, a.doc_id, len(a.text) AS n_chars
            FROM clusters c JOIN aug a ON c.doc_id = a.doc_id
        )
        SELECT cluster_id, doc_id AS rep_doc_id, n_chars AS rep_n_chars,
               cluster_size
        FROM (SELECT cluster_id, doc_id, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY cluster_id
                                        ORDER BY n_chars DESC, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY cluster_id)
                         AS cluster_size
              FROM sized) ranked
        WHERE rn = 1
    """).replace("WITH ", "WITH RECURSIVE ", 1),
    category="extension: dedup (cluster representative selection)",
    doc="Canonical-document selection after transitive dedup: per "
        "connected component, keep the longest document (ties → lowest "
        "doc id) — the 'which copy survives' step that turns dedup "
        "clusters into an actual training corpus. Built as clusters → "
        "join docs → per-cluster ROW_NUMBER over (length DESC, id); "
        "the rank and the size share one window partition. Scale: the "
        "only new shuffle beyond clustering is one hash partition by "
        "cluster_id; cluster cardinality ≈ corpus size, and per-cluster "
        "group sizes are tiny (dedup clusters are shallow), so no skew.",
)
def dedup_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    # pinned to the exact generator — the oracle mirrors the prefix graph
    clusters = dedup.dedup_clusters(docs, threshold=0.6, pairs="prefix")
    sized = clusters.join(docs, "doc_id").select(
        "cluster_id", "doc_id", F.length("text").alias("n_chars"))
    w = Window.partitionBy("cluster_id")
    ranked = sized.select(
        "cluster_id", "doc_id", "n_chars",
        F.row_number().over(w.orderBy(F.desc("n_chars"), "doc_id"))
        .alias("rn"),
        F.count("*").over(w).alias("cluster_size"))
    return (ranked.filter(F.col("rn") == 1)
            .select("cluster_id", F.col("doc_id").alias("rep_doc_id"),
                    F.col("n_chars").alias("rep_n_chars"), "cluster_size"))


# ---------------------------------------------------------------------------
# er_multikey_blocking — entity resolution with unioned blocking keys
# ---------------------------------------------------------------------------

ER_BAL_BUCKET = 10.0          # balance-bucket width for blocking key 1
ER_MAX_LEV = 2                # verify: name edit distance threshold
ER_N0 = 1500                  # reference corpus (sf0.01 customer count):
#                               the key-space scale is n // ER_N0, so the
#                               smallest fixture keeps the original blocks


@query(
    "er_multikey_blocking",
    oracle=f"""
        WITH n AS (SELECT GREATEST(1, COUNT(*) // {ER_N0}) AS scale
                   FROM customer),
        c AS (
            SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
                   CAST(floor(c_acctbal * n.scale / {ER_BAL_BUCKET!r})
                        AS BIGINT) AS bal_b,
                   c_mktsegment AS seg,
                   right(c_name,
                         2 + length(CAST(n.scale AS VARCHAR))) AS sfx
            FROM customer, n),
        cand AS (
            SELECT a.k AS a_key, b.k AS b_key, a.nm AS a_name,
                   b.nm AS b_name, 'bal' AS src
            FROM c a JOIN c b
              ON a.nat = b.nat AND a.bal_b = b.bal_b AND a.k < b.k
            UNION ALL
            SELECT a.k, b.k, a.nm, b.nm, 'sfx'
            FROM c a JOIN c b
              ON a.seg = b.seg AND a.sfx = b.sfx AND a.k < b.k),
        pairs AS (
            SELECT a_key, b_key, a_name, b_name,
                   COUNT(DISTINCT src) AS n_blocks
            FROM cand GROUP BY a_key, b_key, a_name, b_name)
        SELECT a_key, b_key, n_blocks,
               levenshtein(a_name, b_name) AS name_lev
        FROM pairs
        WHERE levenshtein(a_name, b_name) <= {ER_MAX_LEV}
    """,
    category="extension: entity resolution (multi-key blocking)",
    doc="Entity resolution with UNIONED blocking keys (the Fellegi-Sunter "
        "blocking stage every record-linkage system runs before pairwise "
        "compare): candidate pairs come from two independent equality "
        "blocks — (nation, balance bucket) and (segment, name suffix) — "
        "so a match missed by one key survives via the other; pairs are "
        "deduped across blocks (n_blocks records multi-key support) and "
        "verified with Levenshtein edit distance on the name. Scale "
        "(VERDICT r8 #6 — the key space now grows with the corpus): "
        "scale = max(1, n // 1500) multiplies the balance-bucket "
        "resolution and extends the name suffix by the decimal digits "
        "of scale, so #blocks ∝ n and per-block size — hence candidates "
        "per entity — stays CONSTANT across sf (the fixed key space "
        "previously measured 60.5x candidates for 10x data at sf10). "
        "The scale derivation is pure integer arithmetic mirrored in "
        "the oracle's scalar subquery, so both engines block "
        "identically at every sf; at the sf0.01 reference corpus "
        "scale=1 reproduces the original blocks. Each block is an "
        "equality self-join (shuffle on the block key, never all-"
        "pairs); verify is JVM-side levenshtein on candidates only.",
)
def er_multikey_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "customer")
    # key-space sizing (one bounded count, mirrored by the oracle's
    # scalar subquery): #blocks ∝ n keeps candidates-per-entity constant
    scale = max(1, base.count() // ER_N0)
    sfx_len = 2 + len(str(scale))
    cust = base.select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") * scale / ER_BAL_BUCKET).cast("long")
            .alias("bal_b"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(f"right(c_name, {sfx_len})").alias("sfx"))

    def block(keys: list, src_bit: int) -> DataFrame:
        a, b = cust.alias("a"), cust.alias("b")
        cond = F.col("a.k") < F.col("b.k")
        for kcol in keys:
            cond &= F.col(f"a.{kcol}") == F.col(f"b.{kcol}")
        return (a.join(b, cond)
                .select(F.col("a.k").alias("a_key"),
                        F.col("b.k").alias("b_key"),
                        F.lit(src_bit).alias("src_bit")))

    # the pair-dedup shuffle carries ONLY fixed-width int keys — names
    # re-attach AFTER the aggregation (names are pair-functional, so
    # n_blocks is unchanged).  No explicit broadcast hint on the name
    # re-attach: the dimension grows with the scale factor, so AQE picks
    # broadcast when it fits and degrades to a shuffle join when it
    # doesn't, instead of failing past the broadcast limit.
    # each source contributes a pair at most once (its block keys are
    # functional per customer), so "COUNT(DISTINCT src)" ≡ popcount of a
    # source bitmask — bit_or partial-aggregates map-side without the
    # distinct-expand doubling countDistinct would pay on the pair stream
    cand = block(["nat", "bal_b"], 1).unionByName(
        block(["seg", "sfx"], 2))
    pairs = (cand.groupBy("a_key", "b_key")
             .agg(F.bit_count(F.bit_or("src_bit")).cast("long")
                  .alias("n_blocks")))
    names = cust.select("k", "nm")
    withnames = (pairs
                 .join(names.withColumnRenamed("k", "a_key")
                       .withColumnRenamed("nm", "a_name"),
                       "a_key")
                 .join(names.withColumnRenamed("k", "b_key")
                       .withColumnRenamed("nm", "b_name"),
                       "b_key"))
    lev = F.levenshtein("a_name", "b_name")
    return (withnames.withColumn("name_lev", lev)
            .filter(F.col("name_lev") <= ER_MAX_LEV)
            .select("a_key", "b_key", "n_blocks", "name_lev"))


# ---------------------------------------------------------------------------
# dedup_minhash_estimate — signature-agreement Jaccard estimator calibration
# ---------------------------------------------------------------------------

@query(
    "dedup_minhash_estimate",
    oracle=f"""
        WITH aug AS ({SQL_AUG_NEAR}),
        docs_w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM aug),
        wcodes AS (
            SELECT doc_id,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= 3
        ),
        codes AS (
            SELECT doc_id, {_sql_shingle_codes('wc')} AS cset FROM wcodes
        ),
        sig_t AS (
            SELECT doc_id AS doc, {_sql_minhash_sig()} AS sig FROM codes
        ),
        bands AS (
            SELECT doc, unnest([{_sql_band_keys()}]) AS band_key,
                   unnest({list(range(1, N_BANDS + 1))}) AS band_idx
            FROM sig_t
        ),
        cand AS (
            SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
            FROM bands x JOIN bands y
              ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc < y.doc
        ),
        scored AS (
            SELECT c.doc_a, c.doc_b,
                   len(list_filter(range({N_MINHASH}),
                       i -> sa.sig[i + 1] = sb.sig[i + 1]))
                       AS n_match_slots,
                   ROUND(CAST(len(list_intersect(ka.cset, kb.cset))
                              AS DOUBLE)
                         / (len(ka.cset) + len(kb.cset)
                            - len(list_intersect(ka.cset, kb.cset))), 6)
                       AS exact_jaccard
            FROM cand c
            JOIN sig_t sa ON sa.doc = c.doc_a
            JOIN sig_t sb ON sb.doc = c.doc_b
            JOIN codes ka ON ka.doc_id = c.doc_a
            JOIN codes kb ON kb.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, n_match_slots,
               CAST(n_match_slots AS DOUBLE) / {N_MINHASH} AS est_jaccard,
               exact_jaccard,
               ROUND(ABS(CAST(n_match_slots AS DOUBLE) / {N_MINHASH}
                         - exact_jaccard), 6) AS abs_err
        FROM scored
    """,
    category="extension: dedup (MinHash estimator calibration)",
    doc="MinHash ESTIMATOR calibration: for every LSH candidate pair, the "
        "Jaccard estimate from signature agreement (matching slots / 16 — "
        "the Broder 1997 unbiased estimator) next to the exact Jaccard "
        "from the full shingle sets, plus the absolute error. This is "
        "how a pipeline decides whether its signature budget (16 hashes) "
        "is adequate before trusting LSH at full scale: std error is "
        "sqrt(J(1-J)/k), and the per-pair audit makes the tail visible. "
        "Scale: candidates come from the band join (never all pairs); "
        "the corpus-sized signature/shingle tables re-attach via plain "
        "shuffle joins on the candidate keys (they grow with the corpus, "
        "so no broadcast). est = n/16 is an exact double; exact_jaccard "
        "rounds at 6 digits — bit-identical on both engines.",
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.operators.dedup import (
        _minhash_sig_arrow, band_keys, shingled_docs,
    )
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    # read three times below (sig, ka, kb); session-scoped cache — the
    # lazily-returned frame means unpersist belongs to the caller, and
    # MEMORY_AND_DISK spills instead of pinning executor memory
    from pyspark import StorageLevel
    base = shingled_docs(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sig = base.select("doc",
                      _minhash_sig_arrow()(F.col("codes")).alias("sig"))
    bands = sig.select(
        "doc",
        F.posexplode(F.array(*band_keys(F.col("sig"))))
            .alias("band_idx", "band_key"))
    cand = (bands.alias("x")
            .join(bands.alias("y"),
                  (F.col("x.band_idx") == F.col("y.band_idx"))
                  & (F.col("x.band_key") == F.col("y.band_key"))
                  & (F.col("x.doc") < F.col("y.doc")))
            .select(F.col("x.doc").alias("doc_a"),
                    F.col("y.doc").alias("doc_b"))
            .distinct())
    sa = sig.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    ka = base.select(F.col("doc").alias("doc_a"), F.col("codes").alias("ca"))
    kb = base.select(F.col("doc").alias("doc_b"), F.col("codes").alias("cb"))
    n_match = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda a, b: (a == b).cast("int")),
        F.lit(0), lambda acc, x: acc + x)
    inter = F.size(F.array_intersect("ca", "cb"))
    scored = (cand.join(sa, "doc_a").join(sb, "doc_b")
              .join(ka, "doc_a").join(kb, "doc_b")
              .withColumn("n_match_slots", n_match)
              .withColumn("exact_jaccard", F.round(
                  inter / (F.size("ca") + F.size("cb") - inter), 6)))
    est = F.col("n_match_slots").cast("double") / N_MINHASH
    return scored.select(
        "doc_a", "doc_b", "n_match_slots",
        est.alias("est_jaccard"), "exact_jaccard",
        F.round(F.abs(est - F.col("exact_jaccard")), 6).alias("abs_err"))


# ---------------------------------------------------------------------------
# neardup_signal_agreement — do the text and embedding detectors agree?
# ---------------------------------------------------------------------------

AGREE_JT = 0.9        # shingle-Jaccard threshold for the text signal
AGREE_CT = 0.9988     # rounded-cosine threshold for the embedding signal

# SQL_WORDS applied to the first-word-dropped twin instead of text
_SQL_WORDS_DROPFIRST = SQL_WORDS.replace(
    "lower(text)", "lower(regexp_replace(text, '^\\w+\\W+', ''))")


@query(
    "neardup_signal_agreement",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {SQL_WORDS} AS wa,
                   {_SQL_WORDS_DROPFIRST} AS wb
            FROM documents
        ),
        wc AS (
            SELECT doc_id,
                   list_transform(wa, w -> {_sql_word_code('w')}) AS ca_w,
                   list_transform(wb, w -> {_sql_word_code('w')}) AS cb_w
            FROM d WHERE len(wa) >= 3 AND len(wb) >= 3
        ),
        txt AS (
            SELECT doc_id,
                   {_sql_shingle_codes('ca_w')} AS ca,
                   {_sql_shingle_codes('cb_w')} AS cb
            FROM wc
        ),
        tj AS (
            SELECT doc_id,
                   CAST(len(list_intersect(ca, cb)) AS DOUBLE)
                       / (len(ca) + len(cb) - len(list_intersect(ca, cb)))
                       AS jaccard
            FROM txt
        ),
        ej AS (
            SELECT vec_id,
                   ROUND({_sql_cos('v', 'b')}, 6) AS cosine
            FROM (
                SELECT vec_id, v, [v[1] + 0.05] || v[2:] AS b
                FROM (SELECT vec_id, {SQL_EMB_D} AS v FROM embeddings)
            )
        ),
        cls AS (
            SELECT t.doc_id, t.jaccard, e.cosine,
                   CASE WHEN t.jaccard >= {AGREE_JT}
                             AND e.cosine >= {AGREE_CT} THEN 'both'
                        WHEN t.jaccard >= {AGREE_JT} THEN 'text_only'
                        WHEN e.cosine >= {AGREE_CT} THEN 'embedding_only'
                        ELSE 'neither' END AS found_by
            FROM tj t JOIN ej e ON t.doc_id = e.vec_id
        )
        SELECT found_by, COUNT(*) AS n_entities,
               ROUND(MIN(jaccard), 6) AS min_jaccard,
               ROUND(MAX(jaccard), 6) AS max_jaccard,
               MIN(cosine) AS min_cosine, MAX(cosine) AS max_cosine
        FROM cls GROUP BY found_by
    """,
    category="extension: dedup (multi-signal agreement audit)",
    doc="Cross-detector calibration: for every base entity, the TEXT "
        "near-dup signal (3-shingle Jaccard between the doc and its "
        "first-word-dropped twin, >= 0.9) and the EMBEDDING signal "
        "(cosine between the vector and its +0.05-bumped twin, rounded "
        "6dp >= 0.9988) are evaluated on the SAME constructed "
        "perturbation, then entities are classed both / text_only / "
        "embedding_only / neither. This is how a pipeline chooses "
        "thresholds before committing to one detector family: the "
        "disagreement classes ARE the calibration signal (the thresholds "
        "here deliberately sit inside each signal's distribution so all "
        "classes are populated). Per-entity signals are single-row "
        "computations — the corpus pass is map-only plus one base-id "
        "equi-join (documents x embeddings) and a 4-group aggregate; no "
        "pair joins at all, so it scales linearly. Jaccard is exact "
        "int-ratio; min/max aggregates of identical doubles are "
        "order-independent (no sums cross the exchange).",
)
def neardup_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import word_code
    from flinkapps_spark.operators.dedup import shingle_codes_of

    docs = load_table(spark, sf_dir, "documents")
    wa = tokenize(F.col("text"))
    wb = tokenize(F.regexp_replace("text", "^\\w+\\W+", ""))
    d = (docs.select("doc_id", wa.alias("wa"), wb.alias("wb"))
         .filter((F.size("wa") >= 3) & (F.size("wb") >= 3)))
    codes = d.select(
        "doc_id",
        shingle_codes_of(F.transform("wa", lambda w: word_code(w)))
            .alias("ca"),
        shingle_codes_of(F.transform("wb", lambda w: word_code(w)))
            .alias("cb"))
    inter = F.size(F.array_intersect("ca", "cb"))
    tj = codes.select(
        "doc_id",
        (inter.cast("double")
         / (F.size("ca") + F.size("cb") - inter)).alias("jaccard"))

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    ed = emb.select("vec_id", v.alias("v"),
                    F.concat(F.array(F.element_at(v, 1) + 0.05),
                             F.slice(v, 2, 10_000)).alias("b"))
    dot = F.aggregate(F.zip_with("v", "b", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    ej = ed.select(
        "vec_id",
        F.round(dot / (nrm(F.col("v")) * nrm(F.col("b"))), 6).alias("cosine"))

    cls = (tj.join(ej, tj.doc_id == ej.vec_id)
           .select("jaccard", "cosine",
                   F.when((F.col("jaccard") >= AGREE_JT)
                          & (F.col("cosine") >= AGREE_CT), "both")
                   .when(F.col("jaccard") >= AGREE_JT, "text_only")
                   .when(F.col("cosine") >= AGREE_CT, "embedding_only")
                   .otherwise("neither").alias("found_by")))
    return (cls.groupBy("found_by")
            .agg(F.count("*").alias("n_entities"),
                 F.round(F.min("jaccard"), 6).alias("min_jaccard"),
                 F.round(F.max("jaccard"), 6).alias("max_jaccard"),
                 F.min("cosine").alias("min_cosine"),
                 F.max("cosine").alias("max_cosine")))


# ---------------------------------------------------------------------------
# knn_ivf_probe_sweep — how many cells must a query probe?
# ---------------------------------------------------------------------------

IVF_SWEEP_PROBES = (1, 2, 4, 16)           # 16 = all cells = exhaustive
IVF_SWEEP_FLOORS = {1: 0.10, 2: 0.15, 4: 0.30, 16: 1.0}


@query(
    "knn_ivf_probe_sweep",
    oracle=f"""
        SELECT p.n_probe, COUNT(*) AS n_queries,
               true AS floor_ok, true AS monotone_ok
        FROM embeddings e CROSS JOIN (
            SELECT unnest([{", ".join(map(str, IVF_SWEEP_PROBES))}])
                AS n_probe) p
        WHERE e.vec_id < 10
        GROUP BY p.n_probe
    """,
    category="extension: similarity (IVF probe-count calibration)",
    doc="The n_probe calibration table for the IVF ANN index: recall@5 "
        "against brute force at 1, 2, 4 and 16 probed cells (of 16). "
        "Cell boundaries are quantizer-specific, so the emitted values "
        "are the deterministic PROPERTIES of the sweep rather than raw "
        "recalls: per-setting floor checks, monotonicity (probe sets "
        "nest under one shared quantizer, so recall can only grow), and "
        "the exhaustive endpoint — probing ALL cells makes the candidate "
        "set identical to brute force and both paths share the "
        "(rounded-cosine, vec_id) ranking, so recall at n_probe=16 is "
        "EXACTLY 1.0, not approximately. This is how a pipeline picks "
        "the latency/recall knee before committing a billion-vector "
        "index. Scale: queries broadcast; the corpus partitions by cell "
        "once per setting; the quantizer is trained ONCE on a bounded "
        "sample and shared across all sweep settings.",
)
def knn_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: one corpus, one brute baseline, four probe settings — the
    # sweep re-reads emb ~10 times un-persisted (guide §1.2)
    emb = load_table(spark, sf_dir, "embeddings").persist()
    emb.count()
    q = emb.filter(F.col("vec_id") < 10)
    brute = similarity.knn_bruteforce(emb, q, k=5) \
        .select("query_id", "vec_id")
    # one quantizer for the whole sweep: probe sets then nest by
    # construction (the monotonicity property) and the index is built
    # once per corpus, not once per setting
    centroids = similarity.train_coarse_centroids(emb)
    per_probe = []
    for p in IVF_SWEEP_PROBES:
        ann = similarity.knn_ivf(emb, q, k=5, n_probe=p,
                                 centroids=centroids) \
            .select("query_id", "vec_id").withColumn("hit", F.lit(1))
        j = brute.join(ann, ["query_id", "vec_id"], "left")
        per_probe.append(j.agg(
            F.lit(p).alias("n_probe"),
            F.countDistinct("query_id").alias("n_queries"),
            (F.sum(F.coalesce(F.col("hit"), F.lit(0)))
             / F.count(F.lit(1))).alias("recall")))
    allp = per_probe[0]
    for df in per_probe[1:]:
        allp = allp.unionByName(df)
    from pyspark.sql import Window as W
    # partition-less window is safe here: the frame is the 4-row sweep
    # summary (one row per n_probe setting), never corpus-sized
    prev = F.lag("recall").over(W.orderBy("n_probe"))
    floor = F.create_map(*[F.lit(x) for kv in IVF_SWEEP_FLOORS.items()
                           for x in kv])
    return (allp.select(
        "n_probe", "n_queries",
        (F.col("recall") >= floor.getItem(F.col("n_probe")))
            .alias("floor_ok"),
        F.coalesce(F.col("recall") >= prev, F.lit(True))
            .alias("monotone_ok")))


# ---------------------------------------------------------------------------
# dedup_lsh_scurve — the banding S-curve for the engine's own LSH constants
# ---------------------------------------------------------------------------

SCURVE_GRID = [round(0.05 * i, 2) for i in range(1, 20)]   # 0.05 .. 0.95
_SCURVE_R = dedup.N_MINHASH // dedup.N_BANDS
_SCURVE_B = dedup.N_BANDS


def _pow_chain_sql(x: str, n: int) -> str:
    """x^n as a left-associated product literal — the same IEEE
    multiply sequence the Spark side builds, so both engines compute
    bit-identical powers for ANY (r, b) without pow()/libm."""
    e = x
    for _ in range(n - 1):
        e = f"({e} * {x})"
    return e


def _pow_chain(col, n: int):
    e = col
    for _ in range(n - 1):
        e = e * col
    return e


@query(
    "dedup_lsh_scurve",
    oracle=f"""
        WITH g AS (
            SELECT CAST(unnest([{", ".join(map(repr, SCURVE_GRID))}])
                        AS DOUBLE) AS jaccard),
        y AS (SELECT jaccard,
                     1.0 - {_pow_chain_sql("jaccard", _SCURVE_R)} AS y1
              FROM g)
        SELECT jaccard,
               {_SCURVE_B} AS n_bands,
               {_SCURVE_R} AS rows_per_band,
               1.0 - {_pow_chain_sql("y1", _SCURVE_B)} AS p_candidate,
               1.0 - {_pow_chain_sql("y1", _SCURVE_B)} >= 0.5
                   AS above_half
        FROM y
    """,
    category="extension: dedup (LSH S-curve calibration)",
    doc="The banding S-curve for the engine's OWN MinHash-LSH "
        "configuration (b=4 bands x r=4 rows, imported from "
        "operators/dedup.py so code and calibration cannot drift): "
        "P(candidate | J) = 1 - (1 - J^r)^b on a 19-point Jaccard grid "
        "— the table a pipeline reads to pick its banding before "
        "trusting LSH at full scale (where the curve crosses 0.5 is the "
        "effective threshold; mass below it at the target J is the "
        "false-negative rate).  Determinism: the powers expand to "
        "left-associated multiplication chains GENERATED from the "
        "imported r and b on both sides (no pow(), no libm) — change "
        "the dedup constants and both curve and oracle follow.  The "
        "grid literals "
        "are CAST to DOUBLE in the oracle (DuckDB types a bare numeric "
        "list DECIMAL, which would silently switch the arithmetic).  "
        "Zero data touched: this is the sketch-parameter audit "
        "complement to dedup_minhash_estimate's per-pair audit.",
)
def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.createDataFrame([(j,) for j in SCURVE_GRID],
                                 "jaccard double")
    y = grid.select(
        "jaccard",
        (F.lit(1.0) - _pow_chain(F.col("jaccard"), _SCURVE_R))
        .alias("y1"))
    p = F.lit(1.0) - _pow_chain(F.col("y1"), _SCURVE_B)
    return y.select(
        "jaccard",
        F.lit(_SCURVE_B).alias("n_bands"),
        F.lit(_SCURVE_R).alias("rows_per_band"),
        p.alias("p_candidate"),
        (p >= 0.5).alias("above_half"))


# ---------------------------------------------------------------------------
# sample_weighted_priority — deterministic weighted sampling w/o replacement
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K = 50
_PRI_HASH_HEX = 10     # 40-bit hash: h/w stays exact in a double


@query(
    "sample_weighted_priority",
    oracle=f"""
        WITH keyed AS (
            SELECT lang, doc_id, n_chars AS weight,
                   CAST(list_reduce(list_transform(string_split(
                       substr(md5(CAST(doc_id AS VARCHAR)), 1,
                              {_PRI_HASH_HEX}), ''),
                       c -> CAST(strpos('0123456789abcdef', c) - 1
                                 AS BIGINT)),
                       (a, b) -> a * 16 + b) AS DOUBLE)
                       / CAST(n_chars AS DOUBLE) AS pri
            FROM documents WHERE n_chars > 0),
        ranked AS (
            SELECT lang, doc_id, weight,
                   CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                           ORDER BY pri, doc_id)
                        AS INT) AS rank
            FROM keyed),
        sample AS (SELECT * FROM ranked
                   WHERE rank <= {PRIORITY_SAMPLE_K}),
        pop AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sw,
                       COUNT(*) AS n FROM documents
                WHERE n_chars > 0 GROUP BY lang),
        samp AS (SELECT lang, CAST(SUM(weight) AS BIGINT) AS sw,
                        COUNT(*) AS n FROM sample GROUP BY lang)
        SELECT s.lang, s.doc_id, s.weight, s.rank,
               samp.sw * pop.n >= pop.sw * samp.n AS bias_ok
        FROM sample s
        JOIN samp ON s.lang = samp.lang
        JOIN pop ON s.lang = pop.lang
    """,
    category="extension: deterministic weighted sampling",
    doc="Weighted sampling WITHOUT replacement per language, fully "
        "deterministic: priority = hash40(doc_id)/weight, keep the "
        "50 smallest per lang (PRIORITY_SAMPLE_K) — uniform-clock "
        "priority sampling with a monotone weight bias: P(a beats b) "
        "grows with w_a/w_b (w_a/(2*w_b) for w_a <= w_b; the EXACT "
        "w/(w_a+w_b) proportionality is what exponential clocks give "
        "and would need ln(), "
        "traded away so the key is ONE IEEE division of a 40-bit "
        "integer by an int — bit-identical on any engine, reruns and "
        "backfills select the same rows).  bias_ok pins the mechanism: "
        "the sample's mean weight beats the population's per lang "
        "(compared by integer cross-multiplication, no float sums).  "
        "Scale: the engine pre-prunes per-PARTITION top-k before the "
        "per-lang rank (global top-k is a subset of the union of local "
        "top-ks, so pruning is lossless), so the lang-keyed shuffle "
        "carries k rows per partition, not the corpus — the two-phase "
        "top-k that survives 5-key skew at 100 TB.",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("n_chars") > 0)
    pri = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                              1, _PRI_HASH_HEX), 16, 10).cast("long")
           .cast("double") / F.col("n_chars").cast("double"))
    keyed = docs.select("lang", "doc_id",
                        F.col("n_chars").alias("weight"),
                        pri.alias("pri"))
    # phase 1: lossless per-partition prune — the global k smallest per
    # lang are necessarily within each partition's k smallest per lang
    lw = W.partitionBy("lang", "pid").orderBy("pri", "doc_id")
    pruned = (keyed.withColumn("pid", F.spark_partition_id())
              .withColumn("lrn", F.row_number().over(lw))
              .filter(F.col("lrn") <= PRIORITY_SAMPLE_K)
              .drop("pid", "lrn"))
    gw = W.partitionBy("lang").orderBy("pri", "doc_id")
    sample = (pruned.withColumn(
        "rank", F.row_number().over(gw).cast("int"))
        .filter(F.col("rank") <= PRIORITY_SAMPLE_K))
    pop = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("psw"),
        F.count("*").alias("pn"))
    samp = sample.groupBy("lang").agg(
        F.sum("weight").cast("long").alias("ssw"),
        F.count("*").alias("sn"))
    return (sample.join(samp, "lang").join(pop, "lang")
            .select("lang", "doc_id", "weight", "rank",
                    (F.col("ssw") * F.col("pn")
                     >= F.col("psw") * F.col("sn")).alias("bias_ok")))


# ---------------------------------------------------------------------------
# sample_group_holdout — leakage-safe train/test split by group hash
# ---------------------------------------------------------------------------

HOLDOUT_BUCKETS = 10   # hash buckets over the group key
HOLDOUT_TRAIN = 8      # buckets [0, 8) -> train, [8, 10) -> test


@query(
    "sample_group_holdout",
    oracle=f"""
        WITH coded AS (
            SELECT doc_id, lang, source,
                   CASE WHEN {_sql_word_code('source')} % {HOLDOUT_BUCKETS}
                             < {HOLDOUT_TRAIN}
                        THEN 'train' ELSE 'test' END AS split
            FROM documents)
        SELECT split, COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources,
               COUNT(DISTINCT lang) AS n_langs,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM coded GROUP BY split
    """,
    category="extension: deterministic group-holdout split",
    doc="Leakage-safe train/test split: the split is decided by a "
        "deterministic content hash of the GROUP key (source domain), "
        "never per-document, so near-duplicate documents from the same "
        "domain can never straddle the boundary — the standard guard "
        "against train/test contamination that per-row sampling "
        "(sample_hash_stratified) cannot give. Reruns and other engines "
        "reproduce the identical membership (the oracle proves it). "
        "Scale: a stateless map-side hash + one partial-aggregated "
        "shuffle on the 2-value split key; the distinct counts are "
        "bounded by group/lang cardinality.",
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import word_code
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        word_code(F.col("source")) % HOLDOUT_BUCKETS < HOLDOUT_TRAIN,
        F.lit("train")).otherwise(F.lit("test"))
    return (docs.withColumn("split", split)
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("source").alias("n_sources"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.min("doc_id").alias("min_id"),
                 F.max("doc_id").alias("max_id")))


# ---------------------------------------------------------------------------
# embedding_mmr_diversify — maximal marginal relevance re-ranking
# ---------------------------------------------------------------------------

MMR_QUERY_ID = 0
MMR_POOL = 20
MMR_K = 8
MMR_LAM = 0.7
_MMR_OML = 1.0 - MMR_LAM     # 0.30000000000000004 — shared exactly


def _mmr_oracle() -> str:
    """Unrolled greedy MMR (no recursion): pick k is an argmax over the
    remaining pool against the union of picks 1..k-1 — the same 8 fixed
    stages the Spark-side greedy walks (cf. _kmeans_oracle's unrolled
    Lloyd iterations)."""
    # MATERIALIZED throughout: DuckDB inlines plain CTEs, and the pick
    # chain references pool/sims/picks many times — inlined, the corpus
    # cosine scan would re-run per reference (observed: minutes at
    # sf0.01; materialized: milliseconds).
    score1 = f"{MMR_LAM!r} * rel - {_MMR_OML!r} * 0.0"
    parts = [f"""
        emb AS MATERIALIZED (
            SELECT vec_id, {SQL_EMB_D} AS v FROM embeddings),
        q AS MATERIALIZED (
            SELECT v AS qv FROM emb WHERE vec_id = {MMR_QUERY_ID}),
        pool AS MATERIALIZED (
            SELECT vec_id, ROUND({_sql_cos('qv', 'v')}, 6) AS rel, v
            FROM emb, q WHERE vec_id <> {MMR_QUERY_ID}
            ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
        sims AS MATERIALIZED (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND({_sql_cos('a.v', 'b.v')}, 6) AS sim
            FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
        p1 AS MATERIALIZED (
            SELECT vec_id, rel, CAST(1 AS INT) AS rank,
                   {score1} AS mmr_score
            FROM pool ORDER BY {score1} DESC, vec_id LIMIT 1),
        s1 AS MATERIALIZED (SELECT vec_id FROM p1)"""]
    for k in range(2, MMR_K + 1):
        parts.append(f"""
        p{k} AS MATERIALIZED (
            SELECT c.vec_id, c.rel, CAST({k} AS INT) AS rank,
                   {MMR_LAM!r} * c.rel - {_MMR_OML!r} * ms.m AS mmr_score
            FROM pool c
            JOIN (SELECT a, MAX(sim) AS m FROM sims
                  WHERE b IN (SELECT vec_id FROM s{k - 1}) GROUP BY a) ms
              ON ms.a = c.vec_id
            WHERE c.vec_id NOT IN (SELECT vec_id FROM s{k - 1})
            ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        s{k} AS MATERIALIZED (
            SELECT vec_id FROM s{k - 1}
            UNION ALL SELECT vec_id FROM p{k})""")
    union = " UNION ALL ".join(
        f"SELECT rank, vec_id, rel, mmr_score FROM p{k}"
        for k in range(1, MMR_K + 1))
    return "WITH " + ",".join(parts) + "\n" + union


@query(
    "embedding_mmr_diversify",
    oracle=_mmr_oracle(),
    category="extension: diversified retrieval (MMR)",
    doc="Maximal-marginal-relevance re-ranking (Carbonell & Goldstein "
        "1998): the top-20 cosine pool for one query is greedily "
        "re-ranked, each pick maximizing lam*relevance - (1-lam)*max-"
        "similarity-to-already-picked — the standard diversified "
        "retrieval layer over a kNN pool. All similarities are the same "
        "6dp-rounded cosines the kNN family uses, so the greedy walks "
        "identical doubles on both engines (the oracle unrolls the 8 "
        "picks as fixed SQL stages; ties break on vec_id). Scale: the "
        "corpus-sized work is exactly the brute-force kNN scan (swap in "
        "the LSH/IVF variants for the pool at 100 TB); the greedy runs "
        "over a pool-squared frame (400 rows) in one Arrow stage on one "
        "partition — bounded by the re-rank window, not the corpus.",
)
def embedding_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from flinkapps_spark.functions.vectors import cosine_similarity
    from flinkapps_spark.operators.similarity import _as_double

    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") == MMR_QUERY_ID)
         .select(_as_double(F.col("embedding")).alias("qv")))
    # pool carries its vectors through the top-k (knn_bruteforce drops
    # them; re-joining the corpus would add a second corpus scan), and
    # the trailing 1-partition exchange is what both self-join sides
    # reference — AQE reuses it, keeping the corpus scan single.
    scored = (emb.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != MMR_QUERY_ID)
              .select("vec_id",
                      F.round(cosine_similarity(
                          F.col("qv"),
                          _as_double(F.col("embedding"))), 6).alias("rel"),
                      _as_double(F.col("embedding")).alias("v")))
    pool = (scored.orderBy(F.desc("rel"), "vec_id").limit(MMR_POOL)
            .repartition(1))

    # Pairwise pool sims + greedy both happen inside ONE Arrow stage on
    # the 1-partition pool: a Spark-side self-join would put the pool
    # behind an AQE broadcast stage that re-materializes the corpus scan
    # (observed; same failure mode as embedding_covariance's joins).
    # The Python cosine replicates SPARK's one op-for-op: sequential
    # left-fold dot/norms (F.aggregate order) and HALF_UP 6dp rounding
    # on the exact decimal expansion of the double — Decimal(x).quantize
    # == Spark's BigDecimal ROUND semantics, so engine-internal rel vs
    # pool-sim rounding is identical by construction.  vs the DUCKDB
    # oracle the contract is the same one the whole kNN family carries:
    # DuckDB ROUND(x,6) goes through nearbyint(x*1e6) (ties-to-even on
    # the pre-rounded product), which can differ from HALF_UP by 1e-6
    # only when x*1e6 lands exactly on a .5 boundary — a measure-zero
    # event for cosines of the random-float corpus (and any such flip
    # would surface as a hash mismatch in the parity gate, not silently).
    def greedy(batches):
        import math
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")

        def cos6(a, b):
            s, na, nb = 0.0, 0.0, 0.0
            for x, y in zip(a, b):
                s += x * y
            for x in a:
                na += x * x
            for y in b:
                nb += y * y
            c = s / (math.sqrt(na) * math.sqrt(nb))
            return float(Decimal(c).quantize(q6, rounding=ROUND_HALF_UP))

        pdf = pd.concat(list(batches), ignore_index=True)
        if not len(pdf):
            return
        rel = {int(r.vec_id): float(r.rel) for r in pdf.itertuples()}
        vec = {int(r.vec_id): list(r.v) for r in pdf.itertuples()}
        sim = {(i, j): cos6(vec[i], vec[j])
               for i in vec for j in vec if i != j}
        remaining = sorted(rel)
        sel, out = [], []
        for rank in range(1, MMR_K + 1):
            best = None
            for c in remaining:
                ms = max((sim[(c, s)] for s in sel), default=0.0)
                score = MMR_LAM * rel[c] - _MMR_OML * ms
                # max score; ties break on the smaller vec_id (remaining
                # is sorted ascending, so strict > keeps the first)
                if best is None or score > best[0]:
                    best = (score, c)
            score, c = best
            sel.append(c)
            remaining.remove(c)
            out.append((rank, c, rel[c], score))
        yield pd.DataFrame(out, columns=["rank", "vec_id", "rel",
                                         "mmr_score"])

    return pool.mapInPandas(
        greedy, schema="rank int, vec_id bigint, rel double, "
                       "mmr_score double")


# ---------------------------------------------------------------------------
# source_overlap_jaccard — cross-source shingle-overlap matrix
# ---------------------------------------------------------------------------


def _source_overlap_oracle() -> str:
    return f"""
        WITH docs_w AS (
            SELECT doc_id, source, {SQL_WORDS} AS ws FROM documents),
        wcodes AS (
            SELECT source,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= 3),
        codes AS (
            SELECT source, unnest({_sql_shingle_codes('wc')}) AS code
            FROM wcodes),
        sc AS (SELECT DISTINCT source, code FROM codes),
        sizes AS (SELECT source, COUNT(*) AS n_sh FROM sc GROUP BY source),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   COUNT(*) AS n_common
            FROM sc a JOIN sc b
              ON a.code = b.code AND a.source < b.source
            GROUP BY 1, 2)
        SELECT src_a, src_b, n_common,
               sa.n_sh AS n_a, sb.n_sh AS n_b,
               CAST(n_common AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = src_a
        JOIN sizes sb ON sb.source = src_b
    """


@query(
    "source_overlap_jaccard",
    oracle=_source_overlap_oracle(),
    category="extension: curation (cross-source overlap matrix)",
    doc="Pairwise shingle-set Jaccard between SOURCES (domains): which "
        "crawls/feeds duplicate each other — the planning signal for "
        "cross-source dedup order and for dropping a feed that is a "
        "strict subset of another (high containment → its marginal "
        "value is near zero).  Shares the engine-portable poly-31 "
        "3-word shingle codes with the dedup family "
        "(operators/dedup.doc_shingle_table), collapsed to the DISTINCT "
        "(source, code) level before any join.  Scale: the self-join "
        "key is the shingle code and its per-code fan-out is bounded by "
        "C(|sources|, 2) — a function of the SOURCE COUNT, never the "
        "corpus (a shingle present in every one of S sources yields "
        "S(S-1)/2 pair rows, ~190 at S=20); one partial-agg shuffle "
        "aggregates pair intersections and the S-row size table "
        "broadcasts.  Jaccard is one double division of exact int64 "
        "counts — engine-identical unrounded.",
)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.operators.dedup import doc_shingle_table

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingle_table(docs)
    src = docs.select(F.col("doc_id").alias("doc"), "source")
    # Round-9 restructure (guide §1.2 + §2.3, same shape as the basket
    # rewrite of itemset_copurchase_pairs): the old form computed the
    # distinct (source, code) frame THREE times (sizes + both self-join
    # sides — each a full shingle pass + distinct exchange) and paid the
    # code self-join shuffle on top.  ONE collect_set exchange now builds
    # the sorted per-code source set (collect_set folds the distinct into
    # the same shuffle), the frame persists once, and sizes + pair
    # intersections both derive from it — the x<y pair expansion runs in
    # codegen over the ≤|sources| element arrays (the same bounded
    # C(S,2) fan-out as the old join, no shuffle).  Sorted-set pairs
    # (ascending binary string order) == the old src_a < src_b equi-join
    # cut; the oracle keeps the self-join form and results are identical.
    cs = (sh.join(src, "doc")
          .groupBy("code")
          .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
          .persist())
    cs.count()  # materialize once for the two downstream uses
    sizes = (cs.select(F.explode("srcs").alias("source"))
             .groupBy("source").agg(F.count(F.lit(1)).alias("n_sh")))
    pair_arr = F.flatten(F.transform(
        F.col("srcs"),
        lambda x, i: F.transform(
            F.slice(F.col("srcs"), i + F.lit(2), F.size("srcs")),
            lambda y: F.struct(x.alias("src_a"), y.alias("src_b")))))
    inter = (cs.select(F.explode(pair_arr).alias("p"))
             .select("p.src_a", "p.src_b")
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("source").alias("src_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(F.broadcast(sa), "src_a")
            .join(F.broadcast(sb), "src_b")
            .select("src_a", "src_b", "n_common", "n_a", "n_b",
                    (F.col("n_common").cast("double")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
                    .alias("jaccard")))
