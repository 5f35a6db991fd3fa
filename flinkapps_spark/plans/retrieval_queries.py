"""Text-retrieval queries: BM25 ranking over the documents corpus.

Beyond-reference extension (the reference has no retrieval surface; this
is the scoring half of a RAG / hard-negative-mining pipeline over a
100 TB corpus). Catalog conventions: float constants are injected into
the oracle via ``repr()`` so both engines parse the identical double;
per-document scores are fixed-point term sums so term addition order is
immaterial; the top-k order key is the INTEGER units score + doc_id, so
ties cannot destabilize the cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.functions.text import tokenize
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.pipeline_queries import SQL_EMB_D, _sql_cos
from flinkapps_spark.plans.exact import exact_avg, sql_avg, sql_units, units_col
from flinkapps_spark.sources.batch import load_table

# Okapi BM25 (Robertson & Walker 1994; the Lucene `ln(1 + ...)` idf form)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 10 ** 7
BM25_TOPK = 20
Q_TERMS = ("data", "query", "spark")

SQL_WORDS = ("list_filter(string_split_regex(lower(text), '\\W+'), "
             "w -> w <> '')")
_TERMS_SQL = ", ".join(f"'{t}'" for t in Q_TERMS)

# identical op order on both engines; tf/df/dl/n_docs are exact ints,
# avgdl is one double division, idf/dlnorm/contrib are the same libm ops
_SQL_AVGDL = "(CAST(tot AS DOUBLE) / n_docs)"
_SQL_IDF = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
_SQL_DLNORM = (f"(1.0 - {BM25_B!r} + {BM25_B!r} * "
               f"(dl / {_SQL_AVGDL}))")
_SQL_CONTRIB = (f"({_SQL_IDF} * (tf * {BM25_K1 + 1.0!r}) "
                f"/ (tf + {BM25_K1!r} * {_SQL_DLNORM}))")


def _bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 fixed-point score_units for Q_TERMS (the Spark mirror
    of the BM25_CTES oracle chain) — shared by bm25_topk_docs and
    hybrid_rrf_fusion."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    scal = dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("tot"))
    tf = (toks.filter(F.col("term").isin(*Q_TERMS))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    j = (tf.join(F.broadcast(dfreq), "term")
         .join(dl, "doc_id")
         .crossJoin(F.broadcast(scal)))
    avgdl = F.col("tot").cast("double") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    dlnorm = F.lit(1.0) - BM25_B + BM25_B * (F.col("dl") / avgdl)
    contrib = (idf * (F.col("tf") * (BM25_K1 + 1.0))
               / (F.col("tf") + BM25_K1 * dlnorm))
    return (j.groupBy("doc_id")
            .agg(F.sum(units_col(contrib, BM25_SCALE)).alias("score_units"),
                 F.count("*").alias("n_terms_matched")))



# the per-doc BM25 scoring CTE chain, shared by bm25_topk_docs and
# hybrid_rrf_fusion so the two rankings cannot drift
BM25_CTES = f"""toks AS (
            SELECT doc_id, unnest({SQL_WORDS}) AS term FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        scal AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot
                 FROM dl),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        per AS (
            SELECT t.doc_id,
                   CAST(SUM({sql_units(_SQL_CONTRIB, BM25_SCALE)})
                        AS BIGINT) AS score_units,
                   COUNT(*) AS n_terms_matched
            FROM tf t
            JOIN dfreq USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN scal
            GROUP BY t.doc_id
        )"""


@query(
    "bm25_topk_docs",
    oracle=f"""
        WITH {BM25_CTES}
        SELECT doc_id,
               (score_units / CAST({BM25_SCALE} AS DOUBLE)) AS bm25,
               n_terms_matched,
               ROW_NUMBER() OVER (ORDER BY score_units DESC, doc_id) AS rnk
        FROM per
        ORDER BY score_units DESC, doc_id
        LIMIT {BM25_TOPK}
    """,
    category="extension: BM25 retrieval",
    doc="Okapi BM25 top-k document retrieval for a fixed query term set "
        "('data', 'query', 'spark'): corpus df/avgdl statistics + "
        "per-doc tf, scored with the Lucene ln(1+...) idf and k1=1.2 "
        "b=0.75 length normalization. Scale: tokens are filtered to the "
        "query terms BEFORE the tf aggregation (the corpus-wide explode "
        "feeds two partial-aggregated shuffles: per-doc dl and per-(doc,"
        "term) tf); the df table (|Q| rows) and the 1-row corpus scalars "
        "are broadcast; the final top-k is TakeOrderedAndProject (per-"
        "partition heap top-k merged on the driver), never a global "
        "sort. Determinism: per-doc score = integer sum of fixed-point "
        "term units, ranked on (int units DESC, doc_id) — a total order, "
        "so the k-cut is stable on both engines.",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _bm25_per_doc(spark, sf_dir)
    top = per.orderBy(F.col("score_units").desc(), "doc_id").limit(BM25_TOPK)
    return top.select(
        "doc_id",
        (F.col("score_units") / float(BM25_SCALE)).alias("bm25"),
        "n_terms_matched",
        F.row_number().over(
            Window.orderBy(F.col("score_units").desc(), "doc_id"))
        .alias("rnk"))


# ---------------------------------------------------------------------------
# text_bigram_logprob
# ---------------------------------------------------------------------------

NLL2_SCALE = 10 ** 7


@query(
    "text_bigram_logprob",
    oracle=f"""
        WITH wl AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
        idx AS (
            SELECT doc_id, w, unnest(range(2, len(w) + 1)) AS i
            FROM wl WHERE len(w) >= 2
        ),
        bg AS (SELECT doc_id, w[i - 1] AS w1, w[i] AS w2 FROM idx),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
        voc AS (
            SELECT COUNT(DISTINCT term) AS v
            FROM (SELECT unnest(w) AS term FROM wl)
        )
        SELECT doc_id, COUNT(*) AS n_bigrams,
               {{AVG_NLL2}} AS avg_nll2
        FROM bg
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN voc
        GROUP BY doc_id
    """.format(AVG_NLL2=sql_avg(
        "-ln((c2 + 1) / CAST(c1 + v AS DOUBLE))", NLL2_SCALE)),
    category="extension: text analysis (bigram LM score)",
    doc="Bigram language-model quality score — the conditional-"
        "probability sibling of text_unigram_logprob (CCNet-style "
        "perplexity filtering, Wenzek et al. 2020): corpus bigram/"
        "unigram-context counts give add-one-smoothed p(w2|w1) = "
        "(c(w1,w2)+1)/(c(w1.)+V), and each document reports its mean "
        "negative log-probability. Low avg_nll2 = formulaic/repetitive "
        "text; high = incoherent word salad — the bigram signal "
        "separates those even when unigram frequencies look normal. "
        "Scale: bigram extraction is map-side (slice+zip_with, no "
        "shuffle); the count tables shuffle once each and are joined "
        "back WITHOUT forced broadcast (vocabulary-squared grows with "
        "the corpus — AQE decides, same policy as TF-IDF/unigram). "
        "Determinism: p is one exact-int division, ln is the identical "
        "libm op, and the per-doc mean is fixed-point exact so bigram "
        "order cannot flip a bit.",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wl = docs.select("doc_id", tokenize(F.col("text")).alias("w"))
    bg = (wl.select("doc_id", F.explode(F.expr(
              "zip_with(slice(w, 1, greatest(size(w) - 1, 0)), "
              "slice(w, 2, greatest(size(w) - 1, 0)), "
              "(a, b) -> struct(a AS w1, b AS w2))")).alias("p"))
          .select("doc_id", "p.w1", "p.w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    voc = (wl.select(F.explode("w").alias("term"))
           .agg(F.countDistinct("term").alias("v")))
    nll = -F.log((F.col("c2") + 1)
                 / (F.col("c1") + F.col("v")).cast("double"))
    return (bg.join(c2, ["w1", "w2"]).join(c1, ["w1"])
            .crossJoin(F.broadcast(voc))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 exact_avg(nll, NLL2_SCALE).alias("avg_nll2")))


# ---------------------------------------------------------------------------
# text_phrase_search — positional inverted-index phrase matching
# ---------------------------------------------------------------------------

PHRASE = ("hash", "value")   # adjacent-token phrase query


@query(
    "text_phrase_search",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        p AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM w WHERE len(ws) > 1)
        SELECT doc_id, COUNT(*) AS n_occurrences
        FROM p WHERE ws[i] = '{PHRASE[0]}' AND ws[i + 1] = '{PHRASE[1]}'
        GROUP BY doc_id
    """,
    category="extension: retrieval (phrase search)",
    doc="Exact phrase search ('hash value') via a positional inverted "
        "index: tokenize, posexplode to (doc, pos, term) postings, then "
        "equi-join the two terms' posting lists on (doc_id, pos+1) — "
        "the Lucene phrase-query shape expressed relationally. Scale: "
        "the postings for NON-QUERY terms are filtered out before the "
        "join (predicate pushdown under the generate), so the join "
        "touches only the two terms' lists, keyed by (doc, pos) — "
        "uniform, skew-free, and proportional to term frequency, not "
        "corpus size. Single-space split (not \\s+) on both engines so "
        "empty tokens agree bit-for-bit.",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ", -1)).alias("pos", "w"))
    first = (toks.filter(F.col("w") == PHRASE[0])
             .select("doc_id", "pos"))
    second = (toks.filter(F.col("w") == PHRASE[1])
              .select("doc_id", (F.col("pos") - 1).alias("pos")))
    return (first.join(second, ["doc_id", "pos"])
            .groupBy("doc_id").agg(F.count("*").alias("n_occurrences")))


# ---------------------------------------------------------------------------
# hybrid_rrf_fusion — reciprocal-rank fusion of BM25 and embedding cosine
# ---------------------------------------------------------------------------

RRF_K = 60        # the standard RRF dampening constant (Cormack 2009)
RRF_POOL = 20     # candidates taken from each ranker
RRF_TOPK = 10     # fused results returned
RRF_QUERY_VEC = 0  # vec_id whose embedding is the dense query


def _hybrid_oracle() -> str:
    return f"""
        WITH {BM25_CTES},
        bmtop AS (
            SELECT doc_id, score_units FROM per
            ORDER BY score_units DESC, doc_id LIMIT {RRF_POOL}),
        bmr AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score_units DESC,
                                           doc_id) AS INT) AS bm25_rank
            FROM bmtop),
        emb AS (SELECT vec_id, {SQL_EMB_D} AS v FROM embeddings),
        qv AS (SELECT v AS qv FROM emb WHERE vec_id = {RRF_QUERY_VEC}),
        knr AS (
            SELECT vec_id AS doc_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY ROUND({_sql_cos('qv', 'v')}, 6) DESC,
                       vec_id) AS INT) AS cosine_rank
            FROM emb CROSS JOIN qv
            WHERE vec_id <> {RRF_QUERY_VEC}
            QUALIFY cosine_rank <= {RRF_POOL})
        SELECT COALESCE(b.doc_id, k.doc_id) AS doc_id,
               b.bm25_rank, k.cosine_rank,
               COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + b.bm25_rank), 0)
               + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + k.cosine_rank), 0)
                   AS rrf
        FROM bmr b FULL OUTER JOIN knr k ON b.doc_id = k.doc_id
        ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
    """


@query(
    "hybrid_rrf_fusion",
    oracle=_hybrid_oracle(),
    category="extension: retrieval (hybrid search, RRF)",
    doc="Hybrid search: BM25 lexical top-20 (shared scoring chain with "
        "bm25_topk_docs) fused with embedding-cosine top-20 (the exact "
        "knn engine, query = doc 0's vector) by reciprocal-rank fusion "
        "score(d) = sum 1/(60+rank_i) — the standard lexical+dense "
        "combiner in RAG / hard-negative-mining stacks (Cormack et al. "
        "2009). Determinism: both input ranks are integer positions on "
        "total orders (int score units / 6dp-rounded cosine, doc id "
        "tiebreak); the RRF score is a sum of two exact small-integer "
        "reciprocals — the same two IEEE divisions and one addition on "
        "both engines. Scale: each ranker's pool is TakeOrdered top-k; "
        "the fusion joins two 20-row frames — free at any corpus size; "
        "the rankers themselves carry the scale story (partial-agg "
        "BM25, broadcast-query kNN).",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.vectors import cosine_similarity
    from flinkapps_spark.operators import similarity

    per = _bm25_per_doc(spark, sf_dir)
    top = (per.orderBy(F.col("score_units").desc(), "doc_id")
           .limit(RRF_POOL))
    bmr = top.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("score_units").desc(), "doc_id"))
        .alias("bm25_rank"))

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC)
    # score like knn_bruteforce (same cosine, 6dp round, id tiebreak) but
    # take the pool with TakeOrdered — a single-query row_number window
    # would sort the whole corpus in ONE task; orderBy().limit() keeps a
    # per-partition heap and merges k rows on the driver
    qv = q.select(similarity._as_double(F.col("embedding")).alias("qv"))
    scored = (emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
              .crossJoin(F.broadcast(qv))
              .select(F.col("vec_id").alias("doc_id"),
                      F.round(cosine_similarity(
                          F.col("qv"),
                          similarity._as_double(F.col("embedding"))), 6)
                      .alias("cosine")))
    pool = scored.orderBy(F.desc("cosine"), "doc_id").limit(RRF_POOL)
    knr = pool.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("cosine"), "doc_id"))
        .alias("cosine_rank"))

    fused = bmr.join(knr, "doc_id", "full_outer")
    one = F.lit(1).cast("double")
    rrf = (F.coalesce(one / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
           + F.coalesce(one / (F.lit(RRF_K) + F.col("cosine_rank")),
                        F.lit(0.0)))
    return (fused.select("doc_id", "bm25_rank", "cosine_rank",
                         rrf.alias("rrf"))
            .orderBy(F.desc("rrf"), "doc_id").limit(RRF_TOPK))
