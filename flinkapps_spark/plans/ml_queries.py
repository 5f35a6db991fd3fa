"""ML-adjacent pipeline queries: iterative clustering, model-based quality
scoring, mergeable quantile sketches, sequence smoothing, and BPE merge
learning — the "train a small model / summarize a distribution over the
corpus" operations a training-data pipeline runs beside dedup and
filtering.

Beyond-reference extensions (the reference engine has nothing in this
family); every query keeps the SCALE.md float-determinism discipline:
fixed-point int64 where sums cross an exchange, and otherwise only IEEE
ops applied in the same order on both engines so the unrounded doubles
are bit-identical.

Driver-side model state: k-means centroids (k x dim ints) and BPE merge
rules (3 tiny rows) are collected to the driver between iterations — the
same shape MLlib uses internally (treeAggregate to the driver per Lloyd
step).  The DATA never leaves the executors; only the model does.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.functions.text import HASH_MOD, tokenize, word_code
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import (
    sql_units, units_col, units_scalar,
)
from flinkapps_spark.plans.pipeline_queries import SQL_WORDS, _sql_word_code
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# k-means (Lloyd) — integer-exact, deterministic
# ---------------------------------------------------------------------------

KM_K = 8                  # clusters
KM_ITERS = 3              # Lloyd assignment rounds
KM_SCALE = 10 ** 6        # fixed-point units per embedding component
KM_DIM = 64               # embeddings fixture dimension

# units formula shared with plans/exact.py (floor/ceil half-away-from-zero);
# inlined here because it runs inside a higher-order lambda on both sides
_SQL_U = (f"CAST(CASE WHEN CAST(x AS DOUBLE) * {KM_SCALE} >= 0 "
          f"THEN floor(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) "
          f"ELSE ceil(CAST(x AS DOUBLE) * {KM_SCALE} - 0.5) END AS BIGINT)")


def _units_arr(vec):
    """array<float> -> array<long> fixed-point units (engine-portable)."""
    def u(x):
        v = x.cast("double") * KM_SCALE
        return (F.when(v >= 0, F.floor(v + 0.5))
                .otherwise(F.ceil(v - 0.5)).cast("long"))
    return F.transform(vec, u)


def _kmeans_oracle() -> str:
    """Generate the unrolled 3-iteration Lloyd SQL (DuckDB)."""
    dims = f"range(1, {KM_DIM + 1})"
    ctes = [f"""
        units AS (
            SELECT vec_id,
                   list_transform(embedding, x -> {_SQL_U}) AS u
            FROM embeddings
        ),
        cents0 AS (
            SELECT CAST(vec_id AS INT) AS j, u FROM units
            WHERE vec_id < {KM_K}
        )"""]
    for i in range(1, KM_ITERS + 1):
        p = i - 1
        ctes.append(f"""
        assign{i} AS (
            SELECT vec_id, j, CAST(d2 AS BIGINT) AS d2 FROM (
                SELECT p.vec_id, c.j,
                       list_sum(list_transform({dims},
                           t -> (p.u[t] - c.u[t]) * (p.u[t] - c.u[t])))
                           AS d2
                FROM units p CROSS JOIN cents{p} c
            )
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d2, j) = 1
        )""")
        if i < KM_ITERS:     # last assignment needs no centroid update
            ctes.append(f"""
        dim{i} AS (
            SELECT a.j, t.d,
                   CAST(floor(CAST(SUM(p.u[t.d]) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS c
            FROM assign{i} a
            JOIN units p USING (vec_id)
            CROSS JOIN (SELECT unnest({dims}) AS d) t
            GROUP BY a.j, t.d
        ),
        newc{i} AS (
            SELECT j, list(c ORDER BY d) AS u FROM dim{i} GROUP BY j
        ),
        cents{i} AS (
            SELECT c0.j, COALESCE(cn.u, c0.u) AS u
            FROM cents{p} c0 LEFT JOIN newc{i} cn USING (j)
        )""")
    body = f"""
        SELECT j AS cluster_id, COUNT(*) AS n_members,
               CAST(SUM(d2) AS DOUBLE) / COUNT(*) / {float(KM_SCALE) ** 2}
                   AS mean_dist2
        FROM assign{KM_ITERS} GROUP BY j
    """
    return "WITH " + ",".join(ctes) + body


@query(
    "kmeans_lloyd",
    oracle=_kmeans_oracle(),
    category="extension: clustering (k-means Lloyd iterations)",
    doc="Deterministic k-means over the embedding corpus: k=8 seeds = the "
        "vectors with vec_id 0..7, 3 Lloyd rounds, squared-L2 in int64 "
        "fixed-point units (1e-6 per component) so assignment argmins and "
        "inertia sums are EXACT on both engines — no float tie ambiguity. "
        "Empty clusters keep their previous centroid; centroid means use "
        "floor(sum/n) in the same op order on both sides. Scale: per "
        "round, centroids (k x 64 ints) broadcast to executors as "
        "literals, assignment is a map-only pass, and the centroid update "
        "is one partial-agg shuffle of (cluster, dim) cells — the classic "
        "distributed Lloyd shape (MLlib does the same via treeAggregate); "
        "only the k x dim model visits the driver, never the data.",
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    emb = load_table(spark, sf_dir, "embeddings")
    # read once per Lloyd round; session-scoped cache (the returned frame
    # is lazy, so unpersist belongs to the caller) — MEMORY_AND_DISK
    # spills instead of pinning executor memory
    pts = emb.select("vec_id", _units_arr(F.col("embedding")).alias("u")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    cents = {int(r["vec_id"]): list(r["u"])
             for r in pts.filter(F.col("vec_id") < KM_K).collect()}

    def assign(centroids: dict[int, list[int]]) -> DataFrame:
        # Arrow/numpy argmin instead of the interpreted k x dim
        # higher-order expression (guide §4.2: the zip_with/aggregate
        # lambda chain evaluated k·dim interpreted calls PER ROW, and the
        # 512-literal tree re-compiled per round).  Exactness: components
        # are fixed-point int64 (|u| ~ 1e6), so (a-b)² ≤ 4e12 and the
        # 64-term sums ≤ 2.6e14 — exact int64 on both paths; np.argmin's
        # first-occurrence tie-break IS array_min over struct(d, j)
        # (min d, then min j).
        import numpy as np
        C = np.asarray([centroids[j] for j in sorted(centroids)],
                       dtype=np.int64)

        def _best(batches):
            for b in batches:
                if len(b) == 0:
                    continue
                X = np.asarray(b["u"].tolist(), dtype=np.int64)
                d = X[:, None, :] - C[None, :, :]
                d2 = (d * d).sum(axis=2)      # (n, k) exact int64
                j = d2.argmin(axis=1)
                b["j"] = j.astype("int32")
                b["d2"] = d2[np.arange(len(j)), j]
                yield b

        return pts.select("vec_id", "u").mapInPandas(
            _best, schema="vec_id bigint, u array<bigint>, j int, d2 long")

    asg = assign(cents)
    for _ in range(KM_ITERS - 1):
        sums = (asg.select("j", F.posexplode("u").alias("pos", "v"))
                .groupBy("j", "pos")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect())
        newc: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            newc.setdefault(r["j"], [0] * KM_DIM)[r["pos"]] = \
                math.floor(r["s"] / r["n"])
            counts[r["j"]] = r["n"]
        cents = {j: newc.get(j, cents[j]) for j in cents}
        asg = assign(cents)

    return (asg.groupBy(F.col("j").alias("cluster_id"))
            .agg(F.count("*").alias("n_members"),
                 (F.sum("d2").cast("double") / F.count("*")
                  / float(KM_SCALE) ** 2).alias("mean_dist2")))


# ---------------------------------------------------------------------------
# hashed-feature linear quality scorer
# ---------------------------------------------------------------------------

QS_BUCKETS = 64           # feature-hash buckets
QS_MIX = 2654435761       # Knuth multiplicative constant -> pseudo-weights
QS_WSCALE = 1000          # weight units per 1.0


def quality_z_expr(ws):
    """int64 weight-sum of the hashed linear quality model over a word
    array — THE model inference expression, shared by
    text_quality_linear and the whole mleval family so the evaluated
    model can never drift from the applied one."""
    return F.aggregate(
        F.transform(ws, lambda w: ((word_code(w) % QS_BUCKETS)
                                   * QS_MIX) % 1001 - 500),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


# DuckDB mirror over a word-list column named ``ws``
SQL_QUALITY_Z = (f"CAST(list_sum([0] || list_transform(ws, "
                 f"w -> (({_sql_word_code('w')} % {QS_BUCKETS}) "
                 f"* {QS_MIX}) % 1001 - 500)) AS BIGINT)")


@query(
    "text_quality_linear",
    oracle=f"""
        WITH t AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
        scored AS (
            SELECT doc_id, len(ws) AS n_tokens,
                   {SQL_QUALITY_Z} AS z_units
            FROM t
        )
        SELECT doc_id, n_tokens, z_units,
               CASE WHEN n_tokens > 0 THEN
                   CAST(z_units AS DOUBLE) / (1000.0 * n_tokens) END
                   AS mean_w,
               CASE WHEN n_tokens = 0 THEN 'empty'
                    WHEN CAST(z_units AS DOUBLE) / (1000.0 * n_tokens)
                         > 0.05 THEN 'high'
                    WHEN CAST(z_units AS DOUBLE) / (1000.0 * n_tokens)
                         >= -0.05 THEN 'mid'
                    ELSE 'low' END AS grade
        FROM scored
    """,
    category="extension: curation (hashed linear quality model)",
    doc="fastText-shaped quality scoring without the learned weights: "
        "tokens hash into 64 buckets (poly-31 code mod 64), each bucket "
        "carries a deterministic pseudo-weight in integer millis "
        "(((bucket * Knuth) mod 1001) - 500), and the document score is "
        "the mean weight — the exact linear-model inference shape (hash, "
        "gather weight, average); swap the weight formula for a trained "
        "vector and nothing else changes. Integer weight sums are exact "
        "on both engines; the mean divides once (bit-identical double). "
        "Scale: pure JVM map over the corpus, zero shuffles, zero Python.",
)
def text_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = tokenize(F.col("text"))
    out = docs.select("doc_id", F.size(ws).alias("n_tokens"),
                      quality_z_expr(ws).alias("z_units"))
    mean_w = F.when(F.col("n_tokens") > 0,
                    F.col("z_units").cast("double")
                    / (F.lit(1000.0) * F.col("n_tokens")))
    return out.select(
        "doc_id", "n_tokens", "z_units", mean_w.alias("mean_w"),
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
         .when(mean_w > 0.05, F.lit("high"))
         .when(mean_w >= -0.05, F.lit("mid"))
         .otherwise(F.lit("low")).alias("grade"))


# ---------------------------------------------------------------------------
# mergeable grid-histogram quantile sketch
# ---------------------------------------------------------------------------

GQ_WIDTH = 4.0            # bin width over events.value (range ~0..490)
GQ_QS = (0.5, 0.9, 0.99)


def grid_quantiles_finalize(hist: DataFrame) -> DataFrame:
    """Read p50/p90/p99 off a merged (event_type, bin, cnt) histogram —
    the sketch-finalization step, shared by the batch partial-merge path
    and the streaming state-store path (stream_grid_quantiles)."""
    wcum = (Window.partitionBy("event_type").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type", "bin", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
        F.count("*").over(wall).alias("n_bins"))
    qs = F.explode(F.array(*[F.lit(q) for q in GQ_QS])).alias("q")
    hit = (cum.select("*", qs)
           .filter(F.col("cum").cast("double") >= F.col("q") * F.col("total"))
           .withColumn("rk", F.row_number().over(
               Window.partitionBy("event_type", "q").orderBy("bin")))
           .filter(F.col("rk") == 1))
    est = (F.col("bin") * GQ_WIDTH + GQ_WIDTH
           * ((F.col("q") * F.col("total")
               - (F.col("cum") - F.col("cnt")).cast("double"))
              / F.col("cnt")))
    return hit.select("event_type", "q", est.alias("estimate"),
                      "total", "n_bins")


GRID_QUANTILES_ORACLE = f"""
        WITH hist AS (
            SELECT event_type,
                   CAST(floor(value / {GQ_WIDTH}) AS BIGINT) AS bin,
                   COUNT(*) AS cnt
            FROM events GROUP BY event_type, bin
        ),
        cum AS (
            SELECT event_type, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS total,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_bins
            FROM hist
        ),
        hit AS (
            SELECT c.event_type, q.q, c.bin, c.cnt, c.cum, c.total, c.n_bins
            FROM cum c CROSS JOIN (
                SELECT CAST(unnest([{", ".join(repr(q) for q in GQ_QS)}])
                            AS DOUBLE) AS q) q
            WHERE CAST(c.cum AS DOUBLE) >= q.q * c.total
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY c.event_type, q.q ORDER BY c.bin) = 1
        )
        SELECT event_type, q,
               bin * {GQ_WIDTH} + {GQ_WIDTH}
                   * ((q * total - CAST(cum - cnt AS DOUBLE)) / cnt)
                   AS estimate,
               CAST(total AS BIGINT) AS total,
               CAST(n_bins AS BIGINT) AS n_bins
        FROM hit
    """


@query(
    "sketch_grid_quantiles",
    oracle=GRID_QUANTILES_ORACLE,
    category="extension: mergeable sketch (grid-histogram quantiles)",
    doc="Fixed-grid histogram quantile sketch: bin = floor(value/4), "
        "p50/p90/p99 read off the cumulative histogram with linear "
        "interpolation inside the hit bin. MERGEABILITY PROOF BY "
        "CONSTRUCTION: the Spark side builds per-(type, hour-of-day) "
        "PARTIAL histograms and merges 24 partials per type by summing "
        "bin counts (the sketch-union operation); the oracle computes the "
        "histogram in one direct pass — identical results prove the "
        "partial-merge path is lossless, which is what lets 1000 "
        "executors each summarize their shard and union k x bins tiny "
        "maps instead of shuffling raw values. Interpolation divides "
        "exact ints in the same op order on both engines (unrounded "
        "doubles, bit-identical).",
)
def sketch_grid_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binc = F.floor(F.col("value") / GQ_WIDTH).cast("long")
    # partial sketches (one histogram per type x hour-of-day) ...
    part = (ev.groupBy(F.col("event_type"), F.hour("ts").alias("hod"),
                       binc.alias("bin"))
            .agg(F.count("*").alias("pcnt")))
    # ... merged by bin-count addition: the sketch-union operation
    hist = part.groupBy("event_type", "bin").agg(F.sum("pcnt").alias("cnt"))
    return grid_quantiles_finalize(hist)


# ---------------------------------------------------------------------------
# EWMA over the most recent events per key
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.125        # smoothing factor (2^-3: exact double literal)
EWMA_N = 256              # bounded lookback: (1-a)^256 ~ 4e-15 tail weight


@query(
    "events_ewma_recent",
    oracle=f"""
        WITH recent AS (
            SELECT event_type, ts, event_id, value
            FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY event_type
                ORDER BY ts DESC, event_id DESC) <= {EWMA_N}
        ),
        seq AS (
            SELECT event_type,
                   list(value ORDER BY ts, event_id) AS vals
            FROM recent GROUP BY event_type
        )
        SELECT event_type,
               CAST(len(vals) AS BIGINT) AS n_used,
               list_reduce(vals, (acc, x) ->
                   x * {EWMA_ALPHA} + acc * {1 - EWMA_ALPHA}) AS ewma,
               vals[len(vals)] AS last_value
        FROM seq
    """,
    category="extension: time-series (EWMA smoothing)",
    doc="Exponentially-weighted moving average per event_type over the "
        "most recent 256 events (by ts, event_id-tiebroken): s = a*x + "
        "(1-a)*s left-fold with a = 0.125. The 256-event cap bounds "
        "per-key state — the tail weight beyond 256 steps is (7/8)^256 "
        "~ 4e-15, below double resolution, so the truncated definition "
        "IS the operator. Both engines fold the identical IEEE ops in "
        "the identical order (Spark aggregate() vs DuckDB list_reduce, "
        "both seeded with the first element), so the unrounded double is "
        "bit-identical. Scale: top-256-per-key via row_number (one "
        "shuffle on the key), then a k-row result — per-key state never "
        "exceeds 256 values regardless of corpus size.",
)
def events_ewma_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wdesc = Window.partitionBy("event_type") \
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    recent = (ev.withColumn("rn", F.row_number().over(wdesc))
              .filter(F.col("rn") <= EWMA_N))
    seq = (recent.groupBy("event_type")
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("ts").alias("ts"), F.col("event_id").alias("eid"),
               F.col("value").alias("v")))).alias("s")))
    vals = F.transform(F.col("s"), lambda x: x.getField("v"))
    seq = seq.select("event_type", vals.alias("vals"))
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2,
                F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at("vals", 1),
        lambda acc, x: x * EWMA_ALPHA + acc * (1 - EWMA_ALPHA))
    return seq.select(
        "event_type",
        F.size("vals").cast("long").alias("n_used"),
        ewma.alias("ewma"),
        F.element_at("vals", -1).alias("last_value"))


# ---------------------------------------------------------------------------
# BPE merge learning (first 3 merges over the corpus vocabulary)
# ---------------------------------------------------------------------------

BPE_MERGES = 3


def _bpe_learn_ctes() -> list[str]:
    """The merge-learning CTE chain shared by the vocab_bpe_merges and
    bpe_encode oracles: corpus word frequencies, spaced symbol strings,
    and per-round pair counts p{i} / winning merge m{i} / rewritten
    vocab w{i}."""
    ctes = [f"""
        freq AS (
            SELECT word, COUNT(*) AS cnt FROM (
                SELECT unnest({SQL_WORDS}) AS word FROM documents)
            GROUP BY word
        ),
        w0 AS (
            SELECT word, cnt,
                   ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sp
            FROM freq
        )"""]
    for i in range(1, BPE_MERGES + 1):
        p = i - 1
        ctes.append(f"""
        p{i} AS (
            SELECT pr.l AS l, pr.r AS r, CAST(SUM(cnt) AS BIGINT) AS c
            FROM (
                SELECT cnt,
                       unnest(list_transform(range(1, len(t)),
                           k -> {{'l': t[k], 'r': t[k + 1]}})) AS pr
                FROM (SELECT cnt, string_split(trim(sp), ' ') AS t
                      FROM w{p})
            )
            GROUP BY pr.l, pr.r
        ),
        m{i} AS (
            SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1
        )""")
        if i < BPE_MERGES:
            ctes.append(f"""
        w{i} AS (
            SELECT word, cnt,
                   replace(sp,
                       ' ' || (SELECT l FROM m{i}) || ' '
                           || (SELECT r FROM m{i}) || ' ',
                       ' ' || (SELECT l FROM m{i})
                           || (SELECT r FROM m{i}) || ' ') AS sp
            FROM w{p}
        )""")
    return ctes


def _bpe_oracle() -> str:
    unions = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, c AS pair_count FROM m{i}"
        for i in range(1, BPE_MERGES + 1))
    return "WITH " + ",".join(_bpe_learn_ctes()) + unions


def _learn_bpe_merges(spark: SparkSession,
                      sf_dir: str) -> list[tuple[int, str, str, str, int]]:
    """Driver-side BPE merge learning (the model-state loop shared with
    bpe_encode): word-frequency aggregation is the only corpus-sized
    pass; each round counts frequency-weighted adjacent pairs over the
    distinct-word vocabulary and collects ONE winning (l, r, count) row."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))
    # persist + materialize: each merge round's collect re-executed the
    # full lineage from the corpus scan, so the "one corpus-sized pass"
    # the docstring promises actually ran once PER ROUND un-persisted
    # (round-9, guide §1.2); the cached frame is the distinct-word
    # vocabulary — small at any scale
    vocab = freq.select(
        "word", "cnt",
        F.concat(F.lit(" "),
                 F.regexp_replace("word", "(.)", "$1 ")).alias("sp")) \
        .persist()
    vocab.count()

    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(1, BPE_MERGES + 1):
        toks = F.split(F.trim(F.col("sp")), " ")
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda k: F.struct(
                            F.element_at(toks, k).alias("l"),
                            F.element_at(toks, k + 1).alias("r")))
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        top = (vocab.select(F.explode(pairs).alias("pr"), "cnt")
               .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
               .agg(F.sum("cnt").alias("c"))
               .orderBy(F.col("c").desc(), "l", "r")
               .limit(1).collect()[0])
        l, r, c = top["l"], top["r"], int(top["c"])
        merges.append((i, l, r, l + r, c))
        if i < BPE_MERGES:
            vocab = vocab.select(
                "word", "cnt",
                F.replace(F.col("sp"), F.lit(f" {l} {r} "),
                          F.lit(f" {l}{r} ")).alias("sp"))
    return merges


@query(
    "vocab_bpe_merges",
    oracle=_bpe_oracle(),
    category="extension: curation (BPE merge learning)",
    doc="The first 3 byte-pair-encoding merges learned from the corpus "
        "(Sennrich et al. 2016): words space out into symbol sequences, "
        "each round counts corpus-frequency-weighted adjacent symbol "
        "pairs, merges the most frequent pair (ties: lexicographic), and "
        "rewrites the vocabulary — exactly how tokenizer training "
        "bootstraps. Scale: the ONLY corpus-sized pass is the word-"
        "frequency aggregation (one shuffle); merges then iterate on the "
        "distinct-word vocabulary table (mergeable to millions of rows "
        "at 100 TB), and each round's single winning pair — k x 3 "
        "strings of model state — is what visits the driver, mirroring "
        "the k-means centroid pattern. Pair application uses "
        "non-overlapping left-to-right replace on space-delimited symbol "
        "strings, identical semantics on both engines.",
)
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        _learn_bpe_merges(spark, sf_dir),
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long")


# ---------------------------------------------------------------------------
# bpe_encode — APPLY the learned merges to the corpus (VERDICT r5 #5)
# ---------------------------------------------------------------------------


def _bpe_apply_ctes(key_col: str) -> list[str]:
    """Learning chain + merge APPLICATION to the corpus words, keyed by
    ``key_col`` (doc_id for per-doc encode, lang for fertility) — ONE
    definition of the apply semantics for both oracles."""
    ctes = list(_bpe_learn_ctes())
    ctes.append(f"""
        docw AS (
            SELECT {key_col}, unnest({SQL_WORDS}) AS word FROM documents),
        d0 AS (
            SELECT {key_col}, word,
                   ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sp
            FROM docw)""")
    for i in range(1, BPE_MERGES + 1):
        ctes.append(f"""
        d{i} AS (
            SELECT {key_col}, word,
                   replace(sp,
                       ' ' || (SELECT l FROM m{i}) || ' '
                           || (SELECT r FROM m{i}) || ' ',
                       ' ' || (SELECT l FROM m{i})
                           || (SELECT r FROM m{i}) || ' ') AS sp
            FROM d{i - 1}
        )""")
    return ctes


def _bpe_encode_oracle() -> str:
    return "WITH " + ",".join(_bpe_apply_ctes("doc_id")) + f"""
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(word)) AS BIGINT) AS n_chars,
               CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT)
                   AS n_bpe_tokens,
               CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT)
                   / CAST(COUNT(*) AS DOUBLE) AS tokens_per_word,
               CAST(SUM(len(word)) AS BIGINT)
                   / CAST(SUM(len(string_split(trim(sp), ' ')))
                          AS DOUBLE) AS chars_per_token
        FROM d{BPE_MERGES} GROUP BY doc_id
    """


def _bpe_doc_metrics(docs: DataFrame, merges, key_col: str) -> DataFrame:
    """(key_col, w, c, t) per document under the learned merges — the
    ONE Spark-side definition of the literal-replace encode fold, shared
    by bpe_encode and bpe_fertility_by_lang.  Zero-word docs are dropped
    (w > 0), mirroring the oracle's unnest semantics on both consumers."""

    def n_syms(w):
        sp = F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1 "))
        for _, l, r, _m, _c in merges:
            sp = F.replace(sp, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
        return F.size(F.split(F.trim(sp), " ")).cast("long")

    words = tokenize(F.col("text"))
    return (docs.select(
        key_col,
        F.size(words).cast("long").alias("w"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).alias("c"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, x: acc + n_syms(x)).alias("t"))
        .filter(F.col("w") > 0))


@query(
    "bpe_encode",
    oracle=_bpe_encode_oracle(),
    category="extension: curation (BPE encode / tokenizer apply)",
    doc="ENCODE with the learned BPE model: vocab_bpe_merges learns the "
        "merge rules; this query applies them to every document and "
        "reports per-doc token counts plus compression — tokens_per_word "
        "(vs the 1-token-per-word unigram baseline; < 2.0 means the "
        "merges genuinely compress the character stream) and "
        "chars_per_token (the standard tokenizer-quality metric). The "
        "full train-then-encode path a tokenizer pipeline runs. Scale: "
        "learning collects only k winning pairs to the driver (the "
        "k-means model pattern); encoding then embeds those k rules as "
        "LITERAL replace ops inside one higher-order map expression — "
        "space the word, apply k non-overlapping replaces, count "
        "symbols — so the encode pass is a pure JVM-codegen map over "
        "the corpus: NO join against a vocabulary table, NO explode, "
        "NO shuffle (plan-pinned). All counts are exact int64 summed "
        "per doc inside the array fold; the two ratios are single "
        "divisions of those ints — engine-identical doubles.",
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _learn_bpe_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    enc = _bpe_doc_metrics(docs, merges, "doc_id")
    return enc.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("c").alias("n_chars"),
        F.col("t").alias("n_bpe_tokens"),
        (F.col("t") / F.col("w").cast("double")).alias("tokens_per_word"),
        (F.col("c") / F.col("t").cast("double")).alias("chars_per_token"))


# ---------------------------------------------------------------------------
# embedding_covariance — exact d×d covariance via integer Gram partials
# ---------------------------------------------------------------------------

COV_SCALE = 10 ** 6       # fixed-point units per embedding component
COV_DIM = 64              # embeddings fixture dimension

_COV_U = (f"CAST(CASE WHEN CAST(embedding[i + 1] AS DOUBLE) * {COV_SCALE} >= 0 "
          f"THEN floor(CAST(embedding[i + 1] AS DOUBLE) * {COV_SCALE} + 0.5) "
          f"ELSE ceil(CAST(embedding[i + 1] AS DOUBLE) * {COV_SCALE} - 0.5) "
          f"END AS BIGINT)")


@query(
    "embedding_covariance",
    oracle=f"""
        WITH x AS (
            SELECT vec_id, CAST(i AS INTEGER) AS i, {_COV_U} AS xu
            FROM embeddings, (SELECT unnest(range({COV_DIM})) AS i)),
        p AS (
            SELECT a.i AS i, b.i AS j,
                   CAST(SUM(a.xu * b.xu) AS BIGINT) AS sxy
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2),
        s AS (SELECT i, CAST(SUM(xu) AS BIGINT) AS sx FROM x GROUP BY i),
        n AS (SELECT COUNT(*) AS n FROM embeddings)
        SELECT p.i, p.j,
               ((n * (sxy / {float(COV_SCALE) ** 2!r}))
                - (sa.sx / {float(COV_SCALE)!r})
                  * (sb.sx / {float(COV_SCALE)!r}))
               / (CAST(n AS DOUBLE) * n) AS cov
        FROM p
        JOIN s sa ON sa.i = p.i
        JOIN s sb ON sb.i = p.j, n
    """,
    category="extension: covariance / PCA prep",
    doc="Exact upper-triangle covariance matrix of the embedding "
        "corpus — the input to PCA / whitening / Mahalanobis outlier "
        "scoring. Each Arrow batch computes ONE int64 Gram matmul "
        "(xu.T @ xu on fixed-point units — numpy int64 matmul is exact) "
        "plus per-dim sums, emitting d(d+1)/2 + d + 1 partial rows per "
        "batch; the only shuffle carries those tiny partials, never "
        "row-level data, and integer partial sums are mergeable in any "
        "order. cov = (n*Sxy - Sx*Sy)/n² applied as an identical IEEE "
        "sequence on both engines. Scale: shuffle volume is "
        "O(batches × d²), independent of corpus size; d=1024 would emit "
        "~525k partials per batch — still trivial. int64 headroom: "
        "|xu| <= 1e6·max|x| ≈ 5.3e5 here, so Σ(xu·xu) "
        "overflows only past ~3e7 rows per PARTIAL (batches are 10k "
        "rows) and the merged total past ~3e7 total rows at |x|<=0.53 — "
        "drop COV_SCALE to 1e4 for 100 TB corpora (the audit tolerance "
        "is 1e-4 per component). Driver-side state: none.",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    d = COV_DIM

    def gram(batches):
        iu = np.triu_indices(d)
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = arr * COV_SCALE
            xu = np.where(v >= 0, np.floor(v + 0.5),
                          np.ceil(v - 0.5)).astype(np.int64)
            g = xu.T @ xu
            yield pd.concat([
                pd.DataFrame({"i": iu[0].astype("int32"),
                              "j": iu[1].astype("int32"),
                              "s": g[iu]}),
                pd.DataFrame({"i": np.arange(d, dtype="int32"),
                              "j": np.full(d, -1, dtype="int32"),
                              "s": xu.sum(axis=0)}),
                pd.DataFrame({"i": np.array([-1], dtype="int32"),
                              "j": np.array([-1], dtype="int32"),
                              "s": np.array([len(pdf)], dtype="int64")}),
            ])

    m = (emb.mapInPandas(gram, schema="i int, j int, s long")
         .groupBy("i", "j").agg(F.sum("s").alias("s")))

    # Assemble cov from the d²-bounded moment table in ONE partition —
    # joining the sentinel rows back instead would fan the plan into
    # multiple branches, and Spark re-executes the un-reused ones (3
    # full corpus scans observed); this keeps the corpus scan single by
    # construction. 2145 rows at d=64 — bounded by the model, not data.
    scale1, scale2 = float(COV_SCALE), float(COV_SCALE) ** 2

    def assemble(batches):
        pdf = pd.concat(list(batches), ignore_index=True)
        if not len(pdf):
            return
        n = int(pdf.loc[pdf["i"] == -1, "s"].iloc[0])
        sx = dict(zip(pdf.loc[(pdf["j"] == -1) & (pdf["i"] >= 0), "i"],
                      pdf.loc[(pdf["j"] == -1) & (pdf["i"] >= 0), "s"]))
        pairs = pdf[pdf["j"] >= 0]
        cov = [(n * (int(s) / scale2)
                - (int(sx[i]) / scale1) * (int(sx[j]) / scale1))
               / (float(n) * n)
               for i, j, s in zip(pairs["i"], pairs["j"], pairs["s"])]
        yield pd.DataFrame({"i": pairs["i"].to_numpy(),
                            "j": pairs["j"].to_numpy(),
                            "cov": np.asarray(cov, dtype="float64")})

    return m.repartition(1).mapInPandas(
        assemble, schema="i int, j int, cov double")


# ---------------------------------------------------------------------------
# risk_woe_iv — supervised feature binning (weight of evidence)
# ---------------------------------------------------------------------------

WOE_BAND_CENTS = 3_000_000      # 30k-currency price bands
WOE_BANDS = 20


@query(
    "risk_woe_iv",
    oracle=f"""
        WITH b AS (
            SELECT LEAST(CAST(floor(CAST({{U}} AS DOUBLE)
                               / {WOE_BAND_CENTS}.0) AS BIGINT),
                         {WOE_BANDS - 1}) AS band,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS y
            FROM orders),
        g AS (
            SELECT band, CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS n_neg
            FROM b GROUP BY band),
        t AS (
            SELECT band, n_pos, n_neg,
                   CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos,
                   CAST(SUM(n_neg) OVER () AS BIGINT) AS tot_neg
            FROM g)
        SELECT band, n_pos, n_neg,
               CAST({{WOE_U}} AS DOUBLE) / 10000000.0 AS woe,
               (CAST(n_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)
                - CAST(n_neg AS DOUBLE) / CAST(tot_neg AS DOUBLE))
               * (CAST({{WOE_U}} AS DOUBLE) / 10000000.0) AS iv_term
        FROM t WHERE n_pos > 0 AND n_neg > 0
    """.format(
        U=sql_units("o_totalprice", 100),
        WOE_U=sql_units(
            "ln((CAST(n_pos AS DOUBLE) * CAST(tot_neg AS DOUBLE))"
            " / (CAST(n_neg AS DOUBLE) * CAST(tot_pos AS DOUBLE)))",
            10 ** 7)),
    category="extension: supervised feature binning (WOE/IV)",
    doc="Weight-of-evidence / information-value readout — the credit- "
        "scoring feature-screening classic: orders bin into fixed 30k- "
        "currency price bands (value-domain buckets, map-side, never a "
        "global quantile sort), the urgent-priority flag plays the "
        "label, and each band reports WOE = ln(pos_rate/neg_rate) and "
        "its IV contribution. Determinism: WOE's ln takes ONE argument "
        "built from four exact ints in fixed op order, then lands on "
        "the 1e-7 fixed-point grid (Math.log-vs-libm ulp divergence "
        "absorbed, events_user_entropy precedent); iv_term multiplies "
        "that gridded value by an int-derived double in identical "
        "order. Bands empty of either class are excluded (documented; "
        "Laplace-smooth to keep them at real scale). Scale: one "
        "partial-aggregated shuffle to the 20-row band frame; the "
        "global-window totals ride that bounded frame.",
)
def risk_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = F.least(
        F.floor(units_col("o_totalprice", 100).cast("double")
                / F.lit(float(WOE_BAND_CENTS))),
        F.lit(WOE_BANDS - 1))
    y = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    g = (orders.select(band.alias("band"), y.alias("y"))
         .groupBy("band")
         .agg(F.sum("y").alias("n_pos"), F.sum(1 - F.col("y")).alias("n_neg")))
    w_all = Window.partitionBy()
    t = g.select(
        "band", "n_pos", "n_neg",
        F.sum("n_pos").over(w_all).alias("tot_pos"),
        F.sum("n_neg").over(w_all).alias("tot_neg"))
    pos_d = F.col("n_pos").cast("double")
    neg_d = F.col("n_neg").cast("double")
    tp_d = F.col("tot_pos").cast("double")
    tn_d = F.col("tot_neg").cast("double")
    woe = units_col(F.log((pos_d * tn_d) / (neg_d * tp_d)), 10 ** 7) \
        .cast("double") / F.lit(10000000.0)
    return (t.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
            .select("band", "n_pos", "n_neg", woe.alias("woe"),
                    ((pos_d / tp_d - neg_d / tn_d) * woe).alias("iv_term")))


# ---------------------------------------------------------------------------
# embedding_power_iteration — integer-exact dominant eigenvector (PCA dir)
# ---------------------------------------------------------------------------

PI_ITERS = 12             # power-iteration rounds (Gram is PSD -> monotone)
PI_SCALE = 10 ** 6        # fixed-point units for normalized G and v
PI_V0 = 125_000           # units(1/sqrt(64)) — deterministic start vector


def _power_ctes() -> str:
    """Unrolled PI_ITERS-round power iteration (DuckDB CTE chain ending
    at v{{PI_ITERS}}), bit-matching the driver-side integer arithmetic
    in _dominant_eigvec_units.  Every per-round CTE is MATERIALIZED —
    inlined CTEs would re-expand the whole chain at each reference
    (observed: exponential blowup, the query never finished)."""
    ctes = [f"""
        x AS MATERIALIZED (
            SELECT vec_id, CAST(i AS INTEGER) AS i, {_COV_U} AS xu
            FROM embeddings, (SELECT unnest(range({COV_DIM})) AS i)),
        gram AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j,
                   CAST(SUM(a.xu * b.xu) AS BIGINT) AS g
            FROM x a JOIN x b ON a.vec_id = b.vec_id
            GROUP BY 1, 2),
        gmax AS (SELECT CAST(MAX(ABS(g)) AS BIGINT) AS m FROM gram),
        gn AS MATERIALIZED (
            SELECT i, j,
                   {sql_units('(CAST(g AS DOUBLE) / m)', PI_SCALE)} AS gu
            FROM gram, gmax),
        v0 AS (
            SELECT CAST(i AS INTEGER) AS i,
                   CAST({PI_V0} AS BIGINT) AS vu
            FROM (SELECT unnest(range({COV_DIM})) AS i))"""]
    for k in range(1, PI_ITERS + 1):
        ctes.append(f"""
        w{k} AS MATERIALIZED (
            SELECT gn.j AS i,
                   CAST(floor(CAST(CAST(SUM(gn.gu * v.vu) AS BIGINT)
                       AS DOUBLE) / {PI_SCALE}) AS BIGINT) AS wd
            FROM gn JOIN v{k - 1} v ON v.i = gn.i
            GROUP BY gn.j),
        n{k} AS (
            SELECT sqrt(CAST(CAST(SUM(wd * wd) AS BIGINT) AS DOUBLE))
                AS nrm
            FROM w{k}),
        v{k} AS MATERIALIZED (
            SELECT i, {sql_units('(CAST(wd AS DOUBLE) / nrm)', PI_SCALE)} AS vu
            FROM w{k}, n{k})""")
    return ",".join(ctes)


def _dominant_eigvec_units(spark: SparkSession, sf_dir: str) -> list[int]:
    """Spark half of the power iteration: one Arrow corpus pass emits
    the exact int64 full Gram matrix (d^2 partial rows per batch); the
    d x d model collects to the driver (kmeans_lloyd precedent) and the
    12 rounds run in pure-int Python, bit-matching _power_ctes."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    d = COV_DIM

    def gram_full(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = arr * COV_SCALE
            xu = np.where(v >= 0, np.floor(v + 0.5),
                          np.ceil(v - 0.5)).astype(np.int64)
            g = xu.T @ xu
            ii, jj = np.indices((d, d))
            yield pd.DataFrame({"i": ii.ravel().astype("int32"),
                                "j": jj.ravel().astype("int32"),
                                "s": g.ravel()})

    gram = (emb.mapInPandas(gram_full, schema="i int, j int, s long")
            .groupBy("i", "j").agg(F.sum("s").alias("g")))
    g = {(r["i"], r["j"]): int(r["g"]) for r in gram.collect()}
    gmax = max(abs(v) for v in g.values())

    # float(v)/float(gmax), NOT the exact int/int quotient: the oracle
    # casts both operands to DOUBLE before dividing, and the two
    # quotients differ by an ulp once Gram entries pass 2^53
    gu = {ij: units_scalar(float(v) / float(gmax), PI_SCALE)
          for ij, v in g.items()}
    vu = [PI_V0] * d
    for _ in range(PI_ITERS):
        w = [sum(gu[(i, j)] * vu[i] for i in range(d)) for j in range(d)]
        wd = [int(math.floor(float(x) / PI_SCALE)) for x in w]
        nrm = math.sqrt(float(sum(x * x for x in wd)))
        vu = [units_scalar(float(x) / nrm, PI_SCALE) for x in wd]
    return vu


@query(
    "embedding_power_iteration",
    oracle=(f"WITH {_power_ctes()}\n"
            f"        SELECT i, vu, vu / CAST({PI_SCALE} AS DOUBLE) AS v\n"
            f"        FROM v{PI_ITERS}"),
    category="extension: PCA (dominant eigenvector, power iteration)",
    doc="Near-dominant principal direction of the embedding corpus via "
        "12 rounds of power iteration on the (PSD) Gram matrix — the "
        "first step of "
        "PCA/whitening/spectral dedup, done ENTIRELY deterministically: "
        "the Gram matrix is exact int64 (same Arrow batch matmul as "
        "embedding_covariance, full d x d), normalized to 1e-6 units of "
        "its max entry, and each of the 12 rounds is an INTEGER matvec "
        "(sum gu*vu, order-independent), a floor-rescale through an "
        "exactly-representable double (w <= 6.4e13 < 2^53), and one "
        "sqrt+divide applied identically on both engines — so the "
        "eigenvector estimate is bit-identical, no float-summation "
        "ambiguity anywhere. Start vector is the uniform unit vector; "
        "Gram PSD => no sign flip-flop. Convergence is (l2/l1)^k, so "
        "on a near-isotropic corpus 12 rounds give a NEAR-dominant "
        "direction (Rayleigh quotient >= 0.95*l1, pinned by test), "
        "not the exact eigvec — raise PI_ITERS when the spectrum has "
        "a real gap. Scale: the corpus contributes "
        "one Arrow pass emitting d^2 integer partials per batch; the "
        "iteration runs on the d x d model (driver-side ints on Spark, "
        "mirroring kmeans_lloyd's bounded-model-state pattern; unrolled "
        "CTEs on DuckDB) — data never leaves the executors. int64 "
        "headroom: matvec terms <= 64 * 1e6 * 1e6 = 6.4e13; the Gram "
        "partials bound like embedding_covariance (drop COV_SCALE at "
        "1e8+ rows).",
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    vu = _dominant_eigvec_units(spark, sf_dir)
    sdf = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vu)], "i int, vu long")
    return sdf.select("i", "vu",
                      (F.col("vu") / float(PI_SCALE)).alias("v"))


# ---------------------------------------------------------------------------
# embedding_pca_project — corpus projection onto the dominant component
# ---------------------------------------------------------------------------

PROJ_SCALE = COV_SCALE * PI_SCALE      # pu units: xu (1e6) x vu (1e6)
# the projection reuses _units_arr (kmeans' array-units helper), which
# rounds at KM_SCALE — the Gram pass rounds at COV_SCALE; they must stay
# the same constant or the eigvec and the projection disagree silently
# (explicit raise, not assert: survives python -O)
if KM_SCALE != COV_SCALE:
    raise RuntimeError("KM_SCALE must equal COV_SCALE: "
                       "embedding_pca_project rounds xu with _units_arr")


@query(
    "embedding_pca_project",
    oracle=f"""
        WITH {_power_ctes()},
        proj AS (
            SELECT x.vec_id, CAST(SUM(x.xu * v.vu) AS BIGINT) AS pu
            FROM x JOIN v{PI_ITERS} v ON v.i = x.i
            GROUP BY x.vec_id)
        SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(pu) AS BIGINT) / CAST({PROJ_SCALE} AS DOUBLE)
                   / COUNT(*) AS mean_proj,
               CAST(MIN(pu) AS BIGINT) / CAST({PROJ_SCALE} AS DOUBLE)
                   AS min_proj,
               CAST(MAX(pu) AS BIGINT) / CAST({PROJ_SCALE} AS DOUBLE)
                   AS max_proj
        FROM proj JOIN embeddings e USING (vec_id)
        GROUP BY e.label
    """,
    category="extension: PCA (dominant-component projection)",
    doc="Per-label summary of the corpus projected onto the dominant "
        "principal direction from embedding_power_iteration — the "
        "'does the top component separate the classes?' readout that "
        "decides whether PCA-based filtering/whitening is worth "
        "running. The eigenvector (int units, bit-identical to the "
        "oracle's unrolled iteration) broadcasts as 64 literals; each "
        "vector's projection is an INTEGER dot product (xu*vu <= "
        "64 * 5.3e5 * 1e6 ~ 3.4e13, exact), aggregated per label with "
        "min/max exact in units and the mean one fixed-point division "
        "chain (sum/scale/count, the sql_avg op order). Scale: after "
        "the Gram pass (see embedding_power_iteration) this is ONE "
        "map-side JVM pass over the corpus — the dot product runs in "
        "codegen via zip_with/aggregate, no Python — plus one "
        "partial-agg shuffle on the ~10-value label.",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    vu = _dominant_eigvec_units(spark, sf_dir)
    vlit = F.array(*[F.lit(int(v)).cast("long") for v in vu])
    emb = load_table(spark, sf_dir, "embeddings")
    pu = F.aggregate(
        F.zip_with(_units_arr(F.col("embedding")), vlit,
                   lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    per = emb.select("label", pu.alias("pu"))
    return (per.groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.sum("pu").alias("pu_sum"),
                 F.min("pu").alias("pu_min"),
                 F.max("pu").alias("pu_max"))
            .select("label", "n_vecs",
                    (F.col("pu_sum") / float(PROJ_SCALE) / F.col("n_vecs"))
                    .alias("mean_proj"),
                    (F.col("pu_min") / float(PROJ_SCALE)).alias("min_proj"),
                    (F.col("pu_max") / float(PROJ_SCALE)).alias("max_proj")))


# ---------------------------------------------------------------------------
# embedding_outlier_scores — diagonal-Mahalanobis top-k outliers
# ---------------------------------------------------------------------------

OUT_TOPK = 20             # outliers reported
OUT_SCALE = 10 ** 6       # fixed-point units per z^2 term


@query(
    "embedding_outlier_scores",
    oracle=f"""
        WITH x AS MATERIALIZED (
            SELECT vec_id, CAST(i AS INTEGER) AS i, {_COV_U} AS xu
            FROM embeddings, (SELECT unnest(range({COV_DIM})) AS i)),
        st AS (
            SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xu) AS BIGINT) AS sx,
                   CAST(SUM(xu * xu) AS BIGINT) AS sxx
            FROM x GROUP BY i),
        mv AS (
            SELECT i, (sx / {float(COV_SCALE)!r}) / n AS mu,
                   ((n * (sxx / {float(COV_SCALE) ** 2!r}))
                    - (sx / {float(COV_SCALE)!r})
                      * (sx / {float(COV_SCALE)!r}))
                   / (CAST(n AS DOUBLE) * n) AS var
            FROM st),
        term AS (
            SELECT x.vec_id,
                   CASE WHEN mv.var > 0 THEN
                       {sql_units(f"((x.xu / {float(COV_SCALE)!r} - mv.mu)"
                                  f" * (x.xu / {float(COV_SCALE)!r} - mv.mu))"
                                  f" / mv.var", OUT_SCALE)}
                   ELSE 0 END AS tu
            FROM x JOIN mv ON mv.i = x.i),
        score AS (
            SELECT vec_id, CAST(SUM(tu) AS BIGINT) AS su
            FROM term GROUP BY vec_id)
        SELECT s.vec_id, e.label, s.su,
               s.su / CAST({OUT_SCALE} AS DOUBLE) AS score
        FROM score s JOIN embeddings e USING (vec_id)
        QUALIFY ROW_NUMBER() OVER (ORDER BY s.su DESC, s.vec_id)
            <= {OUT_TOPK}
        ORDER BY s.su DESC, s.vec_id
    """,
    category="extension: embedding outlier scoring (diagonal Mahalanobis)",
    doc="Top-20 embedding outliers by the diagonal-Mahalanobis score "
        "sum((x_i - mu_i)^2 / var_i) — the 'weird vectors' triage that "
        "runs before dedup/ANN to catch corrupt or out-of-distribution "
        "embeddings. Per-dim mean/variance derive from exact int64 "
        "sums with embedding_covariance's op order; each z^2 term is "
        "the identical double expression on both engines and the "
        "per-vector SUM is fixed-point (1e-6 units, order-independent); "
        "ties break on vec_id. Scale: the stats pass partial-aggregates "
        "corpus x d cells to a d-row frame; the 64 (mu, var) pairs are "
        "bounded model state (kmeans_lloyd precedent) broadcast back as "
        "LITERALS, so scoring is a map-only codegen pass over intact "
        "arrays — no explode, no corpus shuffle — and top-k is "
        "TakeOrdered. Zero-variance dims contribute 0 by definition.",
)
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xu_arr = _units_arr(F.col("embedding"))
    st = (emb.select(F.posexplode(xu_arr).alias("i", "xu"))
          .groupBy("i")
          .agg(F.count("*").alias("n"), F.sum("xu").alias("sx"),
               F.sum(F.col("xu") * F.col("xu")).alias("sxx"))
          .collect())
    sc1, sc2 = float(COV_SCALE), float(COV_SCALE) ** 2
    mu = [0.0] * COV_DIM
    var = [0.0] * COV_DIM
    for r in st:
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        mu[r["i"]] = (sx / sc1) / n
        var[r["i"]] = ((n * (sxx / sc2)) - (sx / sc1) * (sx / sc1)) \
            / (float(n) * n)
    mu_lit = F.array(*[F.lit(v) for v in mu])
    var_lit = F.array(*[F.lit(v) for v in var])

    def term(x, i):
        m = F.element_at(mu_lit, i + 1)
        v = F.element_at(var_lit, i + 1)
        d = x / sc1 - m
        return F.when(v > 0, units_col(d * d / v, OUT_SCALE)) \
            .otherwise(F.lit(0).cast("long"))

    su = F.aggregate(F.transform(xu_arr, term),
                     F.lit(0).cast("long"), lambda acc, t: acc + t)
    scored = emb.select("vec_id", "label", su.alias("su"))
    return (scored.orderBy(F.col("su").desc(), "vec_id").limit(OUT_TOPK)
            .select("vec_id", "label", "su",
                    (F.col("su") / float(OUT_SCALE)).alias("score")))


# ---------------------------------------------------------------------------
# bpe_fertility_by_lang — per-language tokenizer fertility
# ---------------------------------------------------------------------------


def _bpe_fertility_oracle() -> str:
    return "WITH " + ",".join(_bpe_apply_ctes("lang")) + f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT)
                   AS n_bpe_tokens,
               CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT)
                   / CAST(COUNT(*) AS DOUBLE) AS fertility,
               CAST(SUM(len(word)) AS BIGINT)
                   / CAST(SUM(len(string_split(trim(sp), ' ')))
                          AS DOUBLE) AS chars_per_token
        FROM d{BPE_MERGES} GROUP BY lang
    """


@query(
    "bpe_fertility_by_lang",
    oracle=_bpe_fertility_oracle(),
    category="extension: curation (tokenizer fertility by language)",
    doc="Per-LANGUAGE tokenizer fertility (tokens per word) and "
        "chars-per-token under the corpus-learned BPE merges — the "
        "standard multilingual-tokenizer QA readout: a language whose "
        "fertility is far above the corpus mean is being shattered into "
        "symbols (its text is under-represented in merge training) and "
        "will consume context budget disproportionately.  Same learned "
        "model and literal-replace encode expression as bpe_encode; the "
        "per-doc frame collapses straight to |langs| rows through one "
        "partial-agg shuffle of exact int64 sums, divided once per "
        "ratio — engine-identical doubles.",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _learn_bpe_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _bpe_doc_metrics(docs, merges, "lang")
    return (per_doc.groupBy("lang")
            .agg(F.sum("w").alias("n_words"),
                 F.sum("t").alias("n_bpe_tokens"),
                 (F.sum("t") / F.sum("w").cast("double"))
                 .alias("fertility"),
                 (F.sum("c") / F.sum("t").cast("double"))
                 .alias("chars_per_token")))
