"""Model-evaluation queries: ROC AUC, precision/recall threshold sweep,
and decile gains/lift — the readout side of the quality-model loop.

A training-data pipeline that scores documents (text_quality_linear's
hashed linear model) needs to EVALUATE that scorer against ground truth
before gating the corpus on it.  These queries treat the deterministic
model score s = z_units / (1000 * n_tokens) as the prediction and
``lang = 'en'`` as the binary label, and compute the three standard
readouts entirely in integer arithmetic until one final division.

Beyond-reference extensions (the reference engine has no evaluation
surface); catalog conventions per plans/catalog.py.  The score chain is
IMPORTED from ml_queries/pipeline_queries (same constants on both the
Spark and oracle side), so the evaluated model cannot drift from the
model the curation queries actually apply.

Determinism notes shared by the family:
- the score is one division of exact int64s -> bit-identical double on
  both engines; grouping/ordering by it is therefore exact;
- every count (tp/fp/fn/tn, per-decile positives, AUC pair counts) is
  int64; ratios divide once and are never re-rounded;
- ties in the ranking are broken by doc_id so ranks are a permutation.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.functions.text import tokenize
from flinkapps_spark.operators.prefix import bucket_offsets
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import sql_units, units_col
from flinkapps_spark.plans.ml_queries import SQL_QUALITY_Z, quality_z_expr
from flinkapps_spark.plans.pipeline_queries import SQL_WORDS
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# shared scored frame: (doc_id, pos, n_tokens, z_units, s)
# ---------------------------------------------------------------------------

POS_LANG = "en"           # ground-truth positive class
AUC_BUCKET_INV = 100      # score-bucket width 0.01 over s in ~[-0.5, 0.5]
PR_THRESHOLDS = 9         # grid: thr_millis = -200, -150, ..., +200
N_DECILES = 10


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scored by the text_quality_linear model + binary label.

    Identical arithmetic to ml_queries.text_quality_linear (shared
    tokenize/word_code/QS_* constants); docs with zero tokens carry no
    score and are excluded on both sides.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = tokenize(F.col("text"))
    sc = docs.select(
        "doc_id",
        F.when(F.col("lang") == POS_LANG, 1).otherwise(0).alias("pos"),
        F.size(ws).alias("n_tokens"),
        quality_z_expr(ws).alias("z_units"))
    return (sc.filter(F.col("n_tokens") > 0)
            .withColumn("s", F.col("z_units").cast("double")
                        / (F.lit(1000.0) * F.col("n_tokens"))))


_SQL_SCORED = f"""
        t AS (SELECT doc_id,
                     CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS pos,
                     {SQL_WORDS} AS ws
              FROM documents),
        sc AS (SELECT doc_id, pos, len(ws) AS n_tokens,
                      {SQL_QUALITY_Z} AS z_units
               FROM t),
        scored AS (SELECT doc_id, pos, n_tokens, z_units,
                          CAST(z_units AS DOUBLE) / (1000.0 * n_tokens) AS s
                   FROM sc WHERE n_tokens > 0)
"""


# ---------------------------------------------------------------------------
# ml_auc_roc
# ---------------------------------------------------------------------------


@query(
    "ml_auc_roc",
    oracle=f"""
        WITH {_SQL_SCORED},
        g AS (SELECT s, CAST(SUM(pos) AS BIGINT) AS pos_s,
                     CAST(SUM(1 - pos) AS BIGINT) AS neg_s
              FROM scored GROUP BY s),
        c AS (SELECT pos_s, neg_s,
                     CAST(COALESCE(SUM(neg_s) OVER (
                         ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS cneg_lt
              FROM g),
        n AS (SELECT CAST(SUM(pos_s) AS BIGINT) AS npos,
                     CAST(SUM(neg_s) AS BIGINT) AS nneg
              FROM g)
        SELECT npos, nneg,
               CAST(SUM(pos_s * (2 * cneg_lt + neg_s)) AS BIGINT)
                   AS auc_num2,
               CAST(SUM(pos_s * (2 * cneg_lt + neg_s)) AS BIGINT)
                   / CAST(2 * npos * nneg AS DOUBLE) AS auc
        FROM c, n GROUP BY npos, nneg
    """,
    category="extension: model evaluation (ROC AUC)",
    doc="Exact ROC AUC of the hashed-linear quality score against the "
        "lang='en' label via the rank-sum identity: AUC = P(s_pos > "
        "s_neg) + P(s_pos = s_neg)/2, counted over distinct scores so "
        "ties contribute exactly half. auc_num2 = sum over distinct s "
        "of pos_s*(2*cneg_below + neg_s) is pure int64; AUC divides "
        "once by 2*npos*nneg. Scale: group-by distinct score (bounded "
        "by the score grid, not the corpus), then the cumulative "
        "negative count is the shared TWO-PHASE prefix (0.01-wide score "
        "buckets -> bounded offset frame, wide window partitioned by "
        "bucket) — no single-partition scan over the score grid; "
        "npos/nneg ride the same broadcast offsets frame. int64 "
        "headroom: auc_num2 <= 2*npos*nneg, overflow needs ~3e9 docs "
        "divided near-evenly; past that, stratify or divide counts by "
        "a common power of two. Per the prefix-module AQE note the "
        "bucketed per-score frame is eagerly cached so the corpus "
        "tokenize+score pipeline runs ONCE.",
)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_s = (_scored(spark, sf_dir)
             .groupBy("s")
             .agg(F.sum("pos").alias("pos_s"),
                  F.sum(1 - F.col("pos")).alias("neg_s")))
    bucketed = (per_s
                .withColumn("bkt", F.floor(F.col("s") * AUC_BUCKET_INV))
                .persist(StorageLevel.MEMORY_AND_DISK))
    bucketed.count()
    offs = bucket_offsets(bucketed, "bkt",
                          {"pos": "pos_s", "neg": "neg_s"})
    w_in = (Window.partitionBy("bkt").orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1))
    cum = (bucketed.join(F.broadcast(offs), "bkt")
           .select(F.col("tot_pos").alias("npos"),
                   F.col("tot_neg").alias("nneg"),
                   "pos_s", "neg_s",
                   (F.col("off_neg")
                    + F.coalesce(F.sum("neg_s").over(w_in), F.lit(0)))
                   .alias("cneg_lt")))
    num = (cum.groupBy("npos", "nneg")
           .agg(F.sum(F.col("pos_s")
                      * (2 * F.col("cneg_lt") + F.col("neg_s")))
                .alias("auc_num2")))
    return num.select(
        "npos", "nneg", "auc_num2",
        (F.col("auc_num2")
         / (2 * F.col("npos") * F.col("nneg")).cast("double")).alias("auc"))


# ---------------------------------------------------------------------------
# ml_pr_threshold_sweep
# ---------------------------------------------------------------------------


@query(
    "ml_pr_threshold_sweep",
    oracle=f"""
        WITH {_SQL_SCORED},
        grid AS (SELECT CAST(i * 50 - 200 AS BIGINT) AS thr_millis
                 FROM range({PR_THRESHOLDS}) t(i)),
        cm AS (
            SELECT thr_millis,
                   CAST(SUM(CASE WHEN z_units >= thr_millis * n_tokens
                                 THEN pos ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN z_units >= thr_millis * n_tokens
                                 THEN 1 - pos ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN z_units < thr_millis * n_tokens
                                 THEN pos ELSE 0 END) AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN z_units < thr_millis * n_tokens
                                 THEN 1 - pos ELSE 0 END) AS BIGINT) AS tn
            FROM scored CROSS JOIN grid GROUP BY thr_millis)
        SELECT thr_millis, tp, fp, fn, tn,
               CASE WHEN tp + fp > 0
                    THEN tp / CAST(tp + fp AS DOUBLE) END AS prec,
               CASE WHEN tp + fn > 0
                    THEN tp / CAST(tp + fn AS DOUBLE) END AS rec,
               CASE WHEN 2 * tp + fp + fn > 0
                    THEN 2 * tp / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
        FROM cm
    """,
    category="extension: model evaluation (PR threshold sweep)",
    doc="Confusion matrix + precision/recall/F1 at 9 score thresholds "
        "(-0.20..0.20 step 0.05) — the curve behind choosing the "
        "quality-gate cutoff. The threshold test is EXACT integer "
        "arithmetic: s >= thr  <=>  z_units >= thr_millis * n_tokens "
        "(n_tokens > 0), so no float comparison anywhere. Scale: the "
        "9-row grid broadcast-nested-loop joins the scored corpus "
        "(same shape as stats_bootstrap_ci) and the confusion counts "
        "partial-aggregate map-side — each task emits 9 rows; one "
        "bounded shuffle. Ratios are single int64/double divisions, "
        "NULL when undefined.",
)
def ml_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    grid = (spark.range(PR_THRESHOLDS)
            .select((F.col("id") * 50 - 200).alias("thr_millis")))
    pred = F.col("z_units") >= F.col("thr_millis") * F.col("n_tokens")
    cm = (sc.crossJoin(F.broadcast(grid))
          .groupBy("thr_millis")
          .agg(F.sum(F.when(pred, F.col("pos")).otherwise(0)).alias("tp"),
               F.sum(F.when(pred, 1 - F.col("pos")).otherwise(0)).alias("fp"),
               F.sum(F.when(~pred, F.col("pos")).otherwise(0)).alias("fn"),
               F.sum(F.when(~pred, 1 - F.col("pos")).otherwise(0))
               .alias("tn")))
    return cm.select(
        "thr_millis", "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") > 0,
               F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"))
        .alias("prec"),
        F.when(F.col("tp") + F.col("fn") > 0,
               F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"))
        .alias("rec"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
               2 * F.col("tp")
               / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
               .cast("double")).alias("f1"))


# ---------------------------------------------------------------------------
# ml_gains_deciles
# ---------------------------------------------------------------------------


@query(
    "ml_gains_deciles",
    oracle=f"""
        WITH {_SQL_SCORED},
        ranked AS (
            SELECT pos,
                   ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_total
            FROM scored),
        dec AS (
            SELECT CAST((rn - 1) * {N_DECILES} // n_total AS INT) + 1
                       AS decile,
                   n_total, pos
            FROM ranked),
        per AS (
            SELECT decile, n_total,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(pos) AS BIGINT) AS n_pos
            FROM dec GROUP BY decile, n_total),
        cum AS (
            SELECT decile, n_total, n_docs, n_pos,
                   CAST(SUM(n_pos) OVER (ORDER BY decile
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
                   CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
            FROM per)
        SELECT decile, n_docs, n_pos, cum_pos,
               cum_pos / CAST(tot_pos AS DOUBLE) AS capture_rate,
               (n_pos * n_total)
                   / CAST(n_docs * tot_pos AS DOUBLE) AS lift
        FROM cum
    """,
    category="extension: model evaluation (gains/lift deciles)",
    doc="Decile gains table: corpus ranked by model score descending "
        "(doc_id tiebreak -> a permutation), cut into 10 equal-count "
        "bins by integer arithmetic ((rn-1)*10 div N — NOT ntile, whose "
        "remainder placement is engine-defined), and per decile the "
        "positive capture rate and lift. capture = cum_pos/tot_pos and "
        "lift = (n_pos*N)/(n_docs*tot_pos) are single divisions of "
        "int64 products. Scale: the global rank is the shared TWO-PHASE "
        "prefix (0.01-wide score buckets; per-bucket row_number + "
        "broadcast bucket offsets), so no single-partition sort of the "
        "corpus; the decile aggregation is one bounded shuffle and the "
        "10-row cumulative window is driver-trivial. The scored frame "
        "is cached id+score+label only (per the prefix-module AQE "
        "note: the offsets frame is broadcast, and an uncached corpus "
        "pipeline would re-execute inside that stage).",
)
def ml_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = (_scored(spark, sf_dir)
          .select("doc_id", "pos", "s",
                  # descending score == ascending negated bucket
                  (-F.floor(F.col("s") * AUC_BUCKET_INV)).alias("nbkt"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    sc.count()
    per_bkt = sc.groupBy("nbkt").agg(F.count("*").alias("cnt"))
    offs = bucket_offsets(per_bkt, "nbkt", {"cnt": "cnt"})
    w_in = (Window.partitionBy("nbkt")
            .orderBy(F.col("s").desc(), F.col("doc_id")))
    ranked = (sc.join(F.broadcast(offs), "nbkt")
              .select("pos",
                      (F.col("off_cnt") + F.row_number().over(w_in))
                      .alias("rn"),
                      F.col("tot_cnt").alias("n_total")))
    dec = ranked.select(
        (F.expr(f"CAST((rn - 1) * {N_DECILES} div n_total AS INT)")
         + 1).alias("decile"),
        "n_total", "pos")
    per = (dec.groupBy("decile", "n_total")
           .agg(F.count("*").alias("n_docs"), F.sum("pos").alias("n_pos")))
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0)
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = per.select(
        "decile", "n_total", "n_docs", "n_pos",
        F.sum("n_pos").over(w_cum).alias("cum_pos"),
        F.sum("n_pos").over(w_all).alias("tot_pos"))
    return cum.select(
        "decile", "n_docs", "n_pos", "cum_pos",
        (F.col("cum_pos") / F.col("tot_pos").cast("double"))
        .alias("capture_rate"),
        ((F.col("n_pos") * F.col("n_total"))
         / (F.col("n_docs") * F.col("tot_pos")).cast("double"))
        .alias("lift"))


# ---------------------------------------------------------------------------
# ml_calibration_bins
# ---------------------------------------------------------------------------

CAL_BIN_INV = 20          # 0.05-wide score bins
CAL_SCALE = 10 ** 6       # fixed-point units for the per-bin score sum


@query(
    "ml_calibration_bins",
    oracle=f"""
        WITH {_SQL_SCORED},
        b AS (SELECT CAST(floor(s * {CAL_BIN_INV}) AS BIGINT) AS bin,
                     pos, s
              FROM scored)
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(pos) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
                   AS pos_rate,
               CAST(SUM({sql_units('s', CAL_SCALE)}) AS BIGINT)
                   / CAST({CAL_SCALE} AS DOUBLE) / COUNT(*) AS mean_score
        FROM b GROUP BY bin
    """,
    category="extension: model evaluation (calibration bins)",
    doc="Reliability-diagram bins for the quality scorer: scores bucket "
        "into 0.05-wide bins; each bin reports its observed positive "
        "rate next to its mean score — the calibration readout that "
        "says whether a score of 0.2 actually means '20% more likely "
        "English' before anyone treats it as a probability. Counts are "
        "int64; pos_rate divides once; mean_score is the fixed-point "
        "exact sum (1e-6 units, order-independent) divided by scale "
        "then count — the sql_avg op order. Scale: map-side binning + "
        "ONE partial-aggregated shuffle to a frame bounded by the score "
        "grid (~20 bins), nothing else.",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _scored(spark, sf_dir)
    return (sc.select(F.floor(F.col("s") * CAL_BIN_INV).alias("bin"),
                      "pos", units_col("s", CAL_SCALE).alias("su"))
            .groupBy("bin")
            .agg(F.count("*").alias("n_docs"), F.sum("pos").alias("n_pos"),
                 F.sum("su").alias("su_tot"))
            .select("bin", "n_docs", "n_pos",
                    (F.col("n_pos") / F.col("n_docs").cast("double"))
                    .alias("pos_rate"),
                    (F.col("su_tot") / float(CAL_SCALE) / F.col("n_docs"))
                    .alias("mean_score")))


# ---------------------------------------------------------------------------
# ml_langid_confusion
# ---------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from flinkapps_spark.plans.pipeline_queries import (
        _SQL_LANG_CASE, _SQL_LANG_SCORES,
    )
    return f"""
        WITH t AS (SELECT lang, {SQL_WORDS} AS ws FROM documents),
        s AS (SELECT lang AS labeled_lang, {_SQL_LANG_SCORES} FROM t),
        p AS (SELECT labeled_lang, {_SQL_LANG_CASE} AS predicted_lang
              FROM s),
        c AS (SELECT labeled_lang, predicted_lang,
                     CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM p GROUP BY 1, 2)
        SELECT labeled_lang, predicted_lang, n_docs,
               n_docs / CAST(SUM(n_docs) OVER (
                   PARTITION BY labeled_lang) AS DOUBLE) AS class_share,
               labeled_lang = predicted_lang AS is_correct
        FROM c
    """


@query(
    "ml_langid_confusion",
    oracle=_langid_confusion_oracle(),
    category="extension: model evaluation (language-ID confusion matrix)",
    doc="Confusion matrix of the marker-word language-ID heuristic "
        "(text_langid) against the corpus's lang labels: per (labeled, "
        "predicted) cell the document count and its share of the "
        "labeled class (the row-normalized confusion matrix whose "
        "diagonal is per-class recall). Same scoring chain as "
        "text_langid (shared marker constants), so this evaluates the "
        "classifier the pipeline actually runs. Counts are int64; the "
        "share divides once. Scale: map-side scoring + one "
        "partial-aggregated shuffle to the <= n_langs^2 cell frame; "
        "the share window rides that bounded frame only.",
)
def ml_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.operators import textstats

    docs = load_table(spark, sf_dir, "documents")
    toks = textstats.tokenize(F.col("text"))
    scores = textstats.lang_scores(toks)
    per_doc = docs.select(
        F.col("lang").alias("labeled_lang"),
        textstats.predict_lang(scores).alias("predicted_lang"))
    cells = (per_doc.groupBy("labeled_lang", "predicted_lang")
             .agg(F.count("*").alias("n_docs")))
    w_cls = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang", "predicted_lang", "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w_cls).cast("double"))
        .alias("class_share"),
        (F.col("labeled_lang") == F.col("predicted_lang"))
        .alias("is_correct"))
