"""Curation-stage queries: decontamination, chunking, packing, PII scrub,
plus storage-layout capabilities (partition pruning, bucketed co-located
joins) — the remaining pieces of a production training-data pipeline.

Oracle SQL mirrors the same constants/regexes the Spark operators use, so
both sides share one definition (same pattern as pipeline_queries.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from flinkapps_spark.functions.text import HASH_MOD
from flinkapps_spark.operators import curation
from flinkapps_spark.operators.curation import (
    BOILER_FRAC, BOILER_MIN_DOCS, CHUNK_STRIDE, CHUNK_WINDOW,
    CONTAM_MIN_SHARED, PACK_BUDGET, PII_PATTERNS,
)
from flinkapps_spark.operators.dedup import SHINGLE_BASE
from flinkapps_spark.operators.textstats import STOPWORDS
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import (
    exact_sum, sql_sum, sql_units, units_col,
)
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# shared DuckDB fragments (mirroring functions/text.py + operators/dedup.py)
# ---------------------------------------------------------------------------

SQL_WORDS = ("list_filter(string_split_regex(lower(text), '\\W+'), "
             "w -> w <> '')")

# word-code list via nested lambdas (poly-31 per word, applied in-place)
SQL_WORD_CODES = (
    f"list_transform({SQL_WORDS}, "
    f"w -> list_reduce([CAST(0 AS BIGINT)] || "
    f"list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT)), "
    f"(a, b) -> (a * 31 + b) % {HASH_MOD}))")


def _sql_shingles(wc: str) -> str:
    return (f"list_distinct(list_transform(range(1, len({wc}) - 1), "
            f"i -> ((({wc}[i] * {SHINGLE_BASE} + {wc}[i+1]) % {HASH_MOD}) "
            f"* {SHINGLE_BASE} + {wc}[i+2]) % {HASH_MOD}))")


@query(
    "text_decontaminate",
    oracle=f"""
        WITH wc AS (SELECT doc_id, {SQL_WORD_CODES} AS wcl FROM documents),
        sh AS (SELECT doc_id, unnest({_sql_shingles('wcl')}) AS code
               FROM wc WHERE len(wcl) >= 3),
        bench AS (SELECT DISTINCT code FROM sh WHERE doc_id % 50 = 0),
        hits AS (SELECT sh.doc_id, COUNT(*) AS n_shared
                 FROM sh JOIN bench USING (code) GROUP BY sh.doc_id)
        SELECT d.doc_id,
               COALESCE(h.n_shared, 0) AS n_shared,
               COALESCE(h.n_shared, 0) >= {CONTAM_MIN_SHARED} AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    category="extension: curation (benchmark decontamination)",
    doc="Benchmark decontamination: flag training docs sharing ≥5 distinct "
        "3-word shingles with a 'benchmark' corpus (stand-in: docs with "
        "id%50=0). Scale: the benchmark shingle vocabulary is tiny and "
        "broadcast; the corpus streams through one inverted-index join — "
        "never doc-to-doc comparison. The n-gram-overlap check used before "
        "LLM pre-training runs (e.g. GPT-3 appendix C methodology, from "
        "the public paper).",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return curation.contamination_flags(docs, bench)


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
        WITH wc AS (SELECT doc_id, {SQL_WORD_CODES} AS wcl FROM documents),
        sh AS (SELECT doc_id, unnest({_sql_shingles('wcl')}) AS code
               FROM wc WHERE len(wcl) >= 3),
        freq AS (SELECT code, COUNT(*) AS nd FROM sh GROUP BY code),
        per AS (SELECT sh.doc_id,
                       COUNT(*) AS n_shingles,
                       count_if(f.nd >= {BOILER_MIN_DOCS}) AS n_common
                FROM sh JOIN freq f USING (code) GROUP BY sh.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(p.n_common, 0) AS BIGINT) AS n_common,
               CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN 0.0
                    ELSE CAST(p.n_common AS DOUBLE) / p.n_shingles
               END AS boiler_frac,
               (CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN 0.0
                     ELSE CAST(p.n_common AS DOUBLE) / p.n_shingles
                END) >= {BOILER_FRAC} AS is_boilerplate
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    category="extension: curation (boilerplate detection)",
    doc="Corpus-frequency boilerplate detection: a 3-word shingle seen in "
        "≥3 distinct docs is 'common'; a doc is flagged when ≥15% of its "
        "distinct shingles are common (the C4/RefinedWeb 'repeated across "
        "many pages' filter at shingle granularity). Scale: inverted "
        "index + document-frequency self-join keyed by shingle code — "
        "shuffle hash join (the frequency table grows with the corpus, so "
        "no broadcast), never doc-to-doc. Fixture note: at sf0.1 the tiny "
        "synthetic vocabulary saturates (≈99% of shingles are common, all "
        "docs flag true); at the driver's sf0.01 the flag splits both "
        "ways — the continuous n_common/boiler_frac are non-degenerate at "
        "every sf.",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.boilerplate_flags(docs)


@query(
    "doc_chunk_windows",
    oracle=f"""
        WITH w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
        s AS (SELECT doc_id, ws,
                     unnest(range(0, len(ws), {CHUNK_STRIDE})) AS st
              FROM w WHERE len(ws) > 0)
        SELECT doc_id,
               CAST(st / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(least({CHUNK_WINDOW}, len(ws) - st) AS BIGINT) AS n_words,
               array_to_string(ws[st + 1 : st + {CHUNK_WINDOW}], ' ')
                   AS chunk_text
        FROM s
    """,
    category="extension: curation (document chunking)",
    doc="Overlapping word-window chunking (window 40, stride 20): the "
        "long-document → training-sample splitter. Zero shuffle — "
        "tokenize/sequence/posexplode are all map-side; a 100 TB corpus "
        "chunks at scan speed.",
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.chunk_windows(docs)


@query(
    "pack_sequences_budget",
    oracle=f"""
        WITH t AS (
            SELECT lang, doc_id,
                   CAST(len({SQL_WORDS}) AS BIGINT) AS n_tokens
            FROM documents)
        SELECT lang, doc_id, n_tokens,
               CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang
                                               ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / {float(PACK_BUDGET)}) AS BIGINT)
                   AS pack_id
        FROM t
    """,
    category="extension: curation (sequence packing)",
    doc="Token-budget sequence packing (256/pack): documents map to the "
        "pack where their cumulative offset starts — the 'concatenate and "
        "split every N tokens' packing used to fill training context "
        "windows. Per-language running sums (integer, exact) so the sort "
        "parallelizes across partitions; a global ORDER BY would "
        "serialize at 100 TB.",
)
def pack_sequences_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_sequences(docs)


_SQL_PII_TEXT = ("text || ' contact user' || doc_id || '@example.com or +1-555-' "
                 "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
                 "|| '-110 ip 10.0.' || (doc_id % 256) || '.1'")


def _sql_scrub(expr: str) -> str:
    out = expr
    for pat, repl in PII_PATTERNS:  # identical class-only syntax in RE2
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


@query(
    "text_pii_scrub",
    oracle=f"""
        WITH aug AS (SELECT doc_id, {_SQL_PII_TEXT} AS t FROM documents)
        SELECT doc_id,
               {_sql_scrub('t')} AS scrubbed,
               CAST(len(regexp_extract_all(t, '{PII_PATTERNS[0][0]}'))
                    AS INT) AS n_emails
        FROM aug
    """,
    category="extension: curation (PII scrubbing)",
    doc="PII redaction: synthetic email/phone/IP markers are appended "
        "per-doc (the fixture has no natural PII), then scrubbed with a "
        "chain of portable regexp_replace calls (<EMAIL>/<IP>/<PHONE>). "
        "All codegen'd — regex scrubbing at 100 TB is scan-bound, no "
        "shuffle, no UDF.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-110 ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"))
    aug = docs.select("doc_id", pii_text.alias("t"))
    return aug.select(
        "doc_id",
        curation.scrub_pii(F.col("t")).alias("scrubbed"),
        F.regexp_count("t", F.lit(PII_PATTERNS[0][0])).cast("int")
        .alias("n_emails"))


# ---------------------------------------------------------------------------
# storage-layout capabilities: partition pruning, bucketed co-located join
# ---------------------------------------------------------------------------

_LAYOUT_CACHE: dict[str, str] = {}


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """events written once per (session, sf) as parquet partitioned by
    event_type — the layout that turns a type filter into directory
    pruning instead of a scan."""
    key = f"part:{sf_dir}"
    if key not in _LAYOUT_CACHE:
        out = os.path.join(tempfile.gettempdir(),
                           "flinkapps_layout",
                           sf_dir.strip("/").replace("/", "_"), "events_by_type")
        (load_table(spark, sf_dir, "events")
         .write.mode("overwrite").partitionBy("event_type").parquet(out))
        _LAYOUT_CACHE[key] = out
    return _LAYOUT_CACHE[key]


@query(
    "source_partition_pruning",
    oracle=f"""
        SELECT user_id, COUNT(*) AS n, {sql_sum('value')} AS total
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    """,
    category="extension: storage layout (partition pruning)",
    doc="Hive-style partitioned parquet + partition-pruned read: events "
        "are laid out partitionBy(event_type); the type predicate resolves "
        "to directory pruning (PartitionFilters in the scan, verified in "
        "plan tests) so non-matching partitions are never opened. At "
        "100 TB this is the difference between scanning 1/N of the data "
        "and all of it. Result must equal the unpartitioned oracle.",
)
def source_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n"), exact_sum("value").alias("total"))


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """customer+orders saved as bucketed tables (8 buckets on the join
    key) — pre-shuffled storage so the join needs no exchange."""
    key = f"bucket:{sf_dir}"
    if key not in _LAYOUT_CACHE:
        from flinkapps_spark.sinks.files import write_bucketed
        tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
        cu_t, od_t = f"cust_b_{tag}", f"ord_b_{tag}"
        # a previous PROCESS may have left the managed-table directories
        # behind (the in-memory catalog forgets them, the filesystem
        # doesn't) — saveAsTable refuses to reuse the location
        import shutil
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh = wh.removeprefix("file:")
        for t in (cu_t, od_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        write_bucketed(load_table(spark, sf_dir, "customer")
                       .select("c_custkey", "c_mktsegment"),
                       cu_t, "c_custkey", 8, sort_col="c_custkey")
        write_bucketed(load_table(spark, sf_dir, "orders")
                       .select("o_custkey", "o_totalprice"),
                       od_t, "o_custkey", 8, sort_col="o_custkey")
        _LAYOUT_CACHE[key] = (cu_t, od_t)
    return _LAYOUT_CACHE[key]


@query(
    "join_bucketed_colocated",
    oracle=f"""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               {sql_sum('o_totalprice', 100)} AS total
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    category="extension: storage layout (bucketed join)",
    doc="Bucket-pruned co-located join: customer and orders bucketed 8× on "
        "the join key at write time, so the join consumes matching buckets "
        "directly — NO shuffle exchange on either side (verified in plan "
        "tests). The pre-partitioned-storage pattern that amortizes one "
        "write-time shuffle across every future join at 100 TB.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu_t, od_t = _bucketed_tables(spark, sf_dir)
    cu, od = spark.table(cu_t), spark.table(od_t)
    j = cu.join(od, cu.c_custkey == od.o_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        exact_sum("o_totalprice", 100).alias("total"))


@query(
    "vocab_build",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({SQL_WORDS}) AS token FROM documents)
        SELECT token, COUNT(*) AS term_freq,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM toks
        GROUP BY token
        ORDER BY term_freq DESC, token
        LIMIT 100
    """,
    category="extension: curation (vocabulary build)",
    doc="Tokenizer-vocabulary construction: corpus-wide term frequency + "
        "document frequency, top-100 by count — the first step of "
        "training any BPE/WordPiece vocab. (term_freq DESC, token) is a "
        "total order, so the cut is deterministic on both engines. "
        "Scale: explode is map-side; the groupBy partial-aggregates "
        "per task before one shuffle keyed by token (vocab keys follow a "
        "Zipf law — AQE skew handling covers the head tokens); top-k is "
        "TakeOrderedAndProject, never a full sort.",
)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import tokenize
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.explode(tokenize(F.col("text"))).alias("token"))
    return (toks.groupBy("token")
            .agg(F.count("*").alias("term_freq"),
                 F.countDistinct("doc_id").alias("doc_freq"))
            .orderBy(F.desc("term_freq"), "token").limit(100))


# threshold grid swept by quality_filter_sweep (shared by oracle + Spark)
SWEEP_MIN_TOKENS = (10, 20, 30, 40)
SWEEP_MIN_STOP = (0.0, 0.05, 0.1)


@query(
    "quality_filter_sweep",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   len({SQL_WORDS}) AS n_tokens,
                   CAST(len(list_filter({SQL_WORDS},
                            w -> list_contains({list(STOPWORDS)}, w)))
                        AS DOUBLE)
                       / len({SQL_WORDS}) AS stop_ratio
            FROM documents
            WHERE len({SQL_WORDS}) > 0),
        grid AS (
            SELECT mt.mt AS min_tokens, ms.ms AS min_stop
            FROM (SELECT unnest({list(SWEEP_MIN_TOKENS)}) AS mt) mt,
                 (SELECT CAST(unnest({list(SWEEP_MIN_STOP)}) AS DOUBLE)
                      AS ms) ms)
        SELECT min_tokens, min_stop,
               COUNT(*) FILTER (WHERE n_tokens >= min_tokens
                                  AND stop_ratio >= min_stop) AS n_pass,
               COUNT(*) FILTER (WHERE n_tokens >= min_tokens
                                  AND stop_ratio >= min_stop)
                   / COUNT(*) AS pass_rate
        FROM m CROSS JOIN grid
        GROUP BY min_tokens, min_stop
    """,
    category="extension: curation (quality threshold sweep)",
    doc="Quality-filter threshold sweep: survival count and rate for every "
        "cell of a (min token count × min stopword ratio) grid, in ONE "
        "pass over the corpus — how a pipeline picks its Gopher-style "
        "cut points without re-scanning per candidate threshold. The "
        "per-doc metrics compute once; the 12-cell grid cross-joins as a "
        "broadcast literal; conditional counts use the FILTER/count_if "
        "form (BIGINT on both engines — never a HUGEINT-summing CASE). "
        "Scale: corpus scan → map-side metrics → 12× row replication "
        "only at the aggregation input, partial-agged to 12 rows per "
        "task before the shuffle.",
)
def quality_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import tokenize
    from flinkapps_spark.operators.textstats import STOPWORDS
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    m = (docs
         .select(F.size(toks).alias("n_tokens"),
                 (F.size(F.filter(toks,
                                  lambda t: F.array_contains(stops, t)))
                  .cast("double") / F.size(toks)).alias("stop_ratio"))
         .filter(F.col("n_tokens") > 0))
    grid = spark.createDataFrame(
        [(mt, ms) for mt in SWEEP_MIN_TOKENS for ms in SWEEP_MIN_STOP],
        "min_tokens int, min_stop double")
    passed = (F.col("n_tokens") >= F.col("min_tokens")) \
        & (F.col("stop_ratio") >= F.col("min_stop"))
    return (m.crossJoin(F.broadcast(grid))
            .groupBy("min_tokens", "min_stop")
            .agg(F.count(F.when(passed, 1)).alias("n_pass"),
                 (F.count(F.when(passed, 1)) / F.count("*"))
                 .alias("pass_rate")))


@query(
    "embedding_quantize_int8",
    oracle="""
        WITH e AS (
            SELECT vec_id, pos, CAST(embedding[pos + 1] AS DOUBLE) AS v
            FROM (SELECT vec_id, embedding,
                         unnest(range(len(embedding))) AS pos
                  FROM embeddings)),
        amax AS (
            SELECT pos, MAX(ABS(v)) AS amax FROM e GROUP BY pos),
        q AS (
            SELECT e.pos, amax, v,
                   GREATEST(-127, LEAST(127,
                       CASE WHEN v * (127.0 / amax) >= 0
                            THEN floor(v * (127.0 / amax) + 0.5)
                            ELSE ceil(v * (127.0 / amax) - 0.5) END)) AS qv
            FROM e JOIN amax ON e.pos = amax.pos
            WHERE amax > 0)
        SELECT pos, amax,
               MAX(ABS(v - qv * (amax / 127.0))) AS max_abs_err,
               COUNT(*) AS n_values
        FROM q GROUP BY pos, amax
    """,
    category="extension: curation (embedding int8 quantization)",
    doc="Per-dimension symmetric int8 quantization of the embedding "
        "column with a reconstruction-error audit: scale each dimension "
        "by 127/max|v|, round half-away-from-zero (the engine's shared "
        "floor/ceil form — identical IEEE ops on both engines), clamp to "
        "[-127, 127], and report the worst dequantization error per "
        "dimension. Every aggregate is a MIN/MAX over identical double "
        "sets (order-independent), so parity is exact with no fixed-point "
        "machinery. Scale: two shuffles keyed by dimension index (64 "
        "keys — partial agg collapses each task's contribution first); "
        "the per-dim scale table is 64 rows, broadcast back for the "
        "quantize pass. The storage step for shipping embeddings to an "
        "ANN index at 4× compression.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos", "v"))
    amax = (e.groupBy("pos").agg(F.max(F.abs(F.col("v"))).alias("amax"))
            .filter(F.col("amax") > 0))
    j = e.join(F.broadcast(amax), "pos")
    scaled = F.col("v") * (F.lit(127.0) / F.col("amax"))
    qv = F.greatest(F.lit(-127.0), F.least(F.lit(127.0), F.when(
        scaled >= 0, F.floor(scaled + 0.5)).otherwise(
        F.ceil(scaled - 0.5)).cast("double")))
    err = F.abs(F.col("v") - qv * (F.col("amax") / F.lit(127.0)))
    return (j.select("pos", "amax", err.alias("err"))
            .groupBy("pos", "amax")
            .agg(F.max("err").alias("max_abs_err"),
                 F.count("*").alias("n_values")))


# mixture rebalancing: target corpus share per language (uniform here);
# sampling decisions are content-hashed, rates derived from exact counts
MIX_RATE_SCALE = 10000

# scalar poly-31 code of "lang-<doc_id>" (mirrors functions/text.word_code)
_sql_mix_code = (
    f"list_reduce([CAST(0 AS BIGINT)] || "
    f"list_transform(string_split(d.lang || '-' || "
    f"CAST(d.doc_id AS VARCHAR), ''), c -> CAST(ascii(c) AS BIGINT)), "
    f"(a, b) -> (a * 31 + b) % {HASH_MOD})")


@query(
    "sample_weighted_mixture",
    oracle=f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS n_orig FROM documents GROUP BY lang),
        rates AS (
            SELECT lang, n_orig,
                   LEAST({MIX_RATE_SCALE}, CAST(floor(
                       ({MIX_RATE_SCALE}.0 / (SELECT COUNT(*) FROM counts))
                       * (SELECT SUM(n_orig) FROM counts) / n_orig)
                       AS BIGINT)) AS rate_units
            FROM counts),
        kept AS (
            SELECT d.lang,
                   COUNT(*) FILTER (WHERE
                       {_sql_mix_code} % {MIX_RATE_SCALE} < rate_units)
                       AS n_kept
            FROM documents d JOIN rates USING (lang)
            GROUP BY d.lang)
        SELECT c.lang, c.n_orig, r.rate_units, k.n_kept
        FROM counts c JOIN rates r ON c.lang = r.lang
                      JOIN kept  k ON c.lang = k.lang
    """,
    category="extension: curation (mixture rebalancing)",
    doc="Corpus-mixture rebalancing: derive a per-language sampling rate "
        "from OBSERVED counts vs a uniform target share (downsample "
        "over-represented languages toward equal mixture, capped at "
        "keep-everything), then select rows by deterministic content "
        "hash — the up/down-sampling step that turns a raw crawl into a "
        "target training mixture, reproducible across engines and "
        "reruns (no RNG). Rates are floor'd integer units derived from "
        "exact counts, so both engines compare the same int64s. Scale: "
        "pass 1 is one tiny groupBy(lang); rates broadcast back; pass 2 "
        "is a stateless map-side filter — the pattern works identically "
        "when 'lang' is a 10k-source mixture column.",
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import word_code
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_orig"))
    tot = counts.agg(F.sum("n_orig").alias("n_total"),
                     F.count("*").alias("n_langs"))
    rates = (counts.crossJoin(F.broadcast(tot))
             .select("lang", "n_orig", F.least(
                 F.lit(MIX_RATE_SCALE).cast("long"),
                 F.floor((F.lit(float(MIX_RATE_SCALE)) / F.col("n_langs"))
                         * F.col("n_total") / F.col("n_orig")))
                 .alias("rate_units")))
    bucket = word_code(
        F.concat(F.col("lang"), F.lit("-"),
                 F.col("doc_id").cast("string"))) % MIX_RATE_SCALE
    kept = (docs.join(F.broadcast(rates), "lang")
            .groupBy("lang")
            .agg(F.count(F.when(bucket < F.col("rate_units"), 1))
                 .alias("n_kept")))
    return (counts.join(rates.select("lang", "rate_units"), "lang")
            .join(kept, "lang")
            .select("lang", "n_orig", "rate_units", "n_kept"))


Z_BITS = 8  # bits per dimension interleaved into the Z-value


def _z_interleave_sql(k1: str, k2: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({k1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({k2} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_layout_audit",
    oracle=f"""
        WITH keyed AS (
            SELECT (o_custkey % 256) AS k1,
                   (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                         AS BIGINT) % 256) AS k2
            FROM orders),
        z AS (
            SELECT k1, k2, ({_z_interleave_sql('k1', 'k2')}) AS zval
            FROM keyed)
        SELECT CAST(floor(zval / 4096.0) AS BIGINT) AS file_id,
               COUNT(*) AS n_rows,
               MIN(k1) AS min_k1, MAX(k1) AS max_k1,
               MIN(k2) AS min_k2, MAX(k2) AS max_k2
        FROM z GROUP BY file_id
    """,
    category="extension: storage layout (Z-order clustering)",
    doc="Z-order (Morton) clustering audit: interleave the bits of two "
        "query dimensions (customer, order day) into one sort key, model "
        "file assignment as fixed Z-ranges, and report each file's "
        "min/max on BOTH dimensions — the footer stats a scan would "
        "prune with. Under a linear sort on either key alone the other "
        "key's per-file range spans the whole domain (no skipping); "
        "under the Z-order both ranges stay narrow (each file covers "
        "64 of 256 values on BOTH dims — visible in the audit output "
        "itself), so predicates on EITHER dimension prune most files. Pure integer bit arithmetic — identical on "
        "both engines. Scale: this is the layout pass a 100 TB table "
        "runs once at write time (repartitionByRange on zval + "
        "sortWithinPartitions) to make every later scan cheaper; the "
        "audit itself is one groupBy on the bucketed key.",
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    k1 = (F.col("o_custkey") % 256).alias("k1")
    k2 = (F.datediff(F.col("o_orderdate").cast("date"),
                     F.lit("1970-01-01").cast("date")).cast("long")
          % 256).alias("k2")
    keyed = od.select(k1, k2)
    zval = None
    for i in range(Z_BITS):
        t1 = F.shiftleft(F.shiftright(F.col("k1"), i).bitwiseAND(1), 2 * i)
        t2 = F.shiftleft(F.shiftright(F.col("k2"), i).bitwiseAND(1),
                         2 * i + 1)
        zval = t1 + t2 if zval is None else zval + t1 + t2
    z = keyed.withColumn("zval", zval)
    return (z.groupBy(F.floor(F.col("zval") / 4096).cast("long")
                      .alias("file_id"))
            .agg(F.count("*").alias("n_rows"),
                 F.min("k1").alias("min_k1"), F.max("k1").alias("max_k1"),
                 F.min("k2").alias("min_k2"), F.max("k2").alias("max_k2")))


# ---------------------------------------------------------------------------
# text_line_dedup — line-level exact dedup statistics
# ---------------------------------------------------------------------------

LINE_WORDS = 8            # unit width: fixed 8-word "lines"
LINE_AUG_EVERY = 5        # every 5th doc gets a constructed duplicate copy


@query(
    "text_line_dedup",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
        aug AS (
            SELECT doc_id, ws FROM base
            UNION ALL
            SELECT doc_id + 3000000, list_concat(ws[1:{LINE_WORDS}], ws)
            FROM base
            WHERE doc_id % {LINE_AUG_EVERY} = 0
              AND len(ws) >= {LINE_WORDS}),
        u AS (
            SELECT doc_id,
                   md5(unnest(list_transform(
                       range(len(ws) // {LINE_WORDS}),
                       i -> array_to_string(
                           ws[i * {LINE_WORDS} + 1 : i * {LINE_WORDS}
                              + {LINE_WORDS}], ' ')))) AS h
            FROM aug),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_units,
                   COUNT(DISTINCT h) AS n_distinct_units
            FROM u GROUP BY doc_id),
        dh AS (SELECT DISTINCT doc_id, h FROM u),
        shared AS (SELECT h FROM dh GROUP BY h HAVING COUNT(*) >= 2),
        spd AS (
            SELECT doc_id, COUNT(*) AS n_shared_units
            FROM dh JOIN shared USING (h) GROUP BY doc_id)
        SELECT p.doc_id, p.n_units, p.n_distinct_units,
               COALESCE(s.n_shared_units, 0) AS n_shared_units,
               CAST(p.n_units - p.n_distinct_units AS DOUBLE)
                   / CAST(p.n_units AS DOUBLE) AS intra_dup_ratio
        FROM per_doc p LEFT JOIN spd s ON p.doc_id = s.doc_id
    """,
    category="extension: dedup (line-level / C4-style)",
    doc="Line-level exact-dedup statistics — the C4/RefinedWeb step that "
        "removes repeated lines and boilerplate paragraphs INSIDE and "
        "ACROSS documents, one level below whole-doc dedup.  The fixture "
        "has no newlines, so a 'line' is a fixed 8-word block; every 5th "
        "doc gains a constructed copy with its first line prepended, "
        "which manufactures both an intra-doc duplicate (the prepend "
        "shifts the original blocks by exactly one full line, preserving "
        "alignment) and cross-doc shared lines against the original.  "
        "Per doc: unit count, distinct units, units shared with ANY "
        "other doc, intra-doc dup ratio (one IEEE division).  Scale: one "
        "explode, then every shuffle is keyed by doc_id or by the "
        "128-bit md5 line digest (uniform; count-only aggs partial-"
        "combine, so a viral boilerplate line cannot hot-spot a "
        "reducer).  Line hashes, not line text, cross the wire.",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower("text"), "\\W+"), lambda w: w != "")
    base = docs.select("doc_id", ws.alias("ws"))
    aug = base.unionByName(
        base.filter((F.col("doc_id") % LINE_AUG_EVERY == 0)
                    & (F.size("ws") >= LINE_WORDS))
        .select((F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(F.slice("ws", 1, LINE_WORDS), F.col("ws"))
                .alias("ws")))
    lines = F.transform(
        F.sequence(F.lit(0),
                   F.floor(F.size("ws") / LINE_WORDS).cast("int") - 1),
        lambda i: F.array_join(
            F.slice("ws", (i * LINE_WORDS + 1).cast("int"), LINE_WORDS),
            " "))
    u = (aug.filter(F.size("ws") >= LINE_WORDS)
         .select("doc_id", F.explode(lines).alias("line"))
         .select("doc_id", F.md5(F.col("line")).alias("h")))
    per_doc = u.groupBy("doc_id").agg(
        F.count("*").alias("n_units"),
        F.countDistinct("h").alias("n_distinct_units"))
    dh = u.distinct()
    shared = dh.groupBy("h").agg(F.count("*").alias("nd")) \
        .filter(F.col("nd") >= 2).select("h")
    spd = dh.join(shared, "h").groupBy("doc_id").agg(
        F.count("*").alias("n_shared_units"))
    return (per_doc.join(spd, "doc_id", "left")
            .select("doc_id", "n_units", "n_distinct_units",
                    F.coalesce("n_shared_units", F.lit(0).cast("long"))
                    .alias("n_shared_units"),
                    ((F.col("n_units") - F.col("n_distinct_units"))
                     .cast("double") / F.col("n_units").cast("double"))
                    .alias("intra_dup_ratio")))


# ---------------------------------------------------------------------------
# vocab_oov_rate — per-document out-of-vocabulary rate against a top-k vocab
# ---------------------------------------------------------------------------

OOV_VOCAB_K = 20   # top-k cut; the synthetic corpus has 31 distinct tokens


@query(
    "vocab_oov_rate",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({SQL_WORDS}) AS token FROM documents),
        v AS (
            SELECT token FROM (
                SELECT token, COUNT(*) AS tf FROM toks GROUP BY token
                ORDER BY tf DESC, token LIMIT {OOV_VOCAB_K}))
        SELECT doc_id, COUNT(*) AS n_tokens,
               COUNT(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov,
               COUNT(CASE WHEN v.token IS NULL THEN 1 END)
                   / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        FROM toks LEFT JOIN v USING (token)
        GROUP BY doc_id
    """,
    category="extension: curation (OOV-rate tokenizer evaluation)",
    doc="Per-document out-of-vocabulary rate against the corpus's own "
        "top-20 token vocabulary (same deterministic (term_freq DESC, "
        "token) cut as vocab_build) — the tokenizer-coverage diagnostic "
        "that decides whether a vocab size fits a corpus before an "
        "expensive BPE train, and a quality screen (high OOV = junk or "
        "out-of-domain text). The rate is one exact int/int division. "
        "Scale: vocab is TakeOrdered top-k and then BROADCAST to the "
        "token stream (k rows by construction); the per-doc agg is one "
        "partial-agg shuffle on doc_id — no corpus-sized join side.",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import tokenize
    from flinkapps_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.explode(tokenize(F.col("text"))).alias("token"))
    vocab = (toks.groupBy("token").agg(F.count("*").alias("tf"))
             .orderBy(F.desc("tf"), "token").limit(OOV_VOCAB_K)
             .select("token", F.lit(1).alias("in_v")))
    flagged = toks.join(F.broadcast(vocab), "token", "left")
    return (flagged.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.count(F.when(F.col("in_v").isNull(), 1))
                 .alias("n_oov"))
            .select("doc_id", "n_tokens", "n_oov",
                    (F.col("n_oov") / F.col("n_tokens").cast("double"))
                    .alias("oov_rate")))


# ---------------------------------------------------------------------------
# text_keyword_rake — stopword-delimited phrase extraction + RAKE scoring
# ---------------------------------------------------------------------------

RAKE_TOPK = 30
RAKE_SCALE = 10 ** 6        # fixed-point units for the deg/freq word score
_RAKE_STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"


@query(
    "text_keyword_rake",
    oracle=f"""
        WITH ph0 AS (
            SELECT trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
            FROM documents,
                 unnest(string_split(regexp_replace(lower(text),
                        '{_RAKE_STOP_RE}', '|', 'g'), '|')) AS t(p)),
        ph AS (
            SELECT phrase, len(string_split(phrase, ' ')) AS nw
            FROM ph0 WHERE phrase <> ''),
        w AS (SELECT unnest(string_split(phrase, ' ')) AS wd, nw FROM ph),
        wstat AS (
            SELECT wd, COUNT(*) AS freq, CAST(SUM(nw) AS BIGINT) AS deg
            FROM w GROUP BY wd),
        su AS (SELECT wd, (deg * {RAKE_SCALE}) // freq AS su FROM wstat),
        pd AS (
            SELECT phrase, nw, COUNT(*) AS n_occ
            FROM ph GROUP BY phrase, nw),
        psc AS (
            SELECT pw.phrase, CAST(SUM(su.su) AS BIGINT) AS score_units
            FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS wd
                  FROM pd) pw
            JOIN su USING (wd)
            GROUP BY pw.phrase)
        SELECT pd.phrase, pd.nw AS n_words, pd.n_occ,
               psc.score_units / {float(RAKE_SCALE)!r} AS rake_score
        FROM pd JOIN psc ON psc.phrase = pd.phrase
        ORDER BY psc.score_units DESC, pd.phrase
        LIMIT {RAKE_TOPK}
    """,
    category="extension: keyword extraction (RAKE)",
    doc="RAKE keyword extraction (Rose et al. 2010): candidate phrases "
        "are maximal runs of non-stopword tokens (text split on the "
        "shared STOPWORDS list), each word scores degree/frequency "
        "(degree = summed length of phrases it appears in), and a "
        "phrase scores the sum of its words' scores. The word score is "
        "kept EXACT as integer units — floor(deg*1e6/freq) via integral "
        "division, identical on both engines — so phrase scores are "
        "integer sums (order-independent) divided once at the end. "
        "Scale: two shuffles (word stats; per-phrase aggregation), both "
        "partial-agg combinable; phrase explosion is map-side; top-k is "
        "TakeOrdered with the phrase string as a total-order tiebreak. "
        "int64 headroom: deg*1e6 <= total-corpus-words * 1e6 — "
        "overflows past ~9e12 corpus words; shard the word-stat join "
        "or drop the scale at that point.",
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.split(
        F.regexp_replace(F.lower("text"), _RAKE_STOP_RE, "|"), r"\|")
    phrase = F.trim(F.regexp_replace(F.col("p"), " +", " "))
    ph = (docs.select(F.explode(raw).alias("p"))
          .select(phrase.alias("phrase"))
          .filter(F.col("phrase") != "")
          .select("phrase",
                  F.size(F.split("phrase", " ")).cast("long").alias("nw")))
    w = ph.select(F.explode(F.split("phrase", " ")).alias("wd"), "nw")
    wstat = w.groupBy("wd").agg(F.count("*").alias("freq"),
                                F.sum("nw").alias("deg"))
    su = wstat.select(
        "wd",
        F.expr(f"(deg * {RAKE_SCALE}) div freq").alias("su"))
    pd_ = ph.groupBy("phrase", "nw").agg(F.count("*").alias("n_occ"))
    pw = pd_.select("phrase", F.explode(F.split("phrase", " ")).alias("wd"))
    psc = (pw.join(su, "wd")
           .groupBy("phrase").agg(F.sum("su").alias("score_units")))
    return (pd_.join(psc, "phrase")
            .select("phrase", F.col("nw").alias("n_words"), "n_occ",
                    (F.col("score_units") / float(RAKE_SCALE))
                    .alias("rake_score"),
                    "score_units")
            .orderBy(F.desc("score_units"), "phrase")
            .limit(RAKE_TOPK)
            .drop("score_units"))


# ---------------------------------------------------------------------------
# text_zipf_fit — rank-frequency power-law fit of the corpus vocabulary
# ---------------------------------------------------------------------------

ZIPF_TOPR = 100            # fit over the top-R vocabulary
ZIPF_SCALE = 10 ** 9       # fixed-point units for ln-term sums


@query(
    "text_zipf_fit",
    oracle=f"""
        WITH w AS (SELECT unnest({{words}}) AS wd FROM documents),
        v AS (SELECT wd, COUNT(*) AS f FROM w GROUP BY wd),
        top AS (
            SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, wd) AS r
            FROM v ORDER BY f DESC, wd LIMIT {ZIPF_TOPR}),
        t AS (
            SELECT
                {{ux}} AS ux, {{uy}} AS uy,
                {{uxx}} AS uxx, {{uxy}} AS uxy
            FROM top),
        s AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(ux) AS BIGINT) AS sux,
                   CAST(SUM(uy) AS BIGINT) AS suy,
                   CAST(SUM(uxx) AS BIGINT) AS suxx,
                   CAST(SUM(uxy) AS BIGINT) AS suxy
            FROM t)
        SELECT n AS n_words,
               (n * (suxy / {float(ZIPF_SCALE)!r})
                - (sux / {float(ZIPF_SCALE)!r})
                  * (suy / {float(ZIPF_SCALE)!r}))
               / (n * (suxx / {float(ZIPF_SCALE)!r})
                  - (sux / {float(ZIPF_SCALE)!r})
                    * (sux / {float(ZIPF_SCALE)!r})) AS slope_zipf,
               ((suy / {float(ZIPF_SCALE)!r})
                - ((n * (suxy / {float(ZIPF_SCALE)!r})
                    - (sux / {float(ZIPF_SCALE)!r})
                      * (suy / {float(ZIPF_SCALE)!r}))
                   / (n * (suxx / {float(ZIPF_SCALE)!r})
                      - (sux / {float(ZIPF_SCALE)!r})
                        * (sux / {float(ZIPF_SCALE)!r})))
                  * (sux / {float(ZIPF_SCALE)!r})) / n AS intercept
        FROM s
    """.format(
        words=SQL_WORDS,
        ux=sql_units("ln(CAST(r AS DOUBLE))", ZIPF_SCALE),
        uy=sql_units("ln(CAST(f AS DOUBLE))", ZIPF_SCALE),
        uxx=sql_units("ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))",
                      ZIPF_SCALE),
        uxy=sql_units("ln(CAST(r AS DOUBLE)) * ln(CAST(f AS DOUBLE))",
                      ZIPF_SCALE)),
    category="extension: Zipf rank-frequency fit",
    doc="Zipf's-law fit of the corpus vocabulary: OLS slope of ln(freq) "
        "on ln(rank) over the top-100 words — the corpus-health number "
        "(natural text ~ -1; templated/synthetic corpora flatten or "
        "steepen it; cf. Piantadosi 2014). Determinism follows "
        "source_entropy_diversity's ln discipline: each ln term (and "
        "product) is rounded to fixed-point 1e-9 units BEFORE summing, "
        "so term order can't flip a bit, and the closed-form slope/"
        "intercept is one identical IEEE sequence from the integer "
        "sums. Ranks come from (count DESC, word) — a total order. "
        "Scale: one shuffle to vocabulary counts (partial-agg "
        "combines), TakeOrdered top-100, then a scalar aggregate over "
        "100 rows.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    vocab = (docs.select(F.explode(tokenize("text")).alias("wd"))
             .groupBy("wd").agg(F.count("*").alias("f")))
    top = vocab.orderBy(F.desc("f"), "wd").limit(ZIPF_TOPR)
    from pyspark.sql import Window
    r = F.row_number().over(Window.orderBy(F.desc("f"), "wd"))
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("f").cast("double"))
    t = top.select(F.col("f"), r.alias("r")).select(
        units_col(lx, ZIPF_SCALE).alias("ux"),
        units_col(ly, ZIPF_SCALE).alias("uy"),
        units_col(lx * lx, ZIPF_SCALE).alias("uxx"),
        units_col(lx * ly, ZIPF_SCALE).alias("uxy"))
    s = t.groupBy().agg(
        F.count("*").alias("n"), F.sum("ux").alias("sux"),
        F.sum("uy").alias("suy"), F.sum("uxx").alias("suxx"),
        F.sum("uxy").alias("suxy"))
    sc = float(ZIPF_SCALE)
    sx, sy = F.col("sux") / sc, F.col("suy") / sc
    sxx, sxy = F.col("suxx") / sc, F.col("suxy") / sc
    n = F.col("n")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(n.alias("n_words"),
                    slope.alias("slope_zipf"),
                    ((sy - slope * sx) / n).alias("intercept"))


# ---------------------------------------------------------------------------
# text_readability
# ---------------------------------------------------------------------------

RD_WORD_RE = r"\S+"               # whitespace-delimited words
RD_SENT_RE = r"[.!?]+"            # sentence terminator runs
RD_SYL_RE = r"[aeiouyAEIOUY]+"    # vowel groups ~ syllables


@query(
    "text_readability",
    oracle=f"""
        WITH per_doc AS (
            SELECT source,
                   len(regexp_extract_all(text, '{RD_WORD_RE}')) AS w,
                   GREATEST(len(regexp_extract_all(text, '{RD_SENT_RE}')), 1)
                       AS s,
                   len(regexp_extract_all(text, '{RD_SYL_RE}')) AS sy
            FROM documents),
        agg AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(w) AS BIGINT) AS total_words,
                   CAST(SUM(s) AS BIGINT) AS total_sentences,
                   CAST(SUM(sy) AS BIGINT) AS total_syllables
            FROM per_doc GROUP BY source)
        SELECT source, n_docs, total_words, total_sentences,
               total_syllables,
               CAST(total_words AS DOUBLE) / CAST(total_sentences AS DOUBLE)
                   AS words_per_sentence,
               CAST(total_syllables AS DOUBLE) / CAST(total_words AS DOUBLE)
                   AS syllables_per_word,
               206.835
                   - 1.015 * (CAST(total_words AS DOUBLE)
                              / CAST(total_sentences AS DOUBLE))
                   - 84.6 * (CAST(total_syllables AS DOUBLE)
                             / CAST(total_words AS DOUBLE)) AS flesch_ease
        FROM agg
    """,
    category="extension: text analysis (readability)",
    doc="Flesch reading-ease per corpus source: words = \\S+ runs, "
        "sentences = [.!?]+ runs (clamped to >=1 per doc so headline-"
        "style fragments count as one), syllables ~ vowel groups — the "
        "standard cheap heuristic. The score is computed at the SOURCE "
        "level from int64 token totals (not averaged over per-doc "
        "floats, which would be summation-order dependent): two exact "
        "divisions and a fixed literal expression, bit-identical on "
        "both engines. Scale: three regexp counts are a map-only pass "
        "over the corpus; one partial-aggregated shuffle on source.",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.regexp_count("text", F.lit(RD_WORD_RE)).alias("w"),
        F.greatest(F.regexp_count("text", F.lit(RD_SENT_RE)),
                   F.lit(1)).alias("s"),
        F.regexp_count("text", F.lit(RD_SYL_RE)).alias("sy"))
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("total_words"),
        F.sum("s").alias("total_sentences"),
        F.sum("sy").alias("total_syllables"))
    wps = (F.col("total_words").cast("double")
           / F.col("total_sentences").cast("double"))
    spw = (F.col("total_syllables").cast("double")
           / F.col("total_words").cast("double"))
    return agg.select(
        "source", "n_docs", "total_words", "total_sentences",
        "total_syllables",
        wps.alias("words_per_sentence"), spw.alias("syllables_per_word"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        .alias("flesch_ease"))


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------


def _novelty_oracle() -> str:
    from flinkapps_spark.plans.pipeline_queries import (
        _sql_shingle_codes, _sql_word_code,
    )
    wc = (f"list_transform({SQL_WORDS}, w -> {_sql_word_code('w')})")
    return f"""
        WITH sh AS (
            SELECT doc_id, source, unnest({_sql_shingle_codes(wc)}) AS s
            FROM documents),
        fd AS (
            SELECT s, CAST(MIN(doc_id) AS BIGINT) AS first_doc
            FROM sh GROUP BY s)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_shingle_occurrences,
               CAST(SUM(CASE WHEN fd.first_doc = sh.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN fd.first_doc = sh.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(COUNT(*) AS DOUBLE) AS novelty_rate
        FROM sh JOIN fd USING (s)
        GROUP BY source
    """


@query(
    "text_ngram_novelty",
    oracle=_novelty_oracle(),
    category="extension: corpus novelty (n-gram first-occurrence rate)",
    doc="Ingest-order novelty curve aggregated per source: for every "
        "distinct 3-word shingle occurrence, was this document (by "
        "doc_id order) the FIRST to contain that shingle? A source "
        "whose novelty rate collapses is re-crawling content the corpus "
        "already has — the macro view that complements per-pair dedup "
        "(dedup_incremental_newbatch decides keep/drop; this decides "
        "whether to keep crawling the source). Counts are int64 with "
        "one final division. Scale: shingles explode map-side (the "
        "inverted-index shape shared with text_decontaminate), the "
        "first-occurrence MIN partial-aggregates on the shingle key, "
        "one join back on that key, and the final aggregation is "
        "partial on source. No doc-to-doc comparison anywhere.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from flinkapps_spark.functions.text import tokenize, word_code
    from flinkapps_spark.operators.dedup import shingle_codes_of

    docs = load_table(spark, sf_dir, "documents")
    wc = F.transform(tokenize(F.col("text")), lambda w: word_code(w))
    sh = docs.select("doc_id", "source",
                     F.explode(shingle_codes_of(wc)).alias("s"))
    # window-min instead of agg+join-back: the expensive
    # tokenize+shingle explode runs ONCE and shuffles once on the
    # shingle key (the agg+join form re-computed the explode on the
    # probe side — measured 2x the corpus work at sf1)
    first_doc = F.min("doc_id").over(Window.partitionBy("s"))
    j = sh.select("doc_id", "source", first_doc.alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                  .otherwise(0))
    return (j.groupBy("source")
            .agg(F.count("*").alias("n_shingle_occurrences"),
                 novel.alias("n_novel"))
            .select("source", "n_shingle_occurrences", "n_novel",
                    (F.col("n_novel")
                     / F.col("n_shingle_occurrences").cast("double"))
                    .alias("novelty_rate")))
