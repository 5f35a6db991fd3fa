"""Engine-portable HyperLogLog: identical registers on every engine.

Classic HLL (Flajolet et al. 2007, AMC'07; the HLL++ bias table of Heule
et al. 2013 is intentionally omitted — the linear-counting switch covers
the small range) built on a 60-bit md5-prefix hash (crypto-uniform in
every bit, reproducible in any engine: both sides parse the first 15 hex
chars of md5 of the value's string form), so an independent engine (the
DuckDB oracle) reproduces the REGISTERS bit for bit, not just an
estimate within tolerance.  The repo's poly-31 hash was tried first and
REJECTED measured: its high bits are far from uniform on short decimal
strings (sf1: estimate 373k for 15k true distinct) — rho statistics
need every bit uniform, unlike the bucket-only uses elsewhere.  Every quantity downstream
of the registers is then deterministic:

- register weights sum as INTEGERS (2^(52-reg) fits int64: reg ≤ 51,
  1024 registers → Σ ≤ 2^61), so the harmonic mean needs exactly ONE
  floating division;
- the raw estimate multiplies one shared literal (alpha·m²·2^52,
  embedded via repr round-trip on both sides) by that quotient;
- linear counting (raw ≤ 2.5m, V > 0) is m·ln(m/V) — ln is the one
  libm call, and the final estimate rounds to an INTEGER, so a
  last-ulp ln difference cannot surface;
- reg_checksum = Σ reg·(bucket+1) pins the registers themselves in the
  value hash.

Scale: registers are a (key, bucket)→max aggregation — partial-agg
combinable map-side, fixed m=1024 counters per key no matter how many
rows stream through, and register tables MERGE by pairwise max, which is
what makes per-segment sketches roll up to any coarser grain for free
(the batch query's 'ALL' row and the streaming state-store variant both
reuse exactly that algebra).

Hash width: 60 bits — 10 bucket bits + 50 rho bits, ample for any
practical cardinality (rho saturates at 51 ≈ 2^50 distinct per bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HLL_P = 10
HLL_M = 1 << HLL_P              # 1024 registers
_HASH_HEX = 15                  # md5 prefix length → 60-bit hash
_W_BITS = 4 * _HASH_HEX - HLL_P  # 50 rho-domain bits
_RHO_MAX = _W_BITS + 1          # 51: value for w == 0 (all zeros)
_SHIFT = 52                     # integer register weight 2^(52-reg)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# alpha · m² · 2^52  (m²·2^52 = 2^72, exactly representable)
HLL_NUM = HLL_ALPHA * float(1 << (2 * HLL_P + _SHIFT))
_LC_CUTOFF = 2.5 * HLL_M


def hll_registers(df: DataFrame, key_cols: list[str],
                  value_col: str) -> DataFrame:
    """(keys..., bucket, reg): the HLL register table.  One partial-agg
    shuffle on (keys, bucket); reg = max over rows of rho(hash)."""
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")),
                           1, _HASH_HEX), 16, 10).cast("long")
    bucket = (h % HLL_M).alias("bucket")
    # shiftright, NOT floor(h / m): `/` is double division, and a 60-bit
    # hash exceeds the 53-bit significand — h = 2^59 − 32 rounds UP to
    # 2^59, flipping the bin length and breaking bit-for-bit register
    # parity with the oracle's integer `//` (found in review, pinned by
    # tests/test_engine_units.py::test_hll_rho_integer_division)
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(_RHO_MAX)) \
        .otherwise(F.lit(_RHO_MAX) - F.length(F.bin(w)))
    return (df.groupBy(*key_cols, bucket)
            .agg(F.max(rho).alias("reg")))


def hll_merge(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge register tables to coarser keys: pairwise max per bucket —
    the re-aggregation property (no raw data touched)."""
    return regs.groupBy(*key_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_finalize(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """(keys..., hll_est, reg_checksum) from a register table."""
    two_pow = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"CAST({_SHIFT} - reg AS INT))")
    per = regs.groupBy(*key_cols).agg(
        F.count("*").alias("n_obs"),
        F.sum(two_pow).alias("sum_obs"),
        F.sum(F.col("reg") * (F.col("bucket") + 1)).alias("reg_checksum"))
    v = F.lit(HLL_M) - F.col("n_obs")
    sum_int = (F.col("sum_obs")
               + v * F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SHIFT})"))
    raw = F.lit(HLL_NUM) / sum_int.cast("double")
    est = F.when((raw <= F.lit(_LC_CUTOFF)) & (v > 0),
                 F.lit(float(HLL_M))
                 * F.log(F.lit(float(HLL_M)) / v.cast("double"))) \
        .otherwise(raw)
    return per.select(*key_cols,
                      F.round(est, 0).cast("long").alias("hll_est"),
                      F.col("reg_checksum").cast("long")
                      .alias("reg_checksum"))


# --------------------------------------------------------------------------
# DuckDB mirrors (shared by every query that oracles this sketch)
# --------------------------------------------------------------------------

def sql_hll_hash(value: str) -> str:
    """60-bit integer from the first 15 hex chars of md5 of the value's
    string form — mirrors the Spark conv(substring(md5(...))) hash."""
    return (f"list_reduce(list_transform("
            f"string_split(substr(md5(CAST({value} AS VARCHAR)), 1, "
            f"{_HASH_HEX}), ''), "
            f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
            f"(a, b) -> a * 16 + b)")


def sql_hll_regs_cte(key: str, value: str, table: str) -> str:
    """CTE body producing ``hll_regs(k, bucket, reg)`` from a table."""
    return f"""
        hll_hx AS (
            SELECT {key} AS k, {sql_hll_hash(value)} AS h FROM {table}),
        hll_regs AS (
            SELECT k, h % {HLL_M} AS bucket,
                   MAX(CASE WHEN h // {HLL_M} = 0 THEN {_RHO_MAX}
                       ELSE {_RHO_MAX} - length(bin(h // {HLL_M}))
                       END) AS reg
            FROM hll_hx GROUP BY k, h % {HLL_M})"""


def sql_hll_finalize(regs_rel: str) -> str:
    """SELECT producing (k, hll_est, reg_checksum) from a register
    relation — mirrors hll_finalize term for term (CASTs keep DuckDB's
    HUGEINT sums out of the result)."""
    return f"""
        SELECT k,
               CAST(ROUND(CASE WHEN {HLL_NUM!r} / CAST(sum_int AS DOUBLE)
                                    <= {_LC_CUTOFF!r} AND v > 0
                               THEN {float(HLL_M)!r}
                                    * ln({float(HLL_M)!r}
                                         / CAST(v AS DOUBLE))
                               ELSE {HLL_NUM!r} / CAST(sum_int AS DOUBLE)
                          END, 0) AS BIGINT) AS hll_est,
               reg_checksum
        FROM (
            SELECT k, {HLL_M} - COUNT(*) AS v,
                   CAST(SUM(CAST(1 AS BIGINT) << ({_SHIFT} - reg))
                        + ({HLL_M} - COUNT(*))
                          * (CAST(1 AS BIGINT) << {_SHIFT})
                        AS BIGINT) AS sum_int,
                   CAST(SUM(reg * (bucket + 1)) AS BIGINT) AS reg_checksum
            FROM {regs_rel} GROUP BY k)"""


# --------------------------------------------------------------------------
# KMV (k minimum values) — the set-operation sketch HLL cannot provide
# --------------------------------------------------------------------------

KMV_K = 256                     # sample size: rse ≈ 1/sqrt(k-2) ≈ 6%
_HASH_RANGE = float(1 << (4 * _HASH_HEX))   # 2^60, exact power of two


def kmv_hash(value_col: str):
    """The same 60-bit md5-prefix hash the HLL uses — uniform in every
    bit, parseable identically by the DuckDB oracle."""
    return F.conv(F.substring(F.md5(F.col(value_col).cast("string")),
                              1, _HASH_HEX), 16, 10).cast("long")


def kmv_estimate(theta_h):
    """Distinct-count estimate (k−1)/U_(k) from the k-th smallest hash
    (normalized by the exact-power-of-two hash range: one division)."""
    return (F.lit(float(KMV_K - 1))
            / (theta_h.cast("double") / F.lit(_HASH_RANGE)))




# --------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation, never underestimates
# --------------------------------------------------------------------------

CMS_D = 4                       # hash rows: P(over eps-bound) <= e^-d
CMS_W = 1024                    # columns: eps = e / w ~ 2.7e-3
CMS_EPS = 2.718281828459045 / CMS_W


def cms_bucket(value_col: str, row: int):
    """Row-``row`` CMS column for a value: the shared md5-prefix hash
    with the row index salted into the input, mod w."""
    salted = F.concat(F.lit(f"{row}:"),
                      F.col(value_col).cast("string"))
    h = F.conv(F.substring(F.md5(salted), 1, _HASH_HEX), 16, 10) \
        .cast("long")
    return h % CMS_W


def cms_cells(df: DataFrame, value_col: str) -> DataFrame:
    """(row, bucket, cnt): the d×w counter matrix.  Each input row
    increments d cells; the explode-by-d stream partial-aggregates
    map-side, so the shuffle carries ≤ d·w cells per task regardless of
    input size — and two cell tables MERGE by cnt addition."""
    rows = df.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 cms_bucket(value_col, i).alias("bucket"))
        for i in range(CMS_D)])).alias("c"))
    return (rows.select("c.row", "c.bucket")
            .groupBy("row", "bucket")
            .agg(F.count("*").alias("cnt")))


def sql_cms_cells(value: str, table: str, name: str) -> str:
    """CTE producing ``{name}(row, bucket, cnt)`` — mirrors cms_cells."""
    salted = (f"list_reduce(list_transform(string_split(substr(md5("
              f"CAST(r AS VARCHAR) || ':' || CAST({value} AS VARCHAR)"
              f"), 1, {_HASH_HEX}), ''), "
              f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
              f"(a, b) -> a * 16 + b)")
    return f"""
        {name} AS (
            SELECT r AS row, {salted} % {CMS_W} AS bucket,
                   COUNT(*) AS cnt
            FROM {table} CROSS JOIN
                 (SELECT unnest(range({CMS_D})) AS r)
            GROUP BY 1, 2)"""


# --------------------------------------------------------------------------
# Bloom filter — portable membership sketch (no false negatives, ever)
# --------------------------------------------------------------------------

BLOOM_K = 6                     # hash functions
BLOOM_WORDS = 4096              # int64 words...
BLOOM_BITS_PER_WORD = 62        # ...of 62 usable bits (DuckDB's << errors
#                                 on the sign bit; 62 keeps both engines
#                                 in defined-behavior territory)
BLOOM_M = BLOOM_WORDS * BLOOM_BITS_PER_WORD   # 253,952 bits


def bloom_positions(df: DataFrame, value_col: str) -> DataFrame:
    """(word, bit): the k bit positions per input row — the salted
    md5-prefix hash family shared with the CMS sketch."""
    pos = [
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"b{j}:"),
                           F.col(value_col).cast("string"))),
            1, _HASH_HEX), 16, 10).cast("long") % BLOOM_M)
        for j in range(BLOOM_K)]
    return df.select(F.explode(F.array(*[
        F.struct((p / BLOOM_BITS_PER_WORD).cast("long").alias("word"),
                 (p % BLOOM_BITS_PER_WORD).cast("int").alias("bit"))
        for p in pos])).alias("c")).select("c.word", "c.bit")


def bloom_build(df: DataFrame, value_col: str) -> DataFrame:
    """(word, bits): the packed filter.  Bit masks partial-aggregate by
    bit_or map-side — ≤ BLOOM_WORDS rows per task cross the wire, and
    two filters MERGE by bit_or (the same rollup algebra as the other
    sketches)."""
    return (bloom_positions(df, value_col)
            .withColumn("mask", F.expr(
                "shiftleft(CAST(1 AS BIGINT), bit)"))
            .groupBy("word").agg(F.bit_or("mask").alias("bits")))


def bloom_probe(df: DataFrame, value_col: str,
                filt: DataFrame, id_cols: list[str]) -> DataFrame:
    """(ids..., hit): hit = all k bits set.  The ≤ BLOOM_WORDS-row
    filter broadcasts at any corpus size; a probe row is a hit iff all
    its k (word, bit) lookups land on set bits."""
    probe = df.select(*id_cols, F.col(value_col).alias("__v"))
    exprs = [
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"b{j}:"),
                           F.col("__v").cast("string"))),
            1, _HASH_HEX), 16, 10).cast("long") % BLOOM_M)
        for j in range(BLOOM_K)]
    expanded = probe.select(*id_cols, F.explode(F.array(*[
        F.struct((p / BLOOM_BITS_PER_WORD).cast("long").alias("word"),
                 (p % BLOOM_BITS_PER_WORD).cast("int").alias("bit"))
        for p in exprs])).alias("c")).select(*id_cols, "c.word", "c.bit")
    checked = (expanded.join(F.broadcast(filt), "word", "left")
               .withColumn("set_", F.coalesce(
                   F.col("bits").bitwiseAND(F.expr(
                       "shiftleft(CAST(1 AS BIGINT), bit)")) != 0,
                   F.lit(False))))
    return (checked.groupBy(*id_cols)
            .agg((F.sum(F.col("set_").cast("int")) == BLOOM_K)
                 .alias("hit")))


def sql_bloom_pos(value: str, j: int) -> str:
    """One salted hash position — mirrors bloom_positions for row j."""
    return (f"list_reduce(list_transform(string_split(substr(md5("
            f"'b{j}:' || CAST({value} AS VARCHAR)), 1, {_HASH_HEX}), "
            f"''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS "
            f"BIGINT)), (a, b) -> a * 16 + b) % {BLOOM_M}")
