"""Similarity search over embedding columns (beyond-reference).

- Brute-force cosine top-k: the exactness baseline. Queries are broadcast;
  the corpus streams past them in one pass (no corpus shuffle); ranking
  shuffles only (query × corpus-partition) partial top-k rows.
- LSH-bucketed ANN (random hyperplanes): the 100 TB path — candidates only
  within matching sign-buckets; probes grow recall.

Cosine math uses double-cast sequential folds (functions/vectors.py) so
DuckDB mirrors the arithmetic exactly; ranking keys round to 6 decimals
with a unique id tiebreak so ulp noise can never flip an ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flinkapps_spark.functions.vectors import cosine_similarity, l2_norm

# kNN plane family (round 9 — band-OR multi-code index, VERDICT r8 #1):
# the same splitmix64 integer-quantized plane construction as the banded
# near-dup family (lsh_plane_ints), but over a DISJOINT hash domain.
# The banded family consumes the contiguous splitmix64 inputs p·dim + i
# over 0..n_planes·dim; without an offset a knn plane would reuse exactly
# the inputs of a banded plane (ADVICE r8: the old stride-1024 scheme made
# knn plane p alias banded plane 16p).  Offsetting the whole domain by
# 2^32 makes the two families disjoint by construction.
KNN_PLANE_DOMAIN = 1 << 32

# band-OR sizing law: r bits/code, L independent codes, optional hamming≤1
# multi-probe per code.  P(neighbor at per-bit agreement p collides in one
# code) = p^r (+ r·p^(r-1)(1−p) with multi-probe); P(found) = 1−(1−q)^L.
# r grows with log2(n) to hold per-code random collisions ~n/2^r constant;
# L is solved from the target recall at the measured fixture worst-case
# per-bit agreement (isotropic 64-dim fixtures: top-5 cosine 0.26-0.49 →
# p1 0.58-0.62; floor 0.60).  This is the honest Indyk-Motwani regime:
# at p1 ≈ 0.6 vs p2 = 0.5 the quality exponent ρ = ln(1/p1)/ln(1/p2) ≈
# 0.74, so candidate fraction per query is Θ(n^(ρ−1)) — measured with the
# sizing law: 0.62 @ n=500, 0.52 @ n=2000, 0.38 @ n=20000 at recall
# 0.98-1.0 (no sublinear index can beat the ρ bound on near-orthogonal
# neighbors).  In the regime ANN is actually used for — queries with a
# true near neighbor (the knn_lsh_neardup gate: cos ≈ 0.9987 → p1 0.984)
# — the same index hits recall 1.0 at a measured 3e-4 candidate fraction.
KNN_TARGET_RECALL = 0.95
KNN_P1_FLOOR = 0.60


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries must be small (it is broadcast); corpus is never shuffled until
    the final per-query rank of partial candidates.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    joined = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def knn_lsh_params(n: int, target_recall: float = KNN_TARGET_RECALL,
                   p1: float = KNN_P1_FLOOR,
                   multi_probe: bool = True) -> tuple[int, int]:
    """(band_bits r, n_bands L) from the band-OR sizing law (module note):
    r ≈ log2(n) − 1 holds per-code random collisions constant; L solves
    1 − (1 − q(p1, r))^L ≥ target_recall at the fixture-measured worst-case
    per-bit agreement.  Deterministic in n — both engines and any re-run
    derive identical parameters."""
    import math
    r = min(18, max(6, round(math.log2(max(n, 2))) - 1))
    q = p1 ** r + (r * p1 ** (r - 1) * (1 - p1) if multi_probe else 0.0)
    L = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - q)))
    return r, L


def knn_lsh_expected_frac(n_bands: int, band_bits: int,
                          multi_probe: bool = True) -> float:
    """Expected per-query candidate fraction for a RANDOM (non-neighbor)
    corpus vector under i.i.d. planes: per code it collides with the
    query's probe set with q0 = (r+1)/2^r (multi-probe) or 1/2^r, union
    over L codes.  The catalog gate asserts the MEASURED fraction stays
    within 1.5× of this — a correlated plane family (the round-8 bug
    class: buckets collapse, candidates explode) trips the gate."""
    q0 = ((band_bits + 1) if multi_probe else 1) / float(2 ** band_bits)
    return 1.0 - (1.0 - q0) ** n_bands


def knn_lsh_candidates(corpus: DataFrame, queries: DataFrame, *,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = 64, n_bands: int, band_bits: int,
                       multi_probe: bool = True) -> DataFrame:
    """Distinct (query_id, vec_id) ANN candidates from the band-OR index:
    L independent r-bit codes per vector (one Arrow map pass, integer-
    exact signatures — module note at the banded family), corpus side
    exploded to (id, band, sig) and equi-joined against the BROADCAST
    query probe table (each query code plus its hamming≤1 flips).

    Scale shape: the corpus band table is map-only (no shuffle — the join
    is broadcast-hash against n_q·L·(r+1) probe rows); only actual
    collisions (~n·Σq0 rows) reach the distinct's exchange.  The corpus
    is bucketed once regardless of probe count."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    cb = (band_signature_table(corpus.repartition(par), id_col, vec_col,
                               dim, n_bands, band_bits,
                               plane_offset=KNN_PLANE_DOMAIN)
          .withColumnRenamed("id", "vec_id"))
    qb = (band_signature_table(queries, id_col, vec_col,
                               dim, n_bands, band_bits,
                               plane_offset=KNN_PLANE_DOMAIN)
          .withColumnRenamed("id", "query_id"))
    if multi_probe:
        probes = F.array(F.col("sig"),
                         *[F.col("sig").bitwiseXOR(F.lit(1 << j))
                           for j in range(band_bits)])
        qb = qb.select("query_id", "band", F.explode(probes).alias("sig"))
    return (cb.join(F.broadcast(qb), ["band", "sig"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id").distinct())


def knn_rerank(cand: DataFrame, corpus: DataFrame, queries: DataFrame,
               k: int = 5, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Exact cosine re-rank of (query_id, vec_id) candidates to top-k.
    Vectors re-attach by id (candidates ≪ corpus; AQE sizes the join),
    queries broadcast; ranking key rounds to 6 dp with an id tiebreak."""
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (cand.join(c, "vec_id").join(F.broadcast(q), "query_id")
              .select("query_id", "vec_id",
                      F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int = 64, n_bands: int | None = None,
            band_bits: int | None = None,
            multi_probe: bool = True) -> DataFrame:
    """ANN top-k via the band-OR multi-code LSH index (VERDICT r8 #1 —
    replaces the round-8 single 5-bit code whose recall was 0.24-0.32):
    L independent r-bit hyperplane codes, candidates = union of code
    matches (plus hamming≤1 multi-probe), exact cosine re-rank.

    Defaults size (r, L) from the corpus count via ``knn_lsh_params`` —
    measured recall@5 0.98-1.0 across fixtures at the ρ-law candidate
    fractions in the module note.  Pass explicit (n_bands, band_bits) to
    pin the index shape (e.g. the near-dup production regime: 8×16 bits
    single-probe → recall 1.0 at 3e-4 candidate fraction)."""
    if n_bands is None or band_bits is None:
        r, L = knn_lsh_params(corpus.count(), multi_probe=multi_probe)
        band_bits = band_bits if band_bits is not None else r
        n_bands = n_bands if n_bands is not None else L
    cand = knn_lsh_candidates(corpus, queries, id_col=id_col,
                              vec_col=vec_col, dim=dim, n_bands=n_bands,
                              band_bits=band_bits, multi_probe=multi_probe)
    return knn_rerank(cand, corpus, queries, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# LSH-banded near-dup candidates (VERDICT r7 #1): the isotropic-input path.
#
# Grid blocking (below) is recall-lossless but prunes by SPATIAL
# LOCALITY — when embeddings don't cluster (the sf10 isotropic fixture),
# every vector lands in a handful of cells and candidates go quadratic.
# Hyperplane banding prunes by ANGLE instead: a pair collides in a band
# with probability (1 − θ/π)^LSH_BITS regardless of where the pair sits
# in space, so candidate volume stays ~n²·LSH_BANDS/2^LSH_BITS on ANY
# input shape — subquadratic knob: LSH_BITS grows with log2(n) to hold
# candidates-per-vector constant (16 bits ≈ 65k buckets/band carries
# ~10^6-row corpora; a 100 TB run sizes bits ≈ 2·log2(n) − log2(budget)).
#
# Determinism contract (what makes the DuckDB oracle EXACT, not a recall
# gate): signatures are computed in integer arithmetic end-to-end.
# Each vector is unit-normalized (the norm is a LEFT-TO-RIGHT fold on
# both engines — bit-identical), quantized to ints via
# floor(u_i·LSH_Q + 0.5), and dotted with integer deterministic planes
# (splitmix64-hashed uniform ints in [-Q, Q] — see _splitmix64 for why
# the sin-mixed family is NOT usable here; all plane ints
# are materialized in Python so neither engine's libm is on the
# comparison path).  Every product ≤ (LSH_Q+1)·LSH_Q ≈ 1.7e7 and
# every 64-term sum ≤ 1.1e9 — integer-valued doubles far below 2^53, so
# numpy BLAS matmul, DuckDB list_sum, and any parallel reduction compute
# the EXACT same integer and the sign bit can never flip across engines.
# ---------------------------------------------------------------------------

LSH_BANDS = 12   # bands b: miss probability (1 − p^r)^b — at cosine 0.99
LSH_BITS = 16    # bits/band r: p = 1 − θ/π = 0.955, p^16 ≈ 0.48,
#                  miss ≈ 0.52^12 ≈ 4e-4; fixture pairs (cos .9987) miss
#                  ≈ 2e-8. Recall measured vs the lossless grid path by
#                  the neardup_lsh_recall catalog query.
LSH_Q = 4096.0   # quantization scale (2^12): |q_i| ≤ 4097 for unit input


_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """splitmix64 finalizer (public-domain constant set) — the plane
    component PRNG.  NOT the sin-mixed family (which knn_lsh also used
    until round 8): sin(p·10007 +
    i·101) steps only ~0.47 rad between adjacent components and ~0.6 rad
    between planes three apart, making planes SMOOTH and mutually
    correlated — measured at sf1, band signatures collapsed to 384
    distinct buckets (period-3 bit patterns) and candidates went to
    9.3e8.  An integer avalanche hash gives i.i.d.-uniform components:
    the same corpus spreads over ~65k buckets/band."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def lsh_plane_ints(n_planes: int, dim: int,
                   offset: int = 0) -> list[list[int]]:
    """Integer-quantized deterministic hyperplanes — THE shared constant
    between the Spark operator and the DuckDB oracle (both receive these
    exact ints, so neither engine evaluates any transcendental on the
    comparison path).  Component (p, i) = splitmix64(offset + p·dim + i)
    mapped uniformly to [-Q, Q].  ``offset`` separates plane FAMILIES
    (the kNN index uses KNN_PLANE_DOMAIN so its inputs can never alias
    the banded near-dup family's contiguous 0-based domain)."""
    q = int(LSH_Q)
    return [[int(_splitmix64(offset + p * dim + i) % (2 * q + 1)) - q
             for i in range(dim)]
            for p in range(n_planes)]


def _band_signature_udf(dim: int, n_bands: int, band_bits: int,
                        plane_offset: int = 0):
    """Arrow-batched band signatures: exact float64 matmuls per batch
    (all values integer-valued < 2^53 → order-independent, see module
    note), sign bits packed per band.  Map-only; planes in the closure."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    P = np.asarray(lsh_plane_ints(n_bands * band_bits, dim, plane_offset),
                   dtype=np.float64)
    W = (1 << np.arange(band_bits, dtype=np.int64))

    @pandas_udf("array<long>")
    def _sigs(vs):
        _cap_blas_threads()  # 32 workers × BLAS threads oversubscribe
        if len(vs) == 0:  # empty Arrow slice: asarray([]) is 1-D (ADVICE r8)
            return pd.Series([], dtype=object)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        # norm as a LEFT-TO-RIGHT fold: matches the oracle's unrolled
        # v[1]*v[1] + v[2]*v[2] + ... bit-for-bit (pairwise-summed
        # np.sum would differ in ulps and could flip a floor boundary)
        acc = np.zeros(len(X))
        for i in range(X.shape[1]):
            acc += X[:, i] * X[:, i]
        nrm = np.sqrt(acc)
        U = X / np.where(nrm > 0, nrm, 1.0)[:, None]
        Q = np.floor(U * LSH_Q + 0.5)       # integer-valued float64
        # chunk the plane matmul: a large-n kNN sizing (≈24k planes at
        # n=2e5) against a 10k-row Arrow batch would otherwise hold a
        # ~2 GB dot-product intermediate at once
        parts = []
        for lo in range(0, P.shape[0], 4096):
            parts.append((Q @ P[lo:lo + 4096].T >= 0).astype(np.int64))
        bits = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1)
        sigs = np.stack([bits[:, b * band_bits:(b + 1) * band_bits] @ W
                         for b in range(n_bands)], axis=1)
        return pd.Series(list(sigs))

    # asNondeterministic: blocks InferFiltersFromGenerate's size()>0
    # pushdown from duplicating the whole signature matmul below the
    # projection (the posexplode consumer otherwise ran the UDF TWICE —
    # see the matching note on the dedup word-hash UDF); values are in
    # fact deterministic.
    return _sigs.asNondeterministic()


def band_signature_table(df: DataFrame, id_col: str, vec_col: str,
                         dim: int = 64, n_bands: int = LSH_BANDS,
                         band_bits: int = LSH_BITS,
                         plane_offset: int = 0) -> DataFrame:
    """(id, band, sig) — one row per (vector, band): the banded LSH index
    in its joinable form.  Stateless map + explode (works identically on
    batch and streaming frames); zero-norm vectors are dropped (cosine
    undefined — exact test, norm=0 ⟺ all components zero)."""
    base = (df.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
            .filter(l2_norm(F.col("v")) > 0))
    sigs = base.select(
        "id", _band_signature_udf(dim, n_bands, band_bits,
                                  plane_offset)(F.col("v"))
        .alias("sigs"))
    return sigs.select("id", F.posexplode("sigs").alias("band", "sig"))


def embedding_neardup_pairs_lsh(df: DataFrame, threshold: float = 0.99,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                dim: int = 64,
                                n_bands: int = LSH_BANDS,
                                band_bits: int = LSH_BITS) -> DataFrame:
    """Embedding near-dup pairs via hyperplane-banded LSH + exact cosine
    verify — the candidate generator whose volume does NOT depend on the
    corpus clustering (grid blocking's failure mode on isotropic inputs,
    measured at sf10: CORRECTNESS_SF10.json disk exhaustion).

    Plan: one Arrow map pass computes ``n_bands`` integer band signatures
    per vector (module note: exact integer arithmetic, oracle-mirrorable
    bit-for-bit); candidates are the same-(band, signature) self-join —
    shuffle keyed by a (int, long) pair, ~n·b rows; only candidate pairs
    ever see a full 64-term cosine.  Expected candidates on an isotropic
    corpus: n²·b/2^r/2 pairs (sf10: 8e5² · 12/65536/2 ≈ 6e7 — vs the
    grid path's measured 4.6e10).  Near-identical clusters still pair
    quadratically within their bucket — those pairs ARE the output.

    Zero vectors drop out (cosine undefined; norm>0 filter — exact in
    any arithmetic order since norm=0 ⟺ all components zero).

    Unlike the lossless grid path, banding is probabilistic: a true pair
    escapes all bands with probability (1−p^r)^b (≈4e-4 at the 0.99
    boundary with the default 12×16; ≈2e-8 for the fixture's 0.9987
    pairs).  The DuckDB oracle mirrors the banding EXACTLY (same integer
    signatures), so correctness checks are exact-hash, not recall gates;
    recall vs the lossless grid path is measured by neardup_lsh_recall.
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  _as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  _as_double(F.col(vec_col)).alias("vb"))
    # spread the corpus before the Arrow stage (the parquet scan often
    # yields 1-2 input splits at test sf — same fix as the grid path)
    par = df.sparkSession.sparkContext.defaultParallelism
    # persist + eager count: the self-join below consumes the band table
    # on BOTH sides, and since the planner broadcasts one side the two
    # subtrees share no exchange to reuse — un-persisted, the Arrow
    # signature pass ran TWICE over the corpus (round-9, guide §1.2;
    # same pattern as minhash_lsh_pairs' persisted code-set table).
    # n·n_bands (id, band, sig) rows — tiny next to the vectors.
    bands = band_signature_table(df.repartition(par), id_col, vec_col,
                                 dim, n_bands, band_bits).persist()
    bands.count()
    x, y = bands.alias("x"), bands.alias("y")
    cand = (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.sig") == F.col("y.sig"))
                   & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("id_a"),
                    F.col("y.id").alias("id_b"))
            .distinct())
    # verify joins shuffle BY ID (corpus-sized build sides, candidate-
    # sized probe) — never broadcast: candidates can be ≫ driver memory
    pairs = cand.join(a, "id_a").join(b, "id_b")
    cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


GRID_DIMS = 6  # leading normalized components used as blocking keys:
# candidate fraction shrinks ~0.67× per dim on diffuse vectors while the
# probe fan-out (3^d rows on ONE side pre-join) stays linear and tiny


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.99,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            exhaustive: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Default path — RECALL-LOSSLESS grid blocking (the 100 TB plan):
    normalize each vector, quantize its first GRID_DIMS components into a
    grid of cell width w, and join only same-or-adjacent cells (3^d probe
    fan-out on one side).  Losslessness proof: for unit vectors,
    cosine ≥ t  ⟹  ‖â−b̂‖ = √(2−2t), and no single component can differ
    by more than the whole L2 distance; with the 6-dp-rounded filter the
    weakest admissible pair has cos ≥ t − 5e-7, so any reported pair has
    per-dim |Δ| ≤ √(2−2(t−5e-7)) < w, which means each blocking dim lands
    in the same or an adjacent cell — always inside the 27-cell probe.
    Therefore the blocked result EQUALS the all-pairs result (the oracle
    checks this equality empirically against a plain cross join).

    Scale: the join shuffles on 3 small int cell keys instead of forming
    n² pairs; dense regions of embedding space still pair quadratically
    within their cells — that residual skew is inherent to the problem
    (those pairs ARE the candidates) and splits further by raising
    GRID_DIMS.  Zero vectors have undefined cosine and drop out (cell
    keys go null through the 0-norm division).

    ``exhaustive=True`` keeps the n² all-pairs join (oracle shape /
    tiny-corpus shortcut).
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  _as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  _as_double(F.col(vec_col)).alias("vb"))
    if exhaustive:
        cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
        return (a.join(b, F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", cos.alias("cosine"))
                .filter(F.col("cosine") >= threshold))

    # cell width: strictly above the max per-dim diff of an admissible pair
    import math
    w = float(math.sqrt(2.0 - 2.0 * (threshold - 5e-7)) * 1.02)
    PRE = 16  # prefix length for the Cauchy-Schwarz candidate bound

    # encode all GRID_DIMS cell coords into ONE long in balanced base B:
    # key = Σ cell_i · B^i.  Injective while every digit |cell_i ± 1| < B/2;
    # cells are floor(unit_component / w) ∈ [−⌈1/w⌉, ⌈1/w⌉], so B sized
    # from the threshold keeps headroom.  Neighbor probing becomes
    # ADDITIVE: probing (cell_i + d_i) ∀i is key + Σ d_i·B^i — the 3^d
    # probe offsets collapse to 3^d precomputed long deltas, and the
    # candidate join runs on a single long equality instead of d separate
    # key columns (smaller shuffle rows, one-word hash).
    import math as _math
    max_cell = int(_math.ceil(1.0 / w)) + 1
    base = 2 * (max_cell + 2) + 1
    if base ** GRID_DIMS >= (1 << 62):  # pathological threshold → too many
        raise ValueError(  # cells per axis to pack into one long
            f"threshold {threshold} needs base {base}^{GRID_DIMS}; "
            "lower GRID_DIMS or use exhaustive=True")

    def with_cells(side: DataFrame, vec: str, p: str) -> DataFrame:
        # per-row precomputations used by the bound filter: prefix slice +
        # prefix/tail/full norms.  Kept OFF the probe fan-out (below) and
        # joined back by id only for actual candidates.
        out = (side
               .withColumn(f"{p}nrm", l2_norm(F.col(vec)))
               .withColumn(f"{p}pre", F.slice(F.col(vec), 1, PRE))
               .withColumn(f"{p}tail",
                           l2_norm(F.slice(F.col(vec), PRE + 1, 1 << 30))))
        key = None
        for i in range(GRID_DIMS):
            # try_divide: a zero-norm vector gets a NULL cell key and
            # drops out of the equi-join (cosine undefined — same
            # policy as cosine_similarity), instead of an ANSI
            # divide-by-zero aborting the whole job
            cell = F.floor(F.try_divide(F.element_at(F.col(vec), i + 1),
                                        F.col(f"{p}nrm")) / w).cast("long")
            term = cell * F.lit(base ** i).cast("long")
            key = term if key is None else key + term
        return out.withColumn(f"{p}key", key).drop(vec)

    # Spread the probe side across the cluster BEFORE the fan-out: the
    # parquet scan often yields 1-2 input splits, and when AQE broadcasts
    # the build side the candidate evaluation inherits that partitioning —
    # at sf1 (40k vectors, ~4e7 surviving candidates) the entire quadratic
    # verify ran in ONE task (a 30-min straggler).  One cheap round-robin
    # shuffle of n id+vector rows parallelizes the whole downstream chain.
    par = df.sparkSession.sparkContext.defaultParallelism
    ca = with_cells(a.select("id_a", "va").repartition(par), "va", "ca")
    cb = with_cells(b.select("id_b", "vb"), "vb", "cb")
    # probe side A into its 3^d neighbor cells; B stays at its home cell,
    # so every candidate pair is generated exactly once (no dedup pass).
    # The deltas ship as a broadcast 3^d-row single-column table
    # (BroadcastNestedLoop fan-out + one addition per probe row) —
    # building a 3^d-element array per input row via explode costs ~20×
    # more expression evaluation.  CRITICALLY the fan-out rows carry ONLY
    # (id, probe key): hauling the prefix payload through the 3^d
    # replication costs ~10× the bytes (measured 1.5× wall at sf0.1) —
    # the payload re-joins by id below, paying |candidates| not
    # 3^d·|corpus| rows.
    from itertools import product
    spark = df.sparkSession
    deltas = spark.createDataFrame(
        [(sum(d * base ** i for i, d in enumerate(ds)),)
         for ds in product((-1, 0, 1), repeat=GRID_DIMS)],
        "delta long")
    pa = (ca.select("id_a", "cakey").crossJoin(F.broadcast(deltas))
          .select("id_a", (F.col("cakey") + F.col("delta")).alias("pkey")))
    cond = (F.col("pkey") == F.col("cbkey")) & (F.col("id_a") < F.col("id_b"))
    # import ONLY dot: also importing cosine_similarity here would shadow
    # the module-level name across the whole function body and break the
    # exhaustive branch above with UnboundLocalError
    from flinkapps_spark.functions.vectors import dot
    # exact prefilter: dot(a,b) = dot(pre) + dot(tailₐ,tail_b)
    #                ≤ dot(pre) + ‖tailₐ‖·‖tail_b‖   (Cauchy-Schwarz)
    # so any pair the final filter keeps (cos ≥ t − 5e-7 after 6-dp
    # rounding) satisfies the bound with a 1e-3 slack — no recall loss.
    # Random candidates bound out at ~‖tailₐ‖‖tail_b‖ ≪ t·‖a‖‖b‖.
    # The a-side payload join is AQE-sized (broadcast when the corpus
    # digest fits, shuffle-hash keyed by id otherwise).
    bound = (dot(F.col("capre"), F.col("cbpre"))
             + F.col("catail") * F.col("cbtail"))
    survivors = (pa.join(cb, cond)
                 .join(ca.select("id_a", "capre", "catail", "canrm"),
                       "id_a")
                 .filter(bound >= (threshold - 1e-3)
                         * F.col("canrm") * F.col("cbnrm"))
                 .select("id_a", "id_b"))
    # survivors are ~|true pairs|: re-join the full vectors (broadcast the
    # tiny survivor list) and compute the oracle-identical cosine
    pairs = (F.broadcast(survivors)
             .join(a, "id_a").join(b, "id_b"))
    cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


_BLAS_CAPPED = False


def _cap_blas_threads() -> None:
    """Pin OpenBLAS to one thread in THIS process (idempotent).

    The quantizer matmuls here are tiny (≤16k×256×8); OpenBLAS's
    multi-thread path spends more time in spin-wait synchronization than
    computing at these sizes — measured 8.6× slower on a busy box
    (25 Lloyd assign passes: 1.35 s threaded vs 0.16 s single-thread).
    Per-task oversubscription is the same story on executors (32 worker
    processes × BLAS threads), so the Arrow UDFs call this too (guide
    §4.5: heavyweight init once per task).  Runtime call via the loaded
    symbol because the env var only works before numpy first loads BLAS.
    """
    global _BLAS_CAPPED
    if _BLAS_CAPPED:
        return
    _BLAS_CAPPED = True
    try:
        import ctypes

        def _cap(lib) -> bool:
            for sym in ("openblas_set_num_threads64_",
                        "openblas_set_num_threads"):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    fn(1)
                    return True
            return False

        # numpy loads its wheel-bundled OpenBLAS with RTLD_LOCAL, so the
        # symbol is usually NOT in the global namespace — find the .so
        # the process actually mapped and dlopen it by path (same handle,
        # just visible symbols)
        if not _cap(ctypes.CDLL(None)):
            with open("/proc/self/maps") as f:
                paths = {line.rsplit(maxsplit=1)[-1] for line in f
                         if "blas" in line.lower() and "/" in line}
            for p in sorted(paths):
                try:
                    if _cap(ctypes.CDLL(p)):
                        break
                except OSError:
                    continue
    except Exception:  # noqa: BLE001 — best-effort; threaded BLAS still works
        pass


def _lloyd(X, k: int, seed: int, iters: int = 25) -> list[list[float]]:
    """Seeded Lloyd k-means over an in-memory sample matrix; returns the
    centers as plain floats.  First-index argmin tie-break throughout.
    Empty clusters keep their previous center (deterministic, no re-seed).

    The center update is one bincount + np.add.at scatter instead of a
    per-cluster Python mask loop (guide §1.2 "per-task work": the loop
    was 256·25 = 6400 mask+gather+mean passes per codebook — measured
    0.34 s/book, ×8 books per IVF-PQ training).  Bit-identical to the
    loop form: numpy's axis-0 mean reduces rows sequentially in index
    order, exactly the np.add.at accumulation order (pinned by
    test_lloyd_update_forms_identical)."""
    import numpy as np
    _cap_blas_threads()
    rng = np.random.default_rng(seed)
    ctr = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    xx = (X * X).sum(1)
    prev = None
    for _ in range(iters):
        assign = _nearest_center(X, ctr, xx)
        # fixed point: identical assignment -> identical center update ->
        # every remaining iteration is a no-op, so breaking here returns
        # BIT-IDENTICAL centers to the full-iters loop (round-9: the 8
        # residual books each ran all 25 iters; most converge in far
        # fewer — pure driver time saved, output unchanged)
        if prev is not None and np.array_equal(assign, prev):
            break
        prev = assign
        counts = np.bincount(assign, minlength=len(ctr))
        sums = np.zeros_like(ctr)
        np.add.at(sums, assign, X)
        nz = counts > 0
        ctr[nz] = sums[nz] / counts[nz, None]
    return [[float(x) for x in row] for row in ctr]


def _sample_matrix(df: DataFrame, col: str, cap: int):
    """Bounded driver-side sample of an array column as a numpy matrix —
    the training substrate for coarse/PQ quantizers.  limit() short-
    circuits the scan, so cost is O(cap) regardless of corpus size."""
    import numpy as np
    return np.asarray([r[col] for r in df.select(col).limit(cap).collect()],
                      dtype=np.float64)


def _nearest_center(X, C, xx=None):
    """First-index-argmin nearest center per row via the ‖x‖²−2x·C+‖C‖²
    expansion — THE cell-assignment contract.  Every assigner (Lloyd,
    _cell_assign_udf, ivfpq_encode, residual-book training) must route
    through this one function: knn_cosine_ivfpq's shortlist_ok compares
    exact-within-probe against ADC-within-probe, which is only meaningful
    if both paths put each vector in the SAME cell (tie-breaks included).
    ``xx`` optionally passes the precomputed row norms ‖x‖² (Lloyd hoists
    them out of its iteration loop).

    The distance matrix is built in place (matmul result scaled by −2
    THROUGH the matmul, then two in-place adds) instead of as
    ``xx[:,None] − 2·(X@Cᵀ) + cc[None,:]``: the naive expression
    materializes two full n×k float64 temporaries and was the measured
    hot spot of residual-book training (25-iter dist+argmin loop over
    16384×256: 3.14 → 0.58 s).  BIT-IDENTICAL to the naive form — scaling
    by a power of two commutes exactly with every IEEE rounding step in
    the dot products (X@(−2C)ᵀ ≡ −2·(X@Cᵀ) elementwise), IEEE addition is
    commutative, and the add order (±2xc, then xx, then cc) matches —
    asserted over multiple shapes in test_nearest_center_inplace_form."""
    if xx is None:
        xx = (X * X).sum(1)
    d = X @ (-2.0 * C).T
    d += xx[:, None]
    d += (C * C).sum(1)[None, :]
    return d.argmin(1)


def _probe_cells(queries: DataFrame, centers: list[list[float]],
                 n_probe: int, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(query_id, qv, cell) — each query's ``n_probe`` nearest coarse
    cells: tiny crossJoin (queries × broadcast centers), zip_with L2
    distance, row_number ≤ n_probe with a (d, cell) tie-break.  Shared by
    knn_ivf and the ADC shortlist so both probe identical cells."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    centers_df = queries.sparkSession.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(centers)],
        "cell int, center array<double>")
    qc = q.crossJoin(F.broadcast(centers_df))
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("center"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cell"))
    return (qc.withColumn("d", dist)
            .withColumn("pr", F.row_number().over(w))
            .filter(F.col("pr") <= n_probe)
            .select("query_id", "qv", "cell"))


def training_sample(corpus: DataFrame, vec_col: str = "embedding",
                    train_cap: int = 16384):
    """The bounded driver-side training sample as a numpy matrix —
    exactly what ``train_coarse_centroids`` / ``train_residual_books``
    collect internally.  Collect it ONCE and pass it to both via
    ``sample=`` when training a full IVF-PQ index: the two trainers
    otherwise each run the same limit-scan collect job (guide §1.2:
    don't compute things twice)."""
    c = corpus.select(_as_double(F.col(vec_col)).alias("cv"))
    return _sample_matrix(c, "cv", train_cap)


def train_coarse_centroids(corpus: DataFrame, n_centroids: int = 16,
                           vec_col: str = "embedding",
                           seed: int = 42,
                           train_cap: int = 16384,
                           sample=None) -> list[list[float]]:
    """Train an IVF coarse quantizer on a bounded corpus sample (the
    faiss recipe: quantizers never need the full corpus).  Train once and
    pass the result to repeated ``knn_ivf`` calls (e.g. a probe sweep) so
    the index is built once per corpus, not once per setting.  Pass
    ``sample=`` (from :func:`training_sample`) to skip the collect when
    the caller already holds the matrix."""
    if sample is None:
        sample = training_sample(corpus, vec_col, train_cap)
    return _lloyd(sample, n_centroids, seed)


def _cell_assign_udf(centers: list[list[float]]):
    """Arrow-batched nearest-center assignment: per batch one n×k distance
    matrix via the ‖v‖²−2v·C+‖C‖² expansion, first-index argmin (same
    tie-break as Lloyd).  Map-only; the centers ride in the closure."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    C = np.asarray(centers, dtype=np.float64)

    @pandas_udf("int")
    def _assign(vs):
        _cap_blas_threads()  # small matmul: threaded BLAS is pure overhead
        if len(vs) == 0:  # 1-D asarray([]) guard (ADVICE r8 class)
            return pd.Series([], dtype="int32")
        Xb = np.asarray(vs.tolist(), dtype=np.float64)
        return pd.Series(_nearest_center(Xb, C).astype("int32"))

    # asNondeterministic: the equi-join on the cell column infers an
    # isnotnull(cell) filter that otherwise duplicates the whole distance
    # matmul below the projection (two ArrowEvalPython nodes measured in
    # knn_ivf) — same fix as the band-signature and word-hash UDFs.
    return _assign.asNondeterministic()


def knn_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
            n_centroids: int = 16, n_probe: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42,
            centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF (inverted-file) ANN: k-means-partition the corpus, search only
    the n_probe nearest centroid cells per query — the standard
    billion-vector scale path (coarse quantizer + cell scan).

    The coarse quantizer is seeded Lloyd on a bounded driver-side sample
    (``train_coarse_centroids``); pass ``centroids=`` to reuse a trained
    quantizer across calls.  Cell assignment is one Arrow-batched map
    pass, and each query's candidate set is n_probe/n_centroids of the
    corpus.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    centers = centroids if centroids is not None else \
        _lloyd(_sample_matrix(c, "cv", _PQ_TRAIN_CAP), n_centroids, seed)
    assigned = c.withColumn("cell", _cell_assign_udf(centers)(F.col("cv")))

    probe = _probe_cells(queries, centers, n_probe, id_col, vec_col)

    joined = assigned.join(F.broadcast(probe),
                           (assigned.cell == probe.cell)
                           & (F.col("vec_id") != F.col("query_id")))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    rank_w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                    F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(rank_w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


# PQ codebooks are trained on a bounded sample (standard practice: faiss
# recommends ~max(10k, 256·k) training points regardless of corpus size);
# the cap keeps driver memory and train time O(1) in corpus size.
_PQ_TRAIN_CAP = 16384

# sentinel for ivfpq_adc_shortlist(shortlist=ALL_CANDIDATES): return the
# full ADC-ranked candidate frame (query_id, vec_id, adc, srank) with no
# cut applied
ALL_CANDIDATES = object()


def pq_encode_audit(df: DataFrame, m: int = 8, k: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42,
                    mean_floor: float = 0.5,
                    min_floor: float = 0.3,
                    train_fraction: float = 1.0) -> DataFrame:
    """Product quantization audit — the billion-vector compression path
    (IVF-PQ): split each vector into ``m`` subvectors, learn a ``k``-word
    codebook per subspace (seeded KMeans), encode every vector as ``m``
    small codes (here 8 bytes replacing 64 doubles = 64× compression),
    reconstruct from codebook words and score reconstruction cosine
    against the original.

    Returns ONE audit row: (n_vectors, mean_ok, min_ok) — deterministic
    booleans against conservative floors, the cross-engine-checkable
    shape (codebooks are KMeans-seed-specific, so the codes themselves
    cannot be oracled; the floors are set at ~half the observed values,
    same pattern as the LSH/IVF recall gates).

    Scale: codebook training is seeded Lloyd on a driver-side sample
    capped at ``_PQ_TRAIN_CAP`` rows (optionally thinned first by
    ``train_fraction`` — at 100 TB pass ≈1e-5 so the limit() scan stops
    early); codebooks only ever need a bounded sample, so train cost is
    O(1) in corpus size.  Encode + reconstruct + score run in ONE
    Arrow-batched pandas UDF (vectorized numpy per batch, codebooks in
    the closure) — map-only, no shuffle, no ML stages; see the in-body
    note for why this beats the pure-Column form here.

    Requires ``dim % m == 0`` (asserted): otherwise the reconstruction
    concat would cover only ``m*(dim//m)`` elements and the cosine
    zip_with would null-pad, silently turning the audit booleans NULL.
    """
    import numpy as np

    c = df.select(F.col(id_col).alias("vec_id"),
                  _as_double(F.col(vec_col)).alias("v"))
    c = c.withColumn("__dim", F.size("v"))
    dim = c.select(F.max("__dim")).first()[0]
    if dim is None or dim % m != 0:
        raise ValueError(
            f"pq_encode_audit requires dim % m == 0, got dim={dim}, m={m}; "
            f"pad or trim the vectors (or pick m dividing dim) — a partial "
            f"last subvector would make recon_cos NULL instead of failing")
    sub = dim // m

    # Phase 1 — train: seeded Lloyd over a BOUNDED in-memory sample
    # (≤ _PQ_TRAIN_CAP rows), the standard PQ recipe (faiss trains its
    # codebooks the same way: a ~100k sample, never the corpus).  The
    # earlier MLlib form ran 8 distributed KMeans fits — hundreds of
    # scheduler-bound micro-jobs that dominated runtime at every sf
    # (24 s at sf0.1) while touching only 20k rows; driver-side numpy on
    # the sample is milliseconds and strictly bounded at 100 TB.
    train = (c if train_fraction >= 1.0
             else c.sample(fraction=train_fraction, seed=seed))
    X = _sample_matrix(train, "v", _PQ_TRAIN_CAP)
    codebooks = [_lloyd(X[:, i * sub:(i + 1) * sub], k, seed + i)
                 for i in range(m)]

    # Phase 2 — encode + reconstruct + score in ONE Arrow-batched pandas
    # UDF (map-only, no shuffle; codebooks ride in the closure, m*k*sub
    # floats).  A pure-Column form was tried first and rejected measured:
    # per-subspace argmin over k centers needs aggregate()/zip_with()
    # lambda chains, and Spark evaluates higher-order array functions
    # INTERPRETED (no whole-stage codegen) — ~26 s for 20k x 64 vectors
    # vs <1 s for the vectorized numpy batch below.  Per Arrow batch: one
    # n x k distance matrix per subspace via the |s|^2 - 2 s.C + |C|^2
    # expansion, argmin (first-index tie-break, same as Lloyd), gather,
    # cosine.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("double")
    def _recon_cos(vs):
        _cap_blas_threads()  # small matmul: threaded BLAS is pure overhead
        Xb = np.asarray(vs.tolist(), dtype=np.float64)
        recon = np.empty_like(Xb)
        for i, ctr in enumerate(books):
            S = Xb[:, i * sub:(i + 1) * sub]
            # _nearest_center IS this expression (in-place, bit-identical)
            recon[:, i * sub:(i + 1) * sub] = ctr[_nearest_center(S, ctr)]
        num = (Xb * recon).sum(1)
        den = np.sqrt((Xb * Xb).sum(1)) * np.sqrt((recon * recon).sum(1))
        out = np.where(den > 0, num / np.where(den > 0, den, 1.0), np.nan)
        return pd.Series(np.round(out, 6))

    scored = c.select("vec_id", _recon_cos(F.col("v")).alias("recon_cos"))
    return scored.agg(
        F.count("*").alias("n_vectors"),
        (F.avg("recon_cos") >= mean_floor).alias("mean_ok"),
        (F.min("recon_cos") >= min_floor).alias("min_ok"))


def train_residual_books(corpus: DataFrame, centers: list[list[float]],
                         m: int = 8, n_codes: int = 256,
                         vec_col: str = "embedding", seed: int = 42,
                         train_cap: int = _PQ_TRAIN_CAP,
                         sample=None) -> list[list[list[float]]]:
    """Train the IVFADC residual PQ codebooks (Jégou/Douze/Schmid 2011,
    §IV): sample a bounded matrix, assign each sample to its nearest
    coarse center, and learn one ``n_codes``-word codebook per subspace
    of the RESIDUAL v − c(v).  Residual encoding is what makes IVF-PQ
    beat flat PQ: within a cell the residuals are centered near 0, so
    the same code budget spends its resolution on the part of the vector
    the coarse quantizer didn't explain.

    Requires dim % m == 0 (same loud-failure contract as
    pq_encode_audit: a partial last subvector would silently drop the
    tail dimensions from every codebook, code and ADC score).

    Like every quantizer here, training is O(train_cap) driver-side
    numpy — independent of corpus size (the faiss recipe)."""
    import numpy as np
    X = (sample if sample is not None
         else training_sample(corpus, vec_col, train_cap))
    if X.shape[1] % m != 0:
        raise ValueError(
            f"train_residual_books requires dim % m == 0, got "
            f"dim={X.shape[1]}, m={m}; pad or trim the vectors (or pick "
            f"m dividing dim) — a partial last subvector would be "
            f"silently dropped from the codes")
    C = np.asarray(centers, dtype=np.float64)
    R = X - C[_nearest_center(X, C)]
    sub = X.shape[1] // m
    return [_lloyd(R[:, j * sub:(j + 1) * sub], n_codes, seed + j)
            for j in range(m)]


def ivfpq_encode(corpus: DataFrame, centers: list[list[float]],
                 books: list[list[list[float]]],
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Encode the corpus as the IVFADC index: (vec_id, cell, codes[m],
    vnorm).  ONE Arrow map pass per vector — nearest coarse center,
    per-subspace nearest residual codeword, plus the original L2 norm
    (carried so ADC can rank by approximate COSINE: the inner-product
    estimate divides by ‖q‖·‖v‖; codes alone don't know ‖v‖).

    This is the 100 TB artifact: m·log2(n_codes) bits + one float per
    vector instead of dim floats (64-dim float32 at m=8 8-bit codes =
    32× smaller), map-only to build, and the search below never touches
    the original vectors until the final shortlist re-rank."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    C = np.asarray(centers, dtype=np.float64)
    B = [np.asarray(b, dtype=np.float64) for b in books]
    m = len(B)

    @pandas_udf("array<double>")
    def _enc(vs):
        _cap_blas_threads()  # small matmul: threaded BLAS is pure overhead
        if len(vs) == 0:  # 1-D asarray([]) guard (ADVICE r8 class)
            return pd.Series([], dtype=object)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        if X.shape[1] % m != 0:  # loud, not a silent tail-dim drop
            raise ValueError(
                f"ivfpq_encode: dim={X.shape[1]} not divisible by m={m}")
        sub = X.shape[1] // m
        cell = _nearest_center(X, C)             # first-index tie-break
        R = X - C[cell]
        out = np.empty((len(X), 2 + m))
        out[:, 0] = cell
        out[:, 1] = np.sqrt((X * X).sum(1))
        for j in range(m):
            out[:, 2 + j] = _nearest_center(R[:, j * sub:(j + 1) * sub],
                                            B[j])
        return pd.Series(list(out))

    # asNondeterministic: keeps filter-inference from re-running the
    # whole encode matmul below the projection (the double-ArrowEval
    # class fixed on the band/word-hash/cell-assign UDFs); values are
    # in fact deterministic.
    enc = _enc.asNondeterministic()
    e = corpus.select(F.col(id_col).alias("vec_id"),
                      enc(_as_double(F.col(vec_col))).alias("e"))
    return e.select(
        "vec_id",
        F.element_at("e", 1).cast("int").alias("cell"),
        F.element_at("e", 2).alias("vnorm"),
        F.slice("e", 3, len(books)).cast("array<int>").alias("codes"))


def ivfpq_adc_shortlist(encoded: DataFrame, queries: DataFrame,
                        centers: list[list[float]],
                        books: list[list[list[float]]],
                        n_probe: int = 3,
                        shortlist: "int | None | object" = None,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        corpus_n: int | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) search over the encoded index: for each
    query, probe the ``n_probe`` nearest coarse cells and rank every
    code row in them by the ADC estimate of cosine.  With v ≈ c_cell +
    r̂ and r̂'s subvectors being codebook words, the inner product
    decomposes exactly:

        IP(q, v) ≈ q·c_cell + q·r̂ = q·c_cell + Σ_j LUT_j[code_j],
        LUT_j = q_j · book_j^T     (one m×n_codes table per query —
                                    note q_j, NOT (q−c)_j: the residual-
                                    query trick belongs to L2 ADC, where
                                    ‖q−v‖² = ‖(q−c)−r̂‖²; for inner
                                    product it adds a spurious −c·r̂
                                    bias that misranks candidates)
        adc = IP̂ / (‖q‖·‖v‖)

    — then keep the top ``shortlist`` per query.  The scan touches ONLY
    (cell, codes, vnorm): per candidate it costs m table lookups, never
    a dim-length dot — the query vectors ride in the UDF closure keyed
    by query_id (bounded: one search call serves one bounded query
    batch), so candidate rows stay (query_id, cell, vec_id, codes,
    vnorm)-narrow.  Zero-norm corpus rows are filtered (cosine
    undefined — same policy as band_signature_table); a zero-norm query
    scores 0 everywhere.  Emits (query_id, vec_id, adc); feed to
    ``knn_rerank`` for the exact top-k (the standard IVFADC+re-rank
    deployment).

    ``shortlist=None`` sizes it as max(64, 8% of the probed volume
    n_probe·n/n_centroids): on this ISOTROPIC fixture the true-neighbor
    cosine gaps (~0.2) are comparable to the 8-bit ADC estimate noise,
    so a fixed-fraction shortlist is what holds the within-probe recall
    flat as cells grow (measured at n=20k: 1.7% → 0.76, 4% → 0.94).
    On a real corpus — queries with near neighbors at cos ≳ 0.9, gaps
    ≫ quantization noise — a fixed few-hundred shortlist suffices
    regardless of n (the knn_lsh_neardup regime distinction).

    Scale: the probe table (n_q·n_probe rows) broadcasts; the candidate
    scan shuffles nothing until the per-query top-``shortlist`` window,
    whose input is n_q·n_probe/n_centroids of the corpus — with the
    √n-centroid sizing law that fraction FALLS as the corpus grows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    C = np.asarray(centers, dtype=np.float64)
    B = [np.asarray(b, dtype=np.float64) for b in books]
    m = len(B)
    if shortlist is None:
        import math
        # pass corpus_n where the caller knows it: counting ``encoded``
        # here would run the whole encode UDF once just for the sizing
        n = corpus_n if corpus_n is not None else encoded.count()
        shortlist = max(64, math.ceil(0.08 * n_probe * n / len(centers)))
    # ALL_CANDIDATES: skip the cut and return EVERY ADC-ranked candidate
    # with its srank — the substrate for shortlist-fraction sweeps (one
    # scoring pass, many cut thresholds applied by the caller)

    # the probe pairs join without qv; the query VECTORS ride in the UDF
    # closure instead (n_q · dim floats — bounded per search call), so
    # the data-proportional candidate scan never hauls a dim-length
    # array per row.  ONE collect serves both: qmap for the closure and
    # the (query_id, cell) probe pairs rebuilt as a local relation —
    # re-referencing the probe plan in the join would compute the
    # queries-×-centers window twice per call.
    probe_rows = _probe_cells(queries, centers, n_probe,
                              id_col, vec_col).collect()
    qmap = {r["query_id"]: np.asarray(r["qv"], dtype=np.float64)
            for r in probe_rows}
    probe_pairs = queries.sparkSession.createDataFrame(
        [(r["query_id"], r["cell"]) for r in probe_rows],
        queries.select(F.col(id_col).alias("query_id")).schema
        .add("cell", "integer"))

    cand = (encoded
            .filter(F.col("vnorm") > 0)   # zero vector: cosine undefined
            .join(F.broadcast(probe_pairs), "cell")
            .filter(F.col("vec_id") != F.col("query_id")))

    @pandas_udf("double")
    def _adc(qid, cell, codes, vnorm):
        _cap_blas_threads()  # LUT matvecs are tiny; threads spin-wait
        n = len(qid)
        if n == 0:
            return pd.Series([], dtype=float)
        CD = np.asarray(codes.tolist(), dtype=np.int64)
        # .tolist(): plain Python values, so ids of ANY hashable type
        # (long, string, ...) key qmap correctly — int() casts would
        # reject string ids the generic id_col contract allows
        cells = cell.tolist()
        qids = qid.tolist()
        out = np.empty(n)
        # LUTs batch-amortized per unique (query, cell) — a batch holds
        # n_q·n_probe ≤ a few dozen combos, each vectorized over its rows
        for key in set(zip(qids, cells)):
            idx = np.flatnonzero((qid == key[0]).to_numpy()
                                 & (cell == key[1]).to_numpy())
            qvec = qmap[key[0]]
            qn = float(np.sqrt(qvec @ qvec))
            if qn == 0.0:                 # zero query: cosine undefined
                out[idx] = 0.0
                continue
            sub = len(qvec) // m
            s = np.full(len(idx), float(qvec @ C[key[1]]))
            for j in range(m):
                lut = B[j] @ qvec[j * sub:(j + 1) * sub]
                s += lut[CD[idx, j]]
            out[idx] = s / qn
        return pd.Series(out / vnorm.to_numpy())

    scored = cand.select(
        "query_id", "vec_id",
        _adc.asNondeterministic()(
            F.col("query_id"), F.col("cell"),
            F.col("codes"), F.col("vnorm")).alias("adc"))
    sw = Window.partitionBy("query_id").orderBy(F.desc("adc"),
                                                F.asc("vec_id"))
    ranked = scored.withColumn("srank", F.row_number().over(sw))
    if shortlist is ALL_CANDIDATES:
        return ranked.select("query_id", "vec_id", "adc", "srank")
    return (ranked.filter(F.col("srank") <= shortlist)
            .select("query_id", "vec_id", "adc"))


def knn_ivf_pq(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 16, n_probe: int = 3,
               m: int = 8, n_codes: int = 256,
               shortlist: int | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42) -> DataFrame:
    """IVFADC end-to-end: coarse-quantize → residual-PQ-encode → ADC
    shortlist → exact cosine re-rank (the billion-vector search recipe).
    Returns the same (query_id, vec_id, cosine, rank) shape as the other
    kNN forms.  At 100 TB: train O(1), encode map-only, search reads the
    64×-compressed index and exactly re-ranks only ``shortlist`` full
    vectors per query; size n_centroids ~ √n so both the probe list and
    the per-cell scan stay balanced."""
    X = training_sample(corpus, vec_col)  # one collect feeds both trainers
    centers = train_coarse_centroids(corpus, n_centroids, vec_col, seed,
                                     sample=X)
    books = train_residual_books(corpus, centers, m, n_codes, vec_col, seed,
                                 sample=X)
    enc = ivfpq_encode(corpus, centers, books, id_col, vec_col)
    short = ivfpq_adc_shortlist(
        enc, queries, centers, books, n_probe, shortlist, id_col, vec_col,
        # count only when the adaptive sizing actually needs n
        corpus_n=corpus.count() if shortlist is None else None)
    return knn_rerank(short.select("query_id", "vec_id"),
                      corpus, queries, k, id_col, vec_col)


def embedding_centroids(df: DataFrame, label_col: str = "label",
                        vec_col: str = "embedding",
                        scale: int = 10 ** 7) -> DataFrame:
    """Per-label centroid of an embedding column: posexplode to
    (label, pos, value), aggregate per position, re-assemble the array in
    position order.

    Elements are fixed-pointed (ROUND(v*scale, 0) → int64) before summing:
    double summation is order-dependent across engines/partitions, while
    integer sums are associative.  ROUND at 0 dp is cross-engine-safe for
    any input (a double below 2^51 whose shortest repr ends in .5 IS
    exactly .5, and both engines break ties away from zero) — unlike
    ROUND at dp>0, which diverges on repr boundaries.  Precision loss is
    1/scale per element, documented contract of the operator.

    Scale: the explode shuffles n_vectors x dim skinny rows; partial
    aggregation collapses each (label, pos) to one row per task before
    the exchange, so shuffle bytes ~ |labels| x dim x n_tasks, not data
    size.  The re-assembly aggregates |labels| x dim rows — trivial.
    """
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"))
    from flinkapps_spark.plans.exact import units_col
    units = units_col(F.col("v"), scale)
    per_pos = (e.groupBy("label", "pos")
               .agg((F.sum(units) / F.count("*") / scale).alias("c"),
                    F.count("*").alias("n")))
    return (per_pos.groupBy("label")
            .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "c"))),
                     lambda s: s.getField("c")).alias("centroid"),
                 F.max("n").alias("n_vectors")))
