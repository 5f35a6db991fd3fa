"""Property-based tests (SURVEY §5.4): the CSV parse layer round-trips
arbitrary records, and batch ≡ stream on identical data (SURVEY §5.3).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from flinkapps_spark.operators.aggregations import word_count
from flinkapps_spark.operators.projections import csv_parse, csv_serialize
from flinkapps_spark.schemas import DAILY_PRICES
from flinkapps_spark.sources.batch import load_table
from flinkapps_spark.streaming.jobs import (
    file_stream_source, run_stream_to_memory,
)
from tests.conftest import SF_SMOKE

# CSV-safe field strategies: no commas/newlines (the reference's wire format
# is bare split(","), no quoting — reference source/flinkStreamProcessing.scala:109)
_sym = st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ", min_size=1, max_size=5)
_price = st.floats(min_value=0.01, max_value=9999.0,
                   allow_nan=False).map(lambda x: round(x, 2))
_vol = st.integers(min_value=0, max_value=2_000_000_000)
_date = st.dates(min_value=__import__("datetime").date(1990, 1, 1),
                 max_value=__import__("datetime").date(2030, 12, 28))


@st.composite
def price_rows(draw):
    return (
        draw(_sym), draw(_sym), draw(_date).isoformat(),
        draw(_price), draw(_price), draw(_price), draw(_price),
        draw(_vol), draw(_price),
    )


@settings(max_examples=10, deadline=None)
@given(st.lists(price_rows(), min_size=1, max_size=20))
def test_csv_roundtrip_property(spark, rows):
    """serialize(parse(line)) == line and parse(serialize(rec)) == rec for
    arbitrary dailyPrices records (R1 ↔ R6)."""
    df = spark.createDataFrame(rows, DAILY_PRICES)
    line = csv_serialize([F.col(f.name).cast("string")
                          for f in DAILY_PRICES.fields]).alias("value")
    serialized = df.select(line)
    reparsed = serialized.select(*csv_parse(F.col("value"), DAILY_PRICES))
    orig = sorted(tuple(r) for r in df.collect())
    back = sorted(tuple(r) for r in reparsed.collect())
    assert orig == back


def test_batch_equals_stream_wordcount(spark):
    """The same transform under spark.read and spark.readStream converges
    to identical results (T3 runtime-mode unification, SURVEY §5.3)."""
    batch = {(r["word"], r["cnt"])
             for r in word_count(
                 load_table(spark, SF_SMOKE, "documents"), "text").collect()}
    stream_df = file_stream_source(spark, SF_SMOKE, "documents")
    streamed = run_stream_to_memory(
        word_count(stream_df, "text"), output_mode="complete")
    stream = {(r["word"], r["cnt"]) for r in streamed.collect()}
    assert batch == stream


def test_fixed_point_sum_order_independent(spark):
    """The SCALE.md float-determinism contract, property-checked: the
    fixed-point int64 sum of random 2dp money values equals the exact
    Decimal sum at 2dp, for any partitioning/summation order."""
    from decimal import Decimal

    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(42)
    for trial in range(3):
        vals = (rng.integers(1, 10_000_000, size=2000) / 100.0).tolist()
        want = sum(Decimal(f"{v:.2f}") for v in vals)
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        for n_part in (1, 7, 32):
            units = F.round(F.col("v") * 100, 0).cast("long")
            got = (df.repartition(n_part)
                   .agg((F.sum(units)).alias("u")).collect()[0].u)
            assert Decimal(got) / 100 == want, (trial, n_part)


# --- as-of join: three physical engines, one semantics ----------------------

_asof_ts = st.integers(min_value=0, max_value=500)  # seconds, forced dups
_asof_key = st.integers(min_value=0, max_value=3)


@st.composite
def asof_inputs(draw):
    left = draw(st.lists(st.tuples(_asof_key, _asof_ts),
                         min_size=1, max_size=40))
    right = draw(st.lists(st.tuples(_asof_key, _asof_ts),
                          min_size=0, max_size=40))
    return left, right


@settings(max_examples=8, deadline=None)
@given(asof_inputs(),
       st.sampled_from(["backward", "forward"]),
       st.sampled_from([None, "30 seconds"]))
def test_asof_engines_agree_property(spark, inputs, direction, tolerance):
    """asof_join (merge_asof), asof_join(time_slice=...) and asof_join_jvm
    return identical rows on arbitrary key/timestamp multisets — including
    duplicate right timestamps (tie-broken by the value column), empty
    right sides, and tolerance windows that reject every match."""
    import datetime as dt

    from flinkapps_spark.operators.joins import asof_join, asof_join_jvm

    (lrows, rrows) = inputs
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s), float(i))
         for i, (k, s) in enumerate(lrows)],
        "id long, k long, ts timestamp, v double")
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), float(i))
         for i, (k, s) in enumerate(rrows)],
        "k long, ts timestamp, rv double") if rrows else \
        spark.createDataFrame([], "k long, ts timestamp, rv double")
    kw = dict(key_cols=["k"], ts_col="ts", value_cols=["rv"],
              tie_cols=["rv"], direction=direction, tolerance=tolerance)
    a = sorted(map(tuple, asof_join(left, right, num_buckets=4,
                                    **kw).collect()))
    b = sorted(map(tuple, asof_join(left, right, num_buckets=4,
                                    time_slice="2 minutes", **kw).collect()))
    c = sorted(map(tuple, asof_join_jvm(left, right, **kw).collect()))
    # adaptive split: threshold 3 puts some keys on the sliced path and
    # some on the direct path within one call (round 6)
    d = sorted(map(tuple, asof_join(left, right, num_buckets=4,
                                    time_slice="2 minutes",
                                    slice_hot_threshold=3, **kw).collect()))
    assert a == b, (direction, tolerance, a[:3], b[:3])
    assert a == c, (direction, tolerance, a[:3], c[:3])
    assert a == d, (direction, tolerance, a[:3], d[:3])


# ---------------------------------------------------------------------------
# prefix-filtered similarity join ≡ naive inverted-index join (losslessness)
# ---------------------------------------------------------------------------

_TINY_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _doc_texts():
    word = st.sampled_from(_TINY_VOCAB)
    return st.lists(
        st.lists(word, min_size=3, max_size=12).map(" ".join),
        min_size=2, max_size=12)


@settings(max_examples=6, deadline=None)
@given(_doc_texts(),
       st.sampled_from([0.3, 0.5, 0.6, 0.8]))
def test_jaccard_prefix_filter_lossless(spark, texts, threshold):
    """The ppjoin-style prefix-filtered jaccard_pairs/containment_pairs
    must return EXACTLY the naive inverted-index join's pairs — the
    6-word vocabulary forces heavy shingle collisions, duplicate texts,
    and size ties (the edge cases of the prefix/length bounds)."""
    from flinkapps_spark.operators.dedup import containment_pairs, jaccard_pairs
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    fast = sorted(map(tuple, jaccard_pairs(
        docs, threshold=threshold).collect()))
    naive = sorted(map(tuple, jaccard_pairs(
        docs, threshold=threshold, prefix_filter=False).collect()))
    assert fast == naive
    fast_c = sorted(map(tuple, containment_pairs(
        docs, threshold=threshold).collect()))
    naive_c = sorted(map(tuple, containment_pairs(
        docs, threshold=threshold, prefix_filter=False).collect()))
    assert fast_c == naive_c
    from flinkapps_spark.operators.dedup import jaccard_pairs_incremental
    is_new = lambda c: c % 3 == 0  # noqa: E731
    fast_i = sorted(map(tuple, jaccard_pairs_incremental(
        docs, is_new, threshold=threshold).collect()))
    naive_i = sorted(map(tuple, jaccard_pairs_incremental(
        docs, is_new, threshold=threshold, prefix_filter=False).collect()))
    assert fast_i == naive_i


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                          st.integers(0, 23),
                          st.floats(0.0, 490.0, allow_nan=False,
                                    allow_infinity=False)),
                min_size=1, max_size=60))
def test_grid_histogram_merge_lossless(spark, rows):
    """Sketch-union property behind sketch_grid_quantiles: per-partial
    histograms merged by bin-count addition equal the direct single-pass
    histogram for ANY partition assignment (hour column here)."""
    from flinkapps_spark.plans.ml_queries import GQ_WIDTH
    df = spark.createDataFrame(rows, "k string, part int, value double")
    binc = F.floor(F.col("value") / GQ_WIDTH).cast("long")
    direct = {tuple(r) for r in
              df.groupBy("k", binc.alias("bin"))
                .agg(F.count("*").alias("cnt")).collect()}
    merged = {tuple(r) for r in
              df.groupBy("k", F.col("part"), binc.alias("bin"))
                .agg(F.count("*").alias("pcnt"))
                .groupBy("k", "bin").agg(F.sum("pcnt").alias("cnt"))
                .collect()}
    assert direct == merged


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False,
                          allow_infinity=False, width=32),
                min_size=1, max_size=40))
def test_ewma_fold_matches_python(spark, values):
    """The JVM left-fold in events_ewma_recent computes the exact same
    IEEE sequence as the reference Python recurrence (s = a*x + (1-a)*s
    seeded with the first element)."""
    from flinkapps_spark.plans.ml_queries import EWMA_ALPHA
    expected = values[0]
    for x in values[1:]:
        expected = x * EWMA_ALPHA + expected * (1 - EWMA_ALPHA)
    df = spark.createDataFrame([(values,)], "vals array<double>")
    got = df.select(F.aggregate(
        F.slice(F.col("vals"), 2,
                F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at("vals", 1),
        lambda acc, x: x * EWMA_ALPHA + acc * (1 - EWMA_ALPHA))
        .alias("e")).collect()[0]["e"]
    assert got == expected  # bit-identical, not approximately


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["x", "y"]),
                          st.integers(0, 3),
                          st.integers(0, 10_000)),
                min_size=1, max_size=80))
def test_hll_register_merge_lossless(spark, rows):
    """Sketch algebra behind sketch_hll_portable / stream_hll_distinct:
    registers built per-segment and MERGED (pairwise max per bucket)
    equal registers built directly over the union, for ANY segmentation
    — the property that makes per-segment sketches roll up for free."""
    from flinkapps_spark.operators import sketches as sk
    df = spark.createDataFrame(rows, "k string, seg int, v long")
    direct = {tuple(r) for r in
              sk.hll_registers(df, ["k"], "v").collect()}
    merged = {tuple(r) for r in
              sk.hll_merge(sk.hll_registers(df, ["k", "seg"], "v")
                           .drop("seg"), ["k"]).collect()}
    assert direct == merged


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3_600 * 6),   # start offset s
                          st.integers(0, 900)),        # duration s
                min_size=1, max_size=60))
def test_concurrency_two_phase_matches_naive(spark, iv):
    """The two-phase distributed prefix sum in events_concurrency_peaks
    (within-hour running sums + cross-hour offsets) equals the naive
    single-ordered-scan sweep-line for ANY interval set."""
    import datetime as dt
    from flinkapps_spark.plans.timeseries_queries import (
        events_concurrency_peaks,
    )
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=s), 1, "t", float(d), None)
            for i, (s, d) in enumerate(iv)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got = {(r["hr"], r["peak_concurrency"]) for r in
               events_concurrency_peaks(spark, tmp).collect()}
    # naive sweep: sort all boundaries, ends before starts at equal time
    bounds = []
    for s, d in iv:
        t0 = base + dt.timedelta(seconds=s)
        bounds.append((t0, 1))
        bounds.append((t0 + dt.timedelta(seconds=d), -1))
    bounds.sort(key=lambda b: (b[0], b[1]))
    conc, peaks = 0, {}
    i = 0
    while i < len(bounds):
        t = bounds[i][0]
        # collapse equal (t, delta) runs exactly like the engine's net agg
        net = 0
        while i < len(bounds) and bounds[i][0] == t:
            net += bounds[i][1]
            i += 1
        conc += net
        hr = t.replace(minute=0, second=0, microsecond=0)
        peaks[hr] = max(peaks.get(hr, conc), conc)
    assert got == set(peaks.items())


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),       # segment
                          st.integers(0, 500)),    # value
                min_size=1, max_size=80))
def test_cms_cells_merge_lossless(spark, rows):
    """CMS cell tables built per-segment and merged by cnt addition
    equal cells built directly over the union — the mergeable-counter
    algebra behind sketch_cms_freq."""
    from flinkapps_spark.operators import sketches as sk
    df = spark.createDataFrame(rows, "seg int, v long")
    direct = {tuple(r) for r in sk.cms_cells(df, "v").collect()}
    parts = [sk.cms_cells(df.filter(F.col("seg") == s), "v")
             for s in (0, 1, 2)]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = {tuple(r) for r in
              u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
              .collect()}
    assert direct == merged


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 100_000), min_size=1, max_size=120),
       st.lists(st.integers(0, 100_000), min_size=1, max_size=120))
def test_kmv_union_of_samples_is_sample_of_union(spark, xs, ys):
    """theta-sketch set algebra behind sketch_kmv_setops: the k smallest
    of (sample(A) ∪ sample(B)) equal the k smallest of A ∪ B — so KMV
    samples compose without revisiting raw data."""
    from flinkapps_spark.operators import sketches as sk
    k = 16  # small k so the property bites at these sizes
    a = spark.createDataFrame([(x,) for x in xs], "v long")
    b = spark.createDataFrame([(y,) for y in ys], "v long")
    top = lambda df: (df.select(sk.kmv_hash("v").alias("h"))  # noqa: E731
                      .distinct().orderBy("h").limit(k))
    from_samples = {r["h"] for r in
                    top(a).unionByName(top(b)).distinct()
                    .orderBy("h").limit(k).collect()}
    from_union = {r["h"] for r in top(a.unionByName(b)).collect()}
    assert from_samples == from_union


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)),
                min_size=0, max_size=40),
       st.integers(25, 40))
def test_connected_components_matches_union_find(spark, edges, n_nodes):
    """dedup_clusters' labeler vs a driver-side union-find: every node —
    including isolated ones, which the contracted implementation routes
    around the iteration loop entirely — gets the minimum reachable id."""
    from flinkapps_spark.operators.dedup import connected_components

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in range(n_nodes)}

    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    pairs = spark.createDataFrame(edges or [(0, 0)], "doc_a long, doc_b long")
    if not edges:  # degenerate frame above only to satisfy createDataFrame
        pairs = pairs.filter(F.lit(False))
    got = {r["node"]: r["label"]
           for r in connected_components(nodes, pairs).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50),              # user
                          st.integers(0, 3_600 * 200),     # ts offset s
                          st.sampled_from(["view", "click",
                                           "purchase", "error"])),
                min_size=1, max_size=60))
def test_attribution_engines_agree(spark, rows):
    """events_attribution (one per-user window) and
    events_attribution_skewsafe (two-phase sliced) give identical
    answers on random event streams, including same-timestamp ties —
    the slicing decomposition is lossless."""
    import tempfile

    from flinkapps_spark.plans import catalog

    df = spark.createDataFrame(
        [(i, u, s, t) for i, (u, s, t) in enumerate(rows)],
        "event_id long, user_id long, off long, event_type string")
    ev = df.select(
        "event_id", "user_id",
        F.expr("timestamp_micros(1704067200000000 + off * 1000000)")
        .alias("ts"),
        "event_type", F.lit("{}").alias("props"),
        F.lit(0.0).alias("value"))
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        reg = catalog.registry()
        a = sorted(map(tuple, reg["events_attribution"]
                       .build(spark, d).collect()))
        b = sorted(map(tuple, reg["events_attribution_skewsafe"]
                       .build(spark, d).collect()))
        assert a == b


def test_connected_components_long_path_converges(spark):
    """A 30-hop path needs 30 synchronous min-propagation rounds but only
    ~log2(30) with pointer jumping — pins the shortcut (the pre-fix code
    silently returned unconverged labels past max_iter hops) and the
    conduct-but-exclude contract for endpoints absent from `nodes`."""
    from flinkapps_spark.operators.dedup import connected_components

    n = 31
    nodes = spark.createDataFrame(
        [(i,) for i in range(n) if i != 15], "node long")  # 15 conducts only
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    got = {r["node"]: r["label"]
           for r in connected_components(nodes, pairs).collect()}
    assert got == {i: 0 for i in range(n) if i != 15}


def test_connected_components_edge_volume_decays(spark):
    """Per-round edge contraction (VERDICT r6 #4): on a clique+chain
    graph the per-round edge-join volume must SHRINK, not stay |E| — a
    40-node clique (1,560 directed edges) collapses to one rep after
    round 1 and contributes ZERO edges to every later round, while the
    chain keeps the loop running long enough to observe the decay.
    Labels must equal the uncontracted semantics (component min)."""
    from flinkapps_spark.operators.dedup import connected_components

    k, chain = 40, 33
    clique = [(i, j) for i in range(1, k + 1)
              for j in range(i + 1, k + 1)]
    path = [(100 + i, 100 + i + 1) for i in range(chain)]
    pairs = spark.createDataFrame(clique + path, "doc_a long, doc_b long")
    node_ids = sorted({x for e in clique + path for x in e})
    nodes = spark.createDataFrame([(i,) for i in node_ids], "node long")
    stats: list = []
    got = {r["node"]: r["label"]
           for r in connected_components(
               nodes, pairs, round_stats=stats).collect()}
    expect = {i: 1 for i in range(1, k + 1)}
    expect.update({100 + i: 100 for i in range(chain + 1)})
    assert got == expect
    edge_counts = [s["edges"] for s in stats]
    assert len(edge_counts) >= 3                      # chain needs rounds
    assert edge_counts[0] == 2 * (len(clique) + len(path))
    # decay: strictly fewer edges every round until the rep graph is
    # empty (labels may still propagate through jumps for a round or
    # two after edges hit zero — that tail is node-sized, not edge-sized)
    assert all(a > b or a == b == 0
               for a, b in zip(edge_counts, edge_counts[1:]))
    assert edge_counts[1] <= 2 * len(path)   # clique gone after round 1
    assert edge_counts[-1] == 0 and stats[-1]["changed"] == 0


def test_cep_stream_matches_batch_on_same_us_ties(spark):
    """The batch CEP's RANGE frames include same-microsecond peers, so a
    view at the same us as a click MASKS the click (and a qualified
    click masks a same-us purchase). Pins that the streaming state walk
    reproduces exactly that on constructed ties — a per-row walk in
    (ts, event_id) order does not (the click would qualify off the
    older view before seeing its same-us masking peer)."""
    import tempfile

    from flinkapps_spark.plans import catalog

    H = 3_600
    base = 1_704_067_200  # 2024-01-01 UTC, seconds
    rows = [
        # user 1: click at T1 masked by same-us view -> purchase unmatched
        (1, 1, base + 0 * H, "view"),
        (5, 1, base + 1 * H, "click"),
        (10, 1, base + 1 * H, "view"),
        (20, 1, base + 2 * H, "purchase"),
        # user 2: qualified click at same us as purchase masks it
        (31, 2, base + 0 * H, "view"),
        (32, 2, base + 1 * H, "click"),
        (33, 2, base + 2 * H, "click"),
        (34, 2, base + 2 * H, "purchase"),
        # user 3: clean view -> click -> purchase control (matches)
        (41, 3, base + 0 * H, "view"),
        (42, 3, base + 1 * H, "click"),
        (43, 3, base + 2 * H, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, u, s, t) for i, u, s, t in rows],
        "event_id long, user_id long, sec long, event_type string").select(
        "event_id", "user_id",
        F.expr("timestamp_micros(sec * 1000000)").alias("ts"),
        "event_type", F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"))
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        reg = catalog.registry()
        batch = sorted(map(tuple, reg["events_cep_sequence"]
                           .build(spark, d).collect()))
        stream = sorted(map(tuple, reg["stream_cep_sequence"]
                            .build(spark, d).collect()))
        assert batch == stream
        assert [r[0] for r in batch] == [3]   # only the control user


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(1.0, 5000.0, allow_nan=False), min_size=1,
                max_size=40),
       st.lists(st.floats(1.0, 5000.0, allow_nan=False), min_size=1,
                max_size=40))
def test_ks_two_phase_matches_naive(spark, pa, pb):
    """The two-phase bucketed prefix scan in stats_ks_twosample equals
    the naive pooled-CDF sup computed in Python for ANY two samples —
    including value collisions within and across samples."""
    import tempfile

    from flinkapps_spark.plans.analytics_queries import (
        KS_SEG_A, KS_SEG_B, stats_ks_twosample,
    )

    prices = [round(p, 2) for p in pa] + [round(p, 2) for p in pb]
    segs = [KS_SEG_A] * len(pa) + [KS_SEG_B] * len(pb)
    orders = spark.createDataFrame(
        [(i, i, "O", p, None, "1-URGENT") for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string")
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, s) for i, s in enumerate(segs)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    with tempfile.TemporaryDirectory() as tmp:
        orders.coalesce(1).write.parquet(f"{tmp}/orders.parquet")
        cust.coalesce(1).write.parquet(f"{tmp}/customer.parquet")
        row = stats_ks_twosample(spark, tmp).collect()[0]

    ua = sorted(int(round(p * 100)) for p in [round(x, 2) for x in pa])
    ub = sorted(int(round(p * 100)) for p in [round(x, 2) for x in pb])
    n1, n2 = len(ua), len(ub)
    grid = sorted(set(ua) | set(ub))
    import bisect
    d_num = max(abs(bisect.bisect_right(ua, u) * n2
                    - bisect.bisect_right(ub, u) * n1) for u in grid)
    assert (row["n1"], row["n2"], row["d_num"]) == (n1, n2, d_num)
    assert row["ks_d"] == d_num / float(n1 * n2)


def test_mmr_greedy_invariants(spark):
    """MMR output contract on the fixtures: exactly K distinct picks,
    rank 1 is the relevance argmax, and scores are non-increasing
    (each later pick maximized over a smaller set with larger
    max-sim penalties)."""
    from flinkapps_spark.plans.pipeline_queries import (
        MMR_K, embedding_mmr_diversify,
    )

    rows = sorted(embedding_mmr_diversify(spark, SF_SMOKE).collect(),
                  key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, MMR_K + 1))
    assert len({r["vec_id"] for r in rows}) == MMR_K
    assert rows[0]["rel"] == max(r["rel"] for r in rows)
    scores = [r["mmr_score"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores


def test_covariance_matches_numpy(spark):
    """embedding_covariance against an independent numpy implementation
    of the same fixed-point definition (not the DuckDB oracle)."""
    import numpy as np

    from flinkapps_spark.plans.ml_queries import (
        COV_SCALE, embedding_covariance,
    )

    got = {(r["i"], r["j"]): r["cov"] for r in
           embedding_covariance(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings") \
        .select("embedding").collect()
    arr = np.array([r["embedding"] for r in emb], dtype=np.float64)
    v = arr * COV_SCALE
    xu = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
    n = len(xu)
    g = (xu.T @ xu) / float(COV_SCALE) ** 2
    sx = xu.sum(axis=0) / float(COV_SCALE)
    expect = (n * g - np.outer(sx, sx)) / (float(n) * n)
    for (i, j), c in got.items():
        assert abs(c - expect[i, j]) < 1e-9, (i, j, c, expect[i, j])
    assert len(got) == 64 * 65 // 2


# ---------------------------------------------------------------------------
# round-5 part-7 exact-algorithm properties (pure-Python reference models)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 500),          # price units u
                          st.integers(1, 50)),          # weight
                min_size=1, max_size=60))
def test_weighted_median_identity(rows):
    """The 2*cum >= tot + MIN extraction used by exact_weighted_median
    equals the textbook weighted median (smallest u whose cumulative
    weight reaches half the total) on arbitrary integer inputs."""
    from collections import defaultdict

    w = defaultdict(int)
    for u, q in rows:
        w[u] += q
    tot = sum(w.values())
    cum = 0
    expect = None
    for u in sorted(w):
        cum += w[u]
        if 2 * cum >= tot:
            expect = u
            break
    # the query's algebra: min u among qualifiers of the cum window
    cum2 = 0
    quals = []
    for u in sorted(w):
        cum2 += w[u]
        if 2 * cum2 >= tot:
            quals.append(u)
    assert min(quals) == expect


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(-20, 20),          # score
                          st.booleans()),                # label
                min_size=2, max_size=80))
def test_auc_rank_sum_identity(rows):
    """ml_auc_roc's distinct-score pair counting equals the O(n^2)
    definition AUC = [#(s_pos > s_neg) + #(s_pos = s_neg)/2] / (P*N)
    whenever both classes are present."""
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    if not pos or not neg:
        return
    brute2 = sum(2 * (p > n) + (p == n) for p in pos for n in neg)

    from collections import Counter
    cp, cn = Counter(pos), Counter(neg)
    num2 = 0
    cneg_lt = 0
    for s in sorted(set(cp) | set(cn)):
        num2 += cp.get(s, 0) * (2 * cneg_lt + cn.get(s, 0))
        cneg_lt += cn.get(s, 0)
    assert num2 == brute2


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=2, max_size=40))
def test_spearman_rho_matches_scipy_free_reference(vals):
    """stats_spearman_trend's d^2 identity (with unique-key tie-break)
    equals Pearson correlation of the two rank permutations."""
    # rank by (value, index) vs rank by (index) — the query's two keys
    n = len(vals)
    order_v = sorted(range(n), key=lambda i: (vals[i], i))
    rx = [0] * n
    for r, i in enumerate(order_v, 1):
        rx[i] = r
    ry = list(range(1, n + 1))
    sum_d2 = sum((a - b) ** 2 for a, b in zip(rx, ry))
    rho_d2 = 1.0 - (6 * sum_d2) / (n * (n * n - 1))
    # Pearson on the permutations (exact closed forms for mean/var)
    mean = (n + 1) / 2
    cov = sum((a - mean) * (b - mean) for a, b in zip(rx, ry)) / n
    var = (n * n - 1) / 12
    assert abs(rho_d2 - cov / var) < 1e-9


# ---------------------------------------------------------------------------
# popularity cap invariants (operators/baskets.py)
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 6)),
                min_size=1, max_size=60),
       st.integers(1, 10))
def test_pop_cap_invariants_property(spark, pairs, cap):
    """cap_popular_items on ARBITRARY (basket, item) multisets: after
    distinct-collapse and capping, (1) no surviving item's support
    exceeds the cap, (2) every dropped item's support exceeded it, and
    (3) surviving rows are exactly the original rows of surviving items
    (the guard never invents or partially drops rows)."""
    from pyspark.sql import functions as F

    from flinkapps_spark.operators.baskets import cap_popular_items

    op = spark.createDataFrame(pairs, "okey long, item long").distinct()
    capped = cap_popular_items(op, "item", cap)
    sup = {r["item"]: r["cnt"] for r in
           op.groupBy("item").agg(F.count("*").alias("cnt")).collect()}
    kept_rows = {(r["okey"], r["item"]) for r in capped.collect()}
    kept_items = {i for _, i in kept_rows}
    for item in kept_items:
        assert sup[item] <= cap, (item, sup[item], cap)
    for item in set(sup) - kept_items:
        assert sup[item] > cap, (item, sup[item], cap)
    expect = {(r["okey"], r["item"]) for r in op.collect()
              if sup[r["item"]] <= cap}
    assert kept_rows == expect


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-1.0, max_value=1.0,
                                   allow_nan=False, width=32),
                         min_size=8, max_size=8),
                min_size=12, max_size=40),
       st.integers(min_value=1, max_value=3))
def test_ivfpq_nesting_and_endpoint(spark, vecs, n_probe):
    """IVFADC invariants on arbitrary small vector sets (not just the
    fixture): (1) shortlist cuts NEST — the top-R1 set is a subset of
    the top-R2 set for R1 < R2 (one shared ranking, so the calibration
    sweep's monotonicity is structural, not statistical); (2) the
    all-candidates endpoint CONTAINS the exact-within-probe top-k
    (zero-norm rows excluded on both sides — cosine undefined), which
    is why the 1000-per-mille sweep row is exactly recall 1.0; (3) the
    encoder's cell assignment equals knn_ivf's (_nearest_center is the
    single shared contract)."""
    import numpy as np

    from flinkapps_spark.operators import similarity as S

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)
    centers = S.train_coarse_centroids(emb, n_centroids=4, train_cap=64)
    books = S.train_residual_books(emb, centers, m=4, n_codes=4,
                                   train_cap=64)
    enc = S.ivfpq_encode(emb, centers, books)
    ranked = S.ivfpq_adc_shortlist(enc, q, centers, books, n_probe=n_probe,
                                   shortlist=S.ALL_CANDIDATES)
    got = [(r["query_id"], r["vec_id"], r["srank"])
           for r in ranked.collect()]
    top2 = {(a, b) for a, b, r in got if r <= 2}
    top5 = {(a, b) for a, b, r in got if r <= 5}
    assert top2 <= top5                                   # (1) nesting
    allc = {(a, b) for a, b, _ in got}
    ivf = S.knn_ivf(emb, q, k=3, n_probe=n_probe, centroids=centers)
    nz = {r["vec_id"] for r in emb.collect()
          if any(x != 0 for x in r["embedding"])}
    exact = {(r["query_id"], r["vec_id"]) for r in ivf.collect()
             if r["vec_id"] in nz and r["query_id"] in nz}
    assert exact <= allc, exact - allc                    # (2) endpoint
    C = np.asarray(centers)
    cells = {r["vec_id"]: r["cell"] for r in enc.collect()}
    for i, v in rows:                                     # (3) contract
        expect = int(S._nearest_center(
            np.asarray([v], dtype=np.float64), C)[0])
        assert cells[i] == expect, (i, cells[i], expect)


def test_recursive_hierarchy_closed_form(spark):
    """sql_recursive_hierarchy's aggregate-fold engine form must equal the
    closed form it is derived from: halving k >= 1 reaches the root after
    exactly floor(log2(k)) = bit_length(k) - 1 steps.  Computed here in
    pure Python from the raw keys — independent of both the engine's
    conv-based fold and the oracle's WITH RECURSIVE."""
    from collections import defaultdict

    from flinkapps_spark.plans import catalog

    keys = [r["c_custkey"] for r in
            load_table(spark, SF_SMOKE, "customer")
            .select("c_custkey").collect()]
    ref = defaultdict(lambda: [0, None, None])
    for k in keys:
        if k < 1:      # never reaches the root: absent from the oracle
            continue
        d = k.bit_length() - 1
        ent = ref[d]
        ent[0] += 1
        ent[1] = k if ent[1] is None else min(ent[1], k)
        ent[2] = k if ent[2] is None else max(ent[2], k)
    got = {r["depth_to_root"]: [r["n_customers"], r["min_key"], r["max_key"]]
           for r in catalog.registry()["sql_recursive_hierarchy"]
           .build(spark, SF_SMOKE).collect()}
    assert got == {d: list(v) for d, v in ref.items()}
