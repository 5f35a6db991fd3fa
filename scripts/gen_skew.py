"""Zipf-skewed stress fixtures (VERDICT r5 #2).

The TPC-H-ish driver fixtures are UNIFORM: every skew-safe path in the
engine (salted agg, salted join, as-of time slicing, dedup skew_guard,
basket pop_cap) was verified correct on them, but none was ever
demonstrated under the data shape it exists for.  This generator builds
a fixture dir whose key distributions are adversarial by construction:

- ``lineitem.parquet`` — baskets where HOT_PARTS ultra-popular items
  each sit in ~half of all orders (every other item is uniform), so
  the within-order pair expansion is dominated by hot-item pairs
  (E[C(basket,2)] ~15x the capped volume) and the (hot, hot) pair keys
  concentrate on a few reducers: the exact shape recsys_item_cosine /
  itemset_copurchase_pairs ``pop_cap`` guards.
- ``events.parquet`` + ``customer.parquet`` — one user owns ~30% of all
  events (the rest zipf-tailed), with purchase/signup types present:
  the hot-key shape for join_salted_skew, agg_two_phase_salted, and the
  as-of time_slice split.
- ``documents.parquet`` — one document text duplicated into ~30% of all
  rows: the hot-digest shape for exact_dedup(skew_guard=True).

Deterministic (fixed seed), numpy + pyarrow only (no JVM), small enough
to generate per test session and large enough that SKEWBENCH.md's
naive-vs-guarded timings are signal, not overhead.

Usage: ``python scripts/gen_skew.py [out_dir] [--scale N]`` (scale
multiplies row counts; tests use scale 1, the bench uses a larger one).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_PARTS = 20         # ultra-popular items
HOT_PART_RATE = 0.50   # each hot part appears in this fraction of orders
HOT_USER_RATE = 0.30   # fraction of events owned by the single hot user
HOT_DOC_RATE = 0.30    # fraction of documents sharing one duplicated text

FULL_DOC_GROUPS = 30   # duplicate groups in the full-schema fixture

N_ORDERS = 20_000
N_PARTS = 2_000
BASKET_UNIFORM = 4     # uniform items per order beside the hot ones
N_EVENTS = 400_000
N_USERS = 5_000
N_DOCS = 30_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def gen_lineitem(rng: np.random.Generator, out_dir: str, scale: int) -> None:
    n_orders = N_ORDERS * scale
    okeys, parts = [], []
    # hot parts 1..HOT_PARTS; uniform tail HOT_PARTS+1..N_PARTS
    hot_mask = rng.random((n_orders, HOT_PARTS)) < HOT_PART_RATE
    uni = rng.integers(HOT_PARTS + 1, N_PARTS + 1,
                       size=(n_orders, BASKET_UNIFORM))
    for o in range(n_orders):
        basket = set(uni[o].tolist())
        basket.update(p + 1 for p in range(HOT_PARTS) if hot_mask[o, p])
        okeys.extend([o + 1] * len(basket))
        parts.extend(sorted(basket))
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(parts, pa.int64()),
    }))


def gen_events_customer(rng: np.random.Generator, out_dir: str,
                        scale: int) -> None:
    n = N_EVENTS * scale
    hot_n = int(n * HOT_USER_RATE)
    # zipf tail over the remaining users (clipped), hot user id = 1
    tail = rng.zipf(1.3, size=n - hot_n) % (N_USERS - 1) + 2
    user_id = np.concatenate([np.ones(hot_n, dtype=np.int64),
                              tail.astype(np.int64)])
    rng.shuffle(user_id)
    base_us = 1_700_000_000_000_000           # fixed epoch anchor, µs
    ts = base_us + rng.integers(0, 30 * 86_400_000_000, size=n)
    etype = rng.choice(
        np.array(["view", "click", "purchase", "signup", "error"]),
        size=n, p=[0.5, 0.3, 0.1, 0.05, 0.05])
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user_id, pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(
            np.round(rng.random(n) * 500.0, 2), pa.float64()),
    }))
    seg = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                    "HOUSEHOLD", "MACHINERY"])
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(1, N_USERS + 1), pa.int64()),
        "c_mktsegment": pa.array(seg[np.arange(N_USERS) % 5], pa.string()),
    }))


def gen_documents(rng: np.random.Generator, out_dir: str,
                  scale: int) -> None:
    n = N_DOCS * scale
    hot_n = int(n * HOT_DOC_RATE)
    hot_text = "the quick brown fox jumps over the lazy dog " * 8
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "kappa"])
    uniq = [" ".join(words[rng.integers(0, 10, size=12)])
            + f" uniq{i}" for i in range(n - hot_n)]
    texts = [hot_text] * hot_n + uniq
    order = rng.permutation(n)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "text": pa.array([texts[i] for i in order], pa.string()),
    }))


def generate(out_dir: str, scale: int = 1, seed: int = 0) -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    gen_lineitem(rng, out_dir, scale)
    gen_events_customer(rng, out_dir, scale)
    gen_documents(rng, out_dir, scale)
    return out_dir


# ---------------------------------------------------------------------------
# Full-schema skew fixture (VERDICT r6 #1)
# ---------------------------------------------------------------------------
# The 4-table fixture above is the MICRO fixture: minimal schemas, only
# the columns the guarded operators touch — right for the guard parity
# tests and SKEWBENCH, unusable for the other ~290 catalog queries.  The
# full-catalog skew sweep needs all 10 tables with the driver schemas
# but ADVERSARIAL key/text distributions.  ``generate_full`` rewrites an
# existing uniform fixture dir (default /root/testdata/sf0.1) in place
# of re-deriving every marginal: non-key columns are carried verbatim,
# only the skew-bearing columns are replaced — so every catalog query
# still type-checks and joins stay within their key domains, while every
# hot-key code path (agg, join, window, dedup, pair expansion) sees a
# zipf/hot-spot shape.  Parity sweeps compare Spark vs DuckDB on the
# SAME files, so no semantic invariant beyond schema+domain is required.
#
# Skews applied (all deterministic, fixed seed):
# - events.user_id: 30% of events to user 1, tail zipf(1.3) over the
#   customer key domain (hot groupBy/window/as-of keys).
# - orders.o_custkey: 30% of orders to customer 1 (hot join fan-out).
# - lineitem.l_partkey: 30% of lines to HOT_PARTS parts (hot pair keys);
#   l_suppkey: 30% of lines to supplier 1 (hot fact-dim join key).
# - documents.text: 30% of docs duplicated across FULL_DOC_GROUPS
#   distinct texts (hot digests ~30-60x the uniform dup density);
#   n_chars updated to match so length-derived stats stay coherent.
# - embeddings.embedding: 30% of vectors duplicated across
#   FULL_DOC_GROUPS prototype vectors (hot ANN/near-dup buckets).
# - customer/part/supplier/nation/region: copied verbatim.
#
# Why GROUPS for documents/embeddings but a SINGLE hot key for
# events/orders/lineitem: hot-key skew stresses aggregation, window,
# join and as-of paths whose OUTPUT stays linear no matter how hot the
# key — the adversarial shape is free.  Near-dup corpora are different:
# the pair queries' ANSWER is quadratic in the duplicate-clique size
# (one text in 30% of 5,000 docs = a 1,500-clique = 1.1M result pairs,
# each re-verified by exact Jaccard/Levenshtein on BOTH engines —
# hours of per-pair verify work that measures output volume, not skew
# handling).  Thirty groups of ~1% keep every digest/bucket/band
# adversarially hot while pair answers stay ~C(50,2) x 30 — the sweep
# then checks CORRECTNESS under shape, which is its job; the
# single-giant-clique wall-clock story lives in SKEWBENCH.md via the
# micro fixture's guarded operators.


def _skew_choice(rng: np.random.Generator, n: int, hot_vals: np.ndarray,
                 tail_lo: int, tail_hi: int, hot_rate: float) -> np.ndarray:
    """hot_rate of n rows drawn uniformly from hot_vals, the rest
    zipf-tailed over [tail_lo, tail_hi]; positions shuffled."""
    hot_n = int(n * hot_rate)
    hot = hot_vals[rng.integers(0, len(hot_vals), size=hot_n)]
    tail = rng.zipf(1.3, size=n - hot_n) % (tail_hi - tail_lo + 1) + tail_lo
    out = np.concatenate([hot.astype(np.int64), tail.astype(np.int64)])
    rng.shuffle(out)
    return out


def generate_full(out_dir: str, src_dir: str = "/root/testdata/sf0.1",
                  seed: int = 0) -> str:
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    def read(name: str) -> pa.Table:
        return pq.read_table(os.path.join(src_dir, f"{name}.parquet"))

    def replace(t: pa.Table, col: str, arr: pa.Array) -> pa.Table:
        return t.set_column(t.schema.get_field_index(col), col, arr)

    for name in ("region", "nation", "customer", "part", "supplier"):
        _write(out_dir, name, read(name))

    cust = read("customer")
    n_cust = cust.num_rows

    ev = read("events")
    n = ev.num_rows
    uid = _skew_choice(rng, n, np.array([1]), 2, n_cust, HOT_USER_RATE)
    # ts carried verbatim (driver fixtures store TIMESTAMP(MICROS); the
    # ns→µs load path keeps its own pinned-unit regression fixtures)
    _write(out_dir, "events", replace(ev, "user_id",
                                      pa.array(uid, pa.int64())))

    od = read("orders")
    n = od.num_rows
    ck = _skew_choice(rng, n, np.array([1]), 2, n_cust, HOT_USER_RATE)
    _write(out_dir, "orders", replace(od, "o_custkey",
                                      pa.array(ck, pa.int64())))

    li = read("lineitem")
    part = read("part")
    supp = read("supplier")
    n = li.num_rows
    pk = _skew_choice(rng, n, np.arange(1, HOT_PARTS + 1),
                      HOT_PARTS + 1, part.num_rows, HOT_PART_RATE * 0.6)
    sk = _skew_choice(rng, n, np.array([1]), 2, supp.num_rows,
                      HOT_USER_RATE)
    li = replace(li, "l_partkey", pa.array(pk, pa.int64()))
    li = replace(li, "l_suppkey", pa.array(sk, pa.int64()))
    _write(out_dir, "lineitem", li)

    doc = read("documents")
    n = doc.num_rows
    hot_n = int(n * HOT_DOC_RATE)
    # group texts are mutually DISJOINT (per-group token vocabulary):
    # a shared base text would make every hot doc a near-dup of every
    # other hot doc at any sane Jaccard threshold — one giant clique
    # again, exactly the quadratic-answer shape the groups exist to
    # avoid — while within-group docs stay byte-identical (hot digests)
    group_texts = [" ".join(f"grp{g}tok{i}" for i in range(45))
                   for g in range(FULL_DOC_GROUPS)]
    hot_rows = rng.permutation(n)[:hot_n]
    texts = doc.column("text").to_pylist()
    for i, row in enumerate(hot_rows):
        texts[row] = group_texts[i % FULL_DOC_GROUPS]
    text = pa.array(texts, pa.string())
    doc = replace(doc, "text", text)
    doc = replace(doc, "n_chars",
                  pc.cast(pc.utf8_length(text), pa.int64()))
    _write(out_dir, "documents", doc)

    emb = read("embeddings")
    n = emb.num_rows
    hot_n = int(n * HOT_DOC_RATE)
    vecs = emb.column("embedding").combine_chunks()
    dim = len(vecs[0])
    flat = np.array(vecs.flatten(), dtype=np.float32).reshape(n, dim)
    protos = flat[:FULL_DOC_GROUPS].copy()
    hot_rows = rng.permutation(n)[:hot_n]
    flat[hot_rows] = protos[np.arange(hot_n) % FULL_DOC_GROUPS]
    value_type = emb.schema.field("embedding").type.value_type
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.reshape(-1), type=value_type), dim) \
        if pa.types.is_fixed_size_list(emb.schema.field("embedding").type) \
        else pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
            pa.array(flat.reshape(-1), type=value_type))
    _write(out_dir, "embeddings", replace(emb, "embedding", arr))
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "testdata_skew"
    if "--full-from" in sys.argv:
        src = sys.argv[sys.argv.index("--full-from") + 1]
        print(generate_full(out, src))
        sys.exit(0)
    scale = 1
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
    print(generate(out, scale))
