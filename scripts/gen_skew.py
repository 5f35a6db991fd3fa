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


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "testdata_skew"
    scale = 1
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
    print(generate(out, scale))
