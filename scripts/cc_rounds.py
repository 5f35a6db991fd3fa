"""Measure connected-components per-round edge volume and wall-clock at
a given fixture (VERDICT r6 #4 evidence: the edge-contraction change
must make per-round shuffle volume DECAY, and cut dedup_clusters
wall-clock at sf1).

Usage: python scripts/cc_rounds.py [sf_dir] [--threshold 0.6]
                                   [--pairs prefix|lsh]
``--pairs lsh`` feeds the components from the MinHash-LSH banded pair
generator instead of the Bayardo prefix join — the fixture-shape-robust
path (VERDICT r7 #2: the prefix join is candidate-quadratic on the
uniform-vocabulary synthetic fixture, so the sf10 cluster-pipeline
evidence runs through LSH).
Prints one JSON line: {"sf_dir", "wall_sec", "n_rows", "rounds":
[{"round", "edges", "changed"}, ...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkapps_spark.operators import dedup
from flinkapps_spark.plans.pipeline_queries import _augment_near
from flinkapps_spark.session import get_spark
from flinkapps_spark.sources.batch import load_table
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    threshold = 0.6
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    pair_gen = "prefix"
    if "--pairs" in sys.argv:
        pair_gen = sys.argv[sys.argv.index("--pairs") + 1]
    if pair_gen not in ("prefix", "lsh"):
        # a typo silently falling back to the prefix path would produce
        # misleading scaling evidence (ADVICE r8)
        sys.exit(f"--pairs must be 'prefix' or 'lsh', got {pair_gen!r}")
    spark = get_spark("cc-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _augment_near(load_table(spark, sf_dir, "documents"))
    t0 = time.perf_counter()
    if pair_gen == "lsh":
        pairs = dedup.minhash_lsh_pairs(docs, threshold=threshold) \
            .select("doc_a", "doc_b")
    else:
        pairs = dedup.jaccard_pairs(docs, threshold=threshold) \
            .select("doc_a", "doc_b")
    nodes = docs.select(F.col("doc_id").alias("node"))
    stats: list = []
    out = dedup.connected_components(nodes, pairs, round_stats=stats)
    n = out.count()
    wall = time.perf_counter() - t0
    print(json.dumps({"sf_dir": sf_dir, "wall_sec": round(wall, 2),
                      "n_rows": n, "rounds": stats}))
    spark.stop()


if __name__ == "__main__":
    main()
