"""Time named catalog queries with the bench methodology (noop sink,
median of N runs) without running the whole headline set — the
re-measure loop for optimization work (guide §1.6).

Usage:
    python scripts/time_queries.py --names a,b,c [--runs 3]
        [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from flinkapps_spark.plans import catalog  # noqa: E402
from flinkapps_spark.session import free_session_state, get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("flinkapps-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    # same warm-up as bench.py
    reg["flagship_filter_project"].build(spark, args.sf_dir) \
        .write.format("noop").mode("overwrite").save()
    (spark.range(256).repartition(64)
     .mapInPandas(lambda it: it, schema="id long")
     .write.format("noop").mode("overwrite").save())

    free_session_state(spark)  # same between-run hygiene as bench.py
    out = {}
    for name in args.names.split(","):
        name = name.strip()
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = reg[name].build(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            del df  # fire the result's self-cleaning finalizer here,
            # outside the timed window (same as bench.py)
            free_session_state(spark)
        runs.sort()
        out[name] = {"median": runs[len(runs) // 2], "runs": runs}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
