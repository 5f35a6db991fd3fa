"""Capture .explain("formatted") output for named catalog queries into
plans/r09/<name>_<tag>.txt — the before/after plan evidence for the
optimization rounds (guide §1: measure first; §7.2: read the plan).

Usage:
    python scripts/capture_plans.py --tag before --names q1,q2 \
        [--sf-dir /root/testdata/sf0.1]

Streaming queries execute their micro-batches during build; the captured
plan is the plan of the RETURNED frame (for foreachBatch queries that is
the converged result, so the interesting inner plans are discussed in
OPTIMIZATION_r09.md instead).
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from flinkapps_spark.plans import catalog  # noqa: E402
from flinkapps_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=os.path.join(ROOT, "plans", "r09"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("flinkapps-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    for name in args.names.split(","):
        name = name.strip()
        df = reg[name].build(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
