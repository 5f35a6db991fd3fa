"""Emit a small-sf → big-sf scaling table (VERDICT r3 #1 / r6 #2
evidence): per query, seconds at both scales and the runtime ratio
against the 10x data ratio.

Usage:
    python scripts/scale_table.py bench_sf01.json bench_sf1.json > tbl.md
    python scripts/scale_table.py --sweep sf1.json sf10.json > tbl.md

The default mode reads bench.py outputs ({"queries": {name: sec}});
--sweep reads oracle_sweep.py outputs and uses each query's spark_sec —
the sf1→sf10 heavy-family rung is measured through the sweep so the
timing AND the correctness evidence come from the same runs.
"""

from __future__ import annotations

import json
import sys

DATA_RATIO = 10.0


def _load(path: str, sweep: bool) -> dict:
    with open(path) as f:
        d = json.load(f)
    if not sweep:
        return d["queries"]
    # only completed runs: an ERROR'd query still records its
    # time-until-crash, which must not masquerade as a scaling ratio
    ok = ("pass", "rows-only", "oracle-timeout")
    return {n: r["spark_sec"] for n, r in d["results"].items()
            if r.get("spark_sec") is not None and r.get("status") in ok}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sweep"]
    sweep = "--sweep" in sys.argv
    qs = _load(args[0], sweep)
    qb = _load(args[1], sweep)
    names = [n for n in qs if n in qb]
    lines = [
        "| query | sf0.1 s | sf1 s | runtime ratio | scaling |",
        "|---|---|---|---|---|",
    ]
    sublinear = linear = superlinear = 0
    for n in names:
        r = qb[n] / max(qs[n], 1e-9)
        if r <= DATA_RATIO * 0.8:
            verdict, mark = "sublinear", ""
            sublinear += 1
        elif r <= DATA_RATIO * 1.3:
            verdict, mark = "~linear", ""
            linear += 1
        else:
            verdict, mark = "SUPERLINEAR", " ⚠"
            superlinear += 1
        lines.append(f"| {n} | {qs[n]:.3f} | {qb[n]:.3f} | "
                     f"{r:.1f}x{mark} | {verdict} |")
    tot_s = sum(qs[n] for n in names)
    tot_b = sum(qb[n] for n in names)
    lines += [
        "",
        f"Common subset ({len(names)} queries): {tot_s:.1f} s at sf0.1 → "
        f"{tot_b:.1f} s at sf1 = {tot_b / tot_s:.1f}x runtime for "
        f"{DATA_RATIO:.0f}x data.  "
        f"{sublinear} sublinear / {linear} ~linear / "
        f"{superlinear} superlinear.",
    ]
    print("\n".join(lines))


if __name__ == "__main__":
    main()
