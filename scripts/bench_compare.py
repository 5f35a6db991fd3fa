"""Regenerate BENCH_COMPARE.md: per-query comparison of every BENCH_r*.json
(plus an optional local run passed as argv[1]) so a round-over-round swing
can be attributed — uniform swings across unchanged plans = environment,
single-query swings = plan regression (VERDICT r2 "bench hygiene").

Usage:  python scripts/bench_compare.py [local_bench.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE_BAND = 1.3  # ratios inside [1/band, band] are within environmental noise
# a flag additionally requires the absolute regression to clear BOTH the
# query's own measured run-to-run MAD (x3) and a floor absorbing constant
# scheduling overhead — sub-second queries jitter tens of ms per run, so a
# pure ratio test flags unchanged plans (VERDICT r3 #6)
MAD_MULT = 3.0
ABS_FLOOR_SEC = 0.2


def main() -> None:
    rounds: list[tuple[str, dict]] = []
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        with open(p) as f:
            data = json.load(f)
        # driver files wrap the bench line under "parsed"; a failed driver
        # parse leaves parsed=null with only a truncated "tail" — skip it
        data = data.get("parsed") or data
        if not data.get("queries"):
            print(f"skipping {p}: no parsed per-query timings",
                  file=sys.stderr)
            continue
        rounds.append((os.path.basename(p).replace("BENCH_", "")
                       .replace(".json", ""), data))
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            rounds.append(("local", json.load(f)))
    if not rounds:
        print("no BENCH_r*.json found", file=sys.stderr)
        sys.exit(1)

    labels = [lab for lab, _ in rounds]
    per_round = [d.get("queries", {}) for _, d in rounds]
    names = sorted({n for q in per_round for n in q})
    base_lab, base = labels[0], per_round[0]
    # min-to-min comparison: r1/r2 recorded best-of-2; newer files carry
    # queries_min next to the median so the ratio compares like with like
    last = rounds[-1][1].get("queries_min") or per_round[-1]
    last_mad = rounds[-1][1].get("queries_mad") or {}

    lines = [
        "# BENCH_COMPARE — per-query seconds by round",
        "",
        f"Stat: later rounds report the per-query MEDIAN of "
        f"{rounds[-1][1].get('runs_per_query', '?')} runs "
        "(bench.py); r1/r2 were best-of-2 MINIMUMS.  `ratio` therefore "
        f"compares the newest round's per-query MINIMUM against "
        f"{base_lab} (min-to-min; a median-to-min ratio would read "
        f"~1.5x high on a noisy box).  Ratios within ±{NOISE_BAND}x are "
        "treated as environmental noise (the box is shared; VERDICT r2 "
        "measured 2x swings on byte-identical plans).  A ⚠ flag now also "
        f"requires the absolute delta to exceed {MAD_MULT:.0f}x the "
        "query's own run-to-run MAD and a "
        f"{ABS_FLOOR_SEC:.1f} s floor (sub-second queries jitter tens of "
        "ms of constant overhead per run — a pure ratio test flags "
        "unchanged plans).  A flagged query whose plan changed is a real "
        "signal.",
        "",
        "| query | " + " | ".join(labels) + " | ratio |",
        "|---|" + "---|" * (len(labels) + 1),
    ]
    common_base = common_last = 0.0
    flagged: list[str] = []
    for n in names:
        cells = []
        for q in per_round:
            cells.append(f"{q[n]:.3f}" if n in q else "—")
        ratio = ""
        if n in base and n in last:
            r = last[n] / max(base[n], 1e-9)
            common_base += base[n]
            common_last += last[n]
            ratio = f"{r:.2f}x"
            delta = last[n] - base[n]
            noise_floor = max(MAD_MULT * last_mad.get(n, 0.0),
                              ABS_FLOOR_SEC)
            if r > NOISE_BAND and delta > noise_floor:
                ratio += " ⚠"
                flagged.append(n)
        lines.append(f"| {n} | " + " | ".join(cells) + f" | {ratio} |")

    if common_base:
        lines += [
            "",
            f"Common-subset total: {base_lab} {common_base:.2f} s → "
            f"{labels[-1]} {common_last:.2f} s "
            f"(= {common_last / common_base:.2f}x).",
            f"Queries above the {NOISE_BAND}x band: "
            + (", ".join(flagged) if flagged else "none") + ".",
        ]
    newest = rounds[-1][1]
    env_bits = []
    if newest.get("cpu_steal_pct") is not None:
        env_bits.append(f"hypervisor CPU steal during the run: "
                        f"{newest['cpu_steal_pct']}%")
    sp = newest.get("run_spread")
    if sp:
        vals = sorted(sp.values())
        env_bits.append(
            f"within-loop max/min spread across {len(sp)} queries: "
            f"median {vals[len(vals) // 2]:.2f}x, worst {vals[-1]:.2f}x")
    if env_bits:
        lines += [
            "",
            "## Environment during the newest run",
            "",
            "The box is a shared VM; measured mid-bench steal of 10-30% "
            "and back-to-back identical-code totals differing 2x have "
            "been observed, so cross-round ratios are attributable only "
            "when these indicators are low:",
            "",
            *[f"- {b}" for b in env_bits],
        ]
    out = os.path.join(ROOT, "BENCH_COMPARE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(names)} queries, "
          f"{len(flagged)} above the noise band")


if __name__ == "__main__":
    main()
