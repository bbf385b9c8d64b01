"""Scaling-efficiency evidence (north rule: throughput scaling efficiency
>= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so per the round instructions we
run the identical job at two parallelism levels — local[8] (N) and
local[32] (4N) — on the same input and report throughput at both plus
efficiency = (T_N / T_4N) / 4 ... strictly: speedup / 4.

Each level runs in a fresh subprocess (a JVM cannot change master), using
bench.py's headline suite. Results land in BENCH.md.

Usage: python bench/scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n, four_n = 8, 32
    r_n = run_level(n, sf_dir)
    r_4n = run_level(four_n, sf_dir)

    # scaling on the parallel-heavy stages (build + big spatial join);
    # the full-suite number includes driver-bound stages and is reported too
    heavy = ["build_lineitem", "spatial_join_big"]
    t_n_heavy = sum(r_n["queries"][q] for q in heavy)
    t_4n_heavy = sum(r_4n["queries"][q] for q in heavy)
    speedup_heavy = t_n_heavy / t_4n_heavy
    eff_heavy = speedup_heavy / (four_n / n)
    speedup_total = r_n["value"] / r_4n["value"]
    eff_total = speedup_total / (four_n / n)

    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Input: `{sf_dir}` (same input at both levels; fresh JVM each).",
        "In-sandbox stand-in for N vs 4N executors per the round rules:",
        f"`local[{n}]` (N) vs `local[{four_n}]` (4N), fixed data, fixed code.",
        "",
        "| stage | local[8] sec | local[32] sec | speedup | efficiency vs 4x |",
        "|---|---|---|---|---|",
    ]
    for q in r_n["queries"]:
        tn, t4 = r_n["queries"][q], r_4n["queries"][q]
        sp = tn / t4 if t4 else float("nan")
        lines.append(f"| {q} | {tn:.2f} | {t4:.2f} | {sp:.2f}x | {sp/4:.2f} |")
    lines += [
        f"| **heavy stages (build+join)** | {t_n_heavy:.2f} | {t_4n_heavy:.2f} | "
        f"{speedup_heavy:.2f}x | **{eff_heavy:.2f}** |",
        f"| **full suite** | {r_n['value']:.2f} | {r_4n['value']:.2f} | "
        f"{speedup_total:.2f}x | {eff_total:.2f} |",
        "",
        f"Throughput (build): {r_n['extras']['build_boxes_per_sec']:.0f} boxes/s @N, "
        f"{r_4n['extras']['build_boxes_per_sec']:.0f} boxes/s @4N.",
        f"Throughput (spatial join): {r_n['extras']['spatial_join_rows_per_sec']:.0f} rows/s @N, "
        f"{r_4n['extras']['spatial_join_rows_per_sec']:.0f} rows/s @4N.",
        "",
        "Reference context: the C++ reference's own parallel build speedup is",
        "1.08x at 4 threads (6.4% efficiency at 16) — see BASELINE.md; the",
        "distributed design exists precisely to fix that axis.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r_n),
        json.dumps(r_4n),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:20]))
    print(f"heavy-stage efficiency: {eff_heavy:.3f}")


if __name__ == "__main__":
    main()
