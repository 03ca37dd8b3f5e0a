"""Render RESULTS.md from a Phase-B summary file (results/*/summary.txt).

Each summary line is the dict printed by eorb_slam_tpu.apps.run_slam for one
(sequence, sensor-config) run: iterations, timing, tracker stats, and the
evaluation block (ATE/RPE per the reference's evaluate_ate_scale.py /
my_eval_ape.py protocol).

Usage: python tools/make_results.py results/r3/summary.txt > RESULTS.md
"""

from __future__ import annotations

import ast
import sys


def fmt(x, nd=3):
    return "—" if x is None else f"{x:.{nd}f}"


def main(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rows.append(ast.literal_eval(line))
            except Exception:
                continue

    print("# RESULTS — synthetic benchmark sequences (round 3)\n")
    print(
        "Full application path on the real TPU: dataset files on disk in\n"
        "the reference's EuRoC / EV-ETHZ layouts (rendered by\n"
        "`eorb_slam_tpu.io.synth_dataset` — no network in this environment;\n"
        "see BASELINE.md for why no in-repo reference numbers exist), loaded\n"
        "through `io/datasets.py` + the native parser, tracked by\n"
        "`apps/run_slam`, written as TUM trajectories, scored by `evals/`\n"
        "(Sim3 alignment for monocular, SE3 with scale FIXED at 1 for\n"
        "inertial runs — a metric-scale gate).\n"
    )
    print("| mode | sequence | frames/iters | tracked | lost | KFs (culled)"
          " | ATE RMSE [m] | APE % of path | RPE trans [m] | scale | ms/iter |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for d in rows:
        st = d.get("stats", {})
        ev = d.get("eval", {})
        ape = ev.get("ape_piecewise", {})
        mode = d.get("trajectory_file", "?").rsplit("_", 1)[-1].replace(
            ".txt", "")
        # stats may be nested for twin-map systems
        kf = st.get("kf", st.get("im", {}).get("kf") if isinstance(
            st.get("im"), dict) else None)
        lost = st.get("lost", st.get("im", {}).get("lost") if isinstance(
            st.get("im"), dict) else None)
        culled = st.get("kf_culled", st.get("im", {}).get("kf_culled", 0)
                        if isinstance(st.get("im"), dict) else 0)
        loops = st.get("loops", 0)
        extra = f" +{loops}loops" if loops else ""
        print(
            f"| {mode}{extra} | {d.get('sequence')} | {d.get('iterations')} "
            f"| {d.get('tracked_poses')} | {lost} | {kf} ({culled}) "
            f"| {fmt(ev.get('ate_rmse'))} | {fmt(ape.get('ape_pct'), 2)} "
            f"| {fmt(ev.get('rpe_trans_rmse'))} "
            f"| {fmt(ev.get('ate_scale'), 2)} "
            f"| {d.get('avg_track_ms', 0):.0f} |"
        )
    print()


if __name__ == "__main__":
    main(sys.argv[1])
