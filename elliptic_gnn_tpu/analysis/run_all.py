"""Run the full post-hoc analysis battery on a run dir in ONE process.

Each analysis CLI is standalone (matching the reference's layout), but on
environments where process startup / first device contact is expensive
(this TPU relay costs ~3 minutes per process), running them separately is
wasteful. This wrapper shares the process across:

  eval_by_time, calibration_plots, workload_curves, robustness,
  hub_ablation, explain-gnn, and the static report.

CLI: python -m elliptic_gnn_tpu.analysis.run_all --run_dir outputs/gnn/<run>
         [--drop_frac 0.1] [--noise_std 0.1] [--hub_frac 0.01]
         [--skip explain,robustness] [--outputs outputs]
"""
from __future__ import annotations

import argparse
import sys
import traceback


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", type=str, required=True)
    ap.add_argument("--drop_frac", type=float, default=0.1)
    ap.add_argument("--noise_std", type=float, default=0.0)
    ap.add_argument("--hub_frac", type=float, default=0.01)
    ap.add_argument("--k_max", type=int, default=5000)
    ap.add_argument("--explain_steps", type=int, default=200)
    ap.add_argument("--skip", type=str, default="",
                    help="comma-separated stage names to skip")
    ap.add_argument("--outputs", type=str, default="outputs")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}

    def stage(name, fn):
        if name in skip:
            print(f"[RUN_ALL] skip {name}")
            return
        print(f"[RUN_ALL] {name} ...")
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"[RUN_ALL] {name} FAILED (continuing)")

    from . import (
        calibration_plots,
        eval_by_time,
        report,
        workload_curves,
    )

    stage("eval_by_time", lambda: eval_by_time.main(args.run_dir))
    stage("calibration", lambda: calibration_plots.main(args.run_dir))
    stage("workload", lambda: workload_curves.main(args.run_dir, args.k_max))

    def _robustness():
        from . import robustness

        sys.argv = ["x", "--run_dir", args.run_dir,
                    "--drop_frac", str(args.drop_frac),
                    "--noise_std", str(args.noise_std)]
        robustness.main()

    stage("robustness", _robustness)

    def _hub():
        from . import hub_ablation

        sys.argv = ["x", "--run_dir", args.run_dir,
                    "--frac", str(args.hub_frac)]
        hub_ablation.main()

    stage("hub_ablation", _hub)

    def _explain():
        from . import explain

        explain.run_gnn(args.run_dir, steps=args.explain_steps)

    stage("explain", _explain)

    from pathlib import Path

    stage("report", lambda: report.render(
        Path(args.outputs), Path(args.outputs) / "report.html"
    ))
    print("[RUN_ALL] done")


if __name__ == "__main__":
    main()
