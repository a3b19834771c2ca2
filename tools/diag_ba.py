"""Per-solve ground-truth diagnosis of window BA (VERDICT r2 item 1).

For every BA solve on the synthetic out-and-back sequence this logs, using
the known GT poses:

  - window-relative error of each keyframe (pose relative to the window's
    anchored first keyframe, compared to GT relative) BEFORE and AFTER the
    solve — isolates whether the *solver* improves or degrades the window,
    independent of inherited absolute drift;
  - the absolute error of the last keyframe before/after;
  - solve cost0 -> cost and n_obs.

If after-rel-error > before-rel-error consistently, the solve itself is at
fault (observation bias / mis-association / model mismatch). If the solver
improves windows yet the final trajectory is worse, the correction
application path (refiner pop_delta / reanchoring) is at fault.

Usage: python tools/diag_ba.py [--frames 200] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rel_err(Ta: np.ndarray, Tb: np.ndarray) -> tuple[float, float]:
    """(translation m, rotation deg) of Ta vs Tb."""
    D = np.linalg.inv(Tb) @ Ta
    dt = float(np.linalg.norm(D[:3, 3]))
    c = np.clip((np.trace(D[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
    return dt, float(np.degrees(np.arccos(c)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--landmarks", type=int, default=9000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--half", action="store_true", help="half-resolution frames (fast CPU diagnosis)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import kitti
    from vo_tpu.odometry import ba_runner, runner

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from longrun import load_or_render, out_and_back_poses

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    poses = out_and_back_poses(args.frames)
    pre = load_or_render(calib, poses, args.frames, args.landmarks,
                         image_size=(188, 620) if args.half else None)

    # GT in the runner's frame (estimate chains from identity at frame 0).
    G0inv = np.linalg.inv(poses[0])
    gt_runner = np.einsum("ij,tjk->tik", G0inv, poses)

    orig_opt = ba_runner.WindowedBA.optimize
    log = []

    def patched(self):
        kfs = list(self.window)
        before = {kf.frame_idx: kf.pose_c2w.copy() for kf in kfs}
        res = orig_opt(self)
        row = dict(kf=int(kfs[-1].frame_idx), solved=res is not None)
        if res is not None:
            lr = self.last_result
            row.update(
                cost0=round(float(lr.cost0), 1),
                cost=round(float(lr.cost), 1),
                n_obs=int(lr.n_obs),
            )
            # Window-relative errors: pose of kf k relative to window anchor.
            anchor = kfs[0].frame_idx
            for tag, get in (
                ("before", lambda kf: before[kf.frame_idx]),
                ("after", lambda kf: kf.pose_c2w),
            ):
                A0 = get(kfs[0])
                G0 = gt_runner[anchor]
                errs_t, errs_r = [], []
                for kf in kfs[1:]:
                    rel_est = np.linalg.inv(A0) @ get(kf)
                    rel_gt = np.linalg.inv(G0) @ gt_runner[kf.frame_idx]
                    dt, dr = rel_err(rel_est, rel_gt)
                    errs_t.append(dt)
                    errs_r.append(dr)
                row[f"rel_t_{tag}"] = round(float(np.mean(errs_t)), 4)
                row[f"rel_r_{tag}"] = round(float(np.mean(errs_r)), 4)
                row[f"rel_t_last_{tag}"] = round(errs_t[-1], 4)
            # Absolute last-keyframe error before/after.
            gL = gt_runner[kfs[-1].frame_idx]
            row["abs_t_before"] = round(rel_err(before[kfs[-1].frame_idx], gL)[0], 4)
            row["abs_t_after"] = round(rel_err(kfs[-1].pose_c2w, gL)[0], 4)
        log.append(row)
        return res

    ba_runner.WindowedBA.optimize = patched
    try:
        cfg = PipelineConfig()
        res = runner.run_sequence(pre, cfg, n_frames=args.frames, use_ba=True)
    finally:
        ba_runner.WindowedBA.optimize = orig_opt

    n_improved = n_degraded = 0
    for row in log:
        if row.get("solved"):
            if row["rel_t_after"] < row["rel_t_before"]:
                n_improved += 1
            else:
                n_degraded += 1
        print(json.dumps(row), flush=True)
    a = metrics.ate(res.poses, poses)
    print(
        json.dumps(
            dict(
                ate_rmse=round(a["rmse"], 4),
                ate_max=round(a["max"], 4),
                solves_improving_window=n_improved,
                solves_degrading_window=n_degraded,
                **res.refine_stats,
            )
        )
    )


if __name__ == "__main__":
    main()
