"""Ground-truth diagnosis of loop closure at reference scale.

Wraps LoopCloser._solve_graph during a vo_lc run over the cached synthetic
KITTI-00 feed and records, for every accepted closure:

  - keyframe-set translation error vs GT BEFORE and AFTER the graph solve
    (does the solve move the archive toward or away from truth?);
  - the newest loop edge's measurement error: Z_meas vs the GT relative
    pose between the two keyframes (is the verification accurate?).

Separates "the loop measurement is wrong" from "the graph distributes the
correction wrongly" (VERDICT r4: first run with loops_closed > 0 showed
vo_lc ATE 1.91 m vs vo 1.74 m).

Usage: python tools/diag_lc.py [--frames 4500] [--landmarks 54000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--landmarks", type=int, default=54000)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from longrun import load_or_render

    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import kitti
    from vo_tpu.odometry import runner
    from vo_tpu.slam import loop_closure as lc_mod

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    gt = kitti.read_poses("/root/reference/kitti/poses/00.txt")[: args.frames]
    pre = load_or_render(calib, gt, args.frames, args.landmarks, noise=args.noise)

    events = []
    orig = lc_mod.LoopCloser._solve_graph

    def patched(self):
        idxs = np.array([k.frame_idx for k in self.keyframes])
        before = np.stack([k.pose_c2w.copy() for k in self.keyframes])
        out = orig(self)
        if out is not None:
            after = np.stack([k.pose_c2w.copy() for k in self.keyframes])
            a, b, Z = self.loop_edges[-1]
            events.append((idxs, before, after, (self.keyframes[a].frame_idx, self.keyframes[b].frame_idx, np.asarray(Z))))
        return out

    lc_mod.LoopCloser._solve_graph = patched
    try:
        res = runner.run_sequence(pre, PipelineConfig(), n_frames=args.frames, use_loop_closure=True)
    finally:
        lc_mod.LoopCloser._solve_graph = orig

    a = metrics.ate(res.poses, gt)
    print(json.dumps(dict(ate=round(a["rmse"], 4), ate_max=round(a["max"], 4), **res.refine_stats)))
    for idxs, before, after, (fa, fb, Z) in events:
        g = gt[np.clip(idxs, 0, gt.shape[0] - 1)]
        eb = np.linalg.norm(before[:, :3, 3] - g[:, :3, 3], axis=1)
        ea = np.linalg.norm(after[:, :3, 3] - g[:, :3, 3], axis=1)
        Z_gt = np.linalg.inv(gt[fa]) @ gt[fb]
        dz = np.linalg.norm(np.asarray(Z)[:3, 3] - Z_gt[:3, 3])
        print(
            json.dumps(
                dict(
                    loop=(int(fa), int(fb)),
                    z_err_m=round(float(dz), 3),
                    kf_rms_before=round(float(np.sqrt((eb**2).mean())), 3),
                    kf_rms_after=round(float(np.sqrt((ea**2).mean())), 3),
                    kf_max_before=round(float(eb.max()), 3),
                    kf_max_after=round(float(ea.max()), 3),
                )
            )
        )


if __name__ == "__main__":
    main()
