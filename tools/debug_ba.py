"""Diagnose BA divergence on the out-and-back synthetic sequence.

Logs, per BA solve: cost0 -> cost, the translation norm of the last-keyframe
correction, and the drift of the corrected keyframe poses vs GT.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _Preloaded
    from longrun import out_and_back_poses
    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import kitti, synthetic
    from vo_tpu.odometry import ba_runner, runner

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    poses = out_and_back_poses(args.frames)
    seq = synthetic.SyntheticSequence(calib, poses, n_landmarks=9000, seed=0)
    cache = f"/tmp/longrun_frames_{args.frames}_9000.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        pre = _Preloaded.__new__(_Preloaded)
        pre.calib = seq.calib
        pre.gt_poses = seq.gt_poses
        pre.frames = [(z["l"][i], z["r"][i]) for i in range(args.frames)]
    else:
        pre = _Preloaded(seq, args.frames)
        np.savez(cache, l=np.stack([f[0] for f in pre.frames]), r=np.stack([f[1] for f in pre.frames]))

    orig_opt = ba_runner.WindowedBA.optimize
    log = []

    def patched(self):
        old_last = self.window[-1].pose_c2w.copy()
        res = orig_opt(self)
        if res is not None:
            T_new, corr = res
            dt = float(np.linalg.norm(corr[:3, 3]))
            ang = float(
                np.degrees(
                    np.arccos(np.clip((np.trace(corr[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
                )
            )
            lr = self.last_result
            log.append(
                dict(
                    kf=int(self.window[-1].frame_idx),
                    cost0=float(lr.cost0),
                    cost=float(lr.cost),
                    n_obs=int(lr.n_obs),
                    dT=round(dt, 4),
                    dR_deg=round(ang, 4),
                    old_t=np.round(old_last[:3, 3], 2).tolist(),
                    new_t=np.round(self.window[-1].pose_c2w[:3, 3], 2).tolist(),
                )
            )
        return res

    ba_runner.WindowedBA.optimize = patched
    cfg = PipelineConfig()
    res = runner.run_sequence(pre, cfg, n_frames=args.frames, use_ba=True)
    ba_runner.WindowedBA.optimize = orig_opt

    for row in log:
        print(row, flush=True)
    a = metrics.ate(res.poses, poses)
    print("ATE", a["rmse"], "max", a["max"], res.refine_stats)


if __name__ == "__main__":
    main()
