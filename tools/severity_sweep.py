"""Feed-severity calibration sweep (VERDICT r5 item 1).

The reference's published evidence is drift over 4,500 REAL KITTI frames
(~41 m max xz error, mean ~13-15 m; /root/reference/4500/error.png) while
the clean synthetic feed leaves plain VO near its noise floor (BIGRUN_r04
vo xz_max 3.39 m) — the accuracy comparison was not apples-to-apples.
Feed difficulty is a free parameter: this sweeps load-time ``extra_noise``
(bench.preload_cached) on a PREFIX of the already-rendered reference-scale
frame cache and reports plain-VO drift per severity level next to the
digitized reference curve at the same frame, so the severity for
BIGRUN_r05 can be chosen to land plain VO within ~2x of the published
envelope.

Usage: python tools/severity_sweep.py --frames 1500 --levels 0.05,0.1,0.15
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_prefix(cache: str, n: int, extra_noise: float, seed: int = 0):
    """bench._Preloaded over the first ``n`` frames of a rendered cache,
    with deterministic load-time sensor noise (same RNG streams as
    bench.preload_cached's _add_noise, so a sweep level here reproduces a
    full bigrun at the same --extra-noise exactly)."""
    from bench import _Preloaded

    z = np.load(cache)
    L, R = z["l"][:n], z["r"][:n]
    pre = _Preloaded.__new__(_Preloaded)
    pre.gt_poses = z["poses"][:n]
    frames = []
    s = 255.0 * extra_noise
    for i in range(n):
        l, r = L[i], R[i]
        if extra_noise > 0.0:
            rl = np.random.default_rng((seed, i, 2))
            rr = np.random.default_rng((seed, i, 3))
            l = (np.clip(l.astype(np.float32) + rl.normal(0.0, s, l.shape), 0.0, 255.0) + 0.5).astype(np.uint8)
            r = (np.clip(r.astype(np.float32) + rr.normal(0.0, s, r.shape), 0.0, 255.0) + 0.5).astype(np.uint8)
        frames.append((l, r))
    pre.frames = frames
    return pre


def reference_error_at(t: float, csv_path: str) -> float:
    ref = np.loadtxt(csv_path, delimiter=",", comments="#")
    return float(np.interp(t, ref[:, 0], ref[:, 1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1500)
    ap.add_argument("--levels", default="0.0,0.05,0.1,0.15")
    ap.add_argument("--cache", default="/tmp/longrun_frames_v4_4500_54000_0_n0.02.npz")
    ap.add_argument("--base-noise", type=float, default=0.02)
    ap.add_argument("--configs", default="vo")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import kitti
    from vo_tpu.odometry import runner

    from bench import stage_frames_hbm

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    times = kitti.read_times("/root/reference/kitti/00/times.txt")[: args.frames]
    ref_csv = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "REFERENCE_ERROR_CURVE.csv"
    )
    t_end = float(times[-1])
    ref_now = reference_error_at(t_end, ref_csv)
    cfg = PipelineConfig()
    print(f"# prefix {args.frames} frames (t={t_end:.0f}s); digitized reference xz "
          f"error there: {ref_now:.1f} m", flush=True)

    rows = []
    for lvl in (float(x) for x in args.levels.split(",")):
        pre = load_prefix(args.cache, args.frames, lvl)
        pre.calib = calib
        pre.times = times
        gt = pre.gt_poses
        stage_frames_hbm(pre)
        for name in args.configs.split(","):
            kw = dict(
                use_ba="ba" in name.split("_"), use_loop_closure="lc" in name.split("_")
            )
            res = runner.run_sequence(pre, cfg, n_frames=args.frames, **kw)
            xz = metrics.xz_error(res.poses, gt)
            a = metrics.ate(res.poses, gt)
            row = dict(
                config=name,
                extra_noise=lvl,
                effective_sigma=round((args.base_noise**2 + lvl**2) ** 0.5, 4),
                frames=args.frames,
                fps=round(res.frames_per_sec, 1),
                xz_mean_m=round(float(xz.mean()), 3),
                xz_max_m=round(float(xz.max()), 3),
                xz_final_m=round(float(xz[-1]), 3),
                ate_rmse_m=round(a["rmse"], 3),
                pose_ok_frac=round(float(res.pose_ok.mean()), 4),
                tracks_mean=round(float(res.n_tracks.mean()), 1),
                inliers_mean=round(float(res.n_inliers.mean()), 1),
                ref_xz_at_t=round(ref_now, 2),
            )
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
