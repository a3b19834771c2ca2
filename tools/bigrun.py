"""Reference-scale evaluation: the FULL KITTI 00 trajectory (4,541 poses).

The reference's entire published evidence is drift over 4,500 real frames
(/root/reference/4500/error.png, README.md:43-46). This runs the synthetic
KITTI-00-geometry feed over the complete seq-00 GT trajectory — all loops,
same scale — through the production configs, exercising:

  - the LoopCloser decimation regime (908 keyframes at keyframe_every=5
    vs max_keyframes=512 -> decimation fires, slam/loop_closure.py),
  - the landmark store at reference scale,
  - multi-hour drift behavior of VO vs VO+BA+closure,

and writes BIGRUN_r{N}.json plus an error-vs-time curve figure directly
comparable to the reference's 4500/error.png (viz.figures.error_curve).

Usage: python tools/bigrun.py [--frames 4500] [--out BIGRUN_r03.json]
       [--configs vo,vo_lc,vo_ba_lc] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALL_CONFIGS = {
    "vo": dict(use_ba=False, use_loop_closure=False),
    "vo_lc": dict(use_ba=False, use_loop_closure=True),
    "vo_ba": dict(use_ba=True, use_loop_closure=False),
    "vo_ba_lc": dict(use_ba=True, use_loop_closure=True),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--landmarks", type=int, default=None, help="default ~12 per GT pose")
    ap.add_argument("--noise", type=float, default=0.02, help="sensor noise stddev ([0,1] units)")
    ap.add_argument(
        "--extra-noise", type=float, default=0.0,
        help="additional load-time sensor noise on the cached frames "
        "(feed-severity calibration, VERDICT r5 item 1)",
    )
    ap.add_argument("--save-traj", action="store_true", help="save each config's poses npz under fig-dir")
    ap.add_argument(
        "--full-figures", action="store_true",
        help="also dump the reference's view/3d_map figures at the final frame "
        "(mirrors 4500/{view,map,error,3d_map}.png, README.md:43-46)",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--configs", default="vo,vo_lc,vo_ba_lc")
    ap.add_argument("--fig-dir", default="figs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--host-frames",
        action="store_true",
        help="feed frames from host per frame instead of pre-staging in HBM",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from longrun import load_or_render  # noqa: E402 (tools/ sibling)

    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import kitti
    from vo_tpu.odometry import runner
    from vo_tpu.viz import figures

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    gt = kitti.read_poses("/root/reference/kitti/poses/00.txt")[: args.frames]
    times = kitti.read_times("/root/reference/kitti/00/times.txt")[: args.frames]
    n = gt.shape[0]
    # ~12/pose keeps per-frame in-horizon splat counts near the 600-frame
    # matrix's (the z_far=100 m visibility horizon bounds the rest); 30/pose
    # with no horizon rendered at 3.6-25 s/frame — a 10 h rasterization.
    n_lm = args.landmarks if args.landmarks else 12 * n
    pre = load_or_render(calib, gt, n, n_lm, noise=args.noise, extra_noise=args.extra_noise)
    pre.times = times
    if not args.host_frames and not args.cpu:
        # One-time HBM staging outside every timed loop (bench.stage_frames_hbm
        # docstring: removes the tunnel-bandwidth artifact; ~4.2 GB of 16 GB
        # HBM at 4,500 stereo pairs).
        import time as _time

        from bench import stage_frames_hbm

        t0 = _time.perf_counter()
        stage_frames_hbm(pre)
        print(f"# staged {n} frame pairs in HBM in {_time.perf_counter() - t0:.1f}s", flush=True)

    cfg = PipelineConfig()
    os.makedirs(args.fig_dir, exist_ok=True)
    results = {}
    feed_severity = dict(
        noise=args.noise, extra_noise=args.extra_noise,
        effective_sigma=round((args.noise**2 + args.extra_noise**2) ** 0.5, 4),
        n_landmarks=n_lm,
    )
    for name in args.configs.split(","):
        kw = dict(ALL_CONFIGS[name.strip()])
        viz_kw = {}
        if args.full_figures and name.strip() == "vo":
            # One figure dump at the final frame: the reference's four views
            # at reference scale (copied to figs/{view,3d_map}_<n>.png).
            viz_kw = dict(viz_every=n - 1, viz_dir=os.path.join(args.fig_dir, "_frames"))
        res = runner.run_sequence(pre, cfg, n_frames=n, **kw, **viz_kw)
        a = metrics.ate(res.poses, gt)
        xz = metrics.xz_error(res.poses, gt)
        results[name] = dict(
            frames_per_sec=round(res.frames_per_sec, 2),
            per_frame_ms=round(res.per_frame_ms, 2),
            ate_rmse_m=round(a["rmse"], 4),
            ate_max_m=round(a["max"], 4),
            xz_mean_m=round(float(xz.mean()), 4),
            xz_max_m=round(float(xz.max()), 4),
            pose_ok_frac=round(float(res.pose_ok.mean()), 4),
            tracks_mean=round(float(res.n_tracks.mean()), 1),
            inliers_mean=round(float(res.n_inliers.mean()), 1),
            **{k: v for k, v in res.refine_stats.items()},
        )
        print(name, json.dumps(results[name]), flush=True)
        # The reference-comparable artifacts (4500/{error,map}.png).
        figures.error_curve(
            xz, times[1 : 1 + xz.shape[0]], path=os.path.join(args.fig_dir, f"error_{name}.png")
        )
        figures.trajectory_map(
            res.poses, gt, path=os.path.join(args.fig_dir, f"map_{name}.png")
        )
        if args.save_traj:
            np.savez_compressed(
                os.path.join(args.fig_dir, f"traj_{name}.npz"), poses=res.poses, gt=gt
            )
        if name.strip() == "vo":
            # Apples-to-apples drift overlay vs the digitized published curve.
            ref_csv = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "REFERENCE_ERROR_CURVE.csv",
            )
            if os.path.exists(ref_csv):
                figures.error_parity(
                    xz, times[1 : 1 + xz.shape[0]], ref_csv,
                    path=os.path.join(args.fig_dir, "error_parity.png"),
                )
        if args.full_figures and name.strip() == "vo":
            import shutil

            src = os.path.join(args.fig_dir, "_frames", str(n - 1))
            for fig_name in ("view", "3d_map"):
                f = os.path.join(src, f"{fig_name}.png")
                if os.path.exists(f):
                    shutil.copy(f, os.path.join(args.fig_dir, f"{fig_name}_{n}.png"))

    payload = dict(
        n_frames=n,
        n_landmarks=n_lm,
        feed_severity=feed_severity,
        noise=args.noise,
        trajectory="full KITTI 00 GT trajectory (all loops)",
        reference_anchor="4500/error.png: ~41 m max xz error, mean ~13-15 m at frame 4500",
        device=str(jax.devices()[0].platform),
        device_kind=str(getattr(jax.devices()[0], "device_kind", "?")),
        configs=results,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
            f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
