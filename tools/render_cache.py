"""Parallel rasterization of the synthetic-feed frame cache.

The synthetic renderer (vo_tpu.io.synthetic) is host-side numpy and strictly
per-frame, so long-sequence caches (bench.preload_cached layout) parallelize
trivially across processes: each worker renders a strided slice of the frame
range and writes a part file; --merge assembles the final npz at the exact
path preload_cached expects, after which longrun.py / bigrun.py hit the
cache. At the reference scale (4,541 poses, README.md:43-46) a single
process takes ~40-60 min; two workers on this 2-core host halve that.

Usage (two workers + merge):
  python tools/render_cache.py --frames 4500 --landmarks 54000 --noise 0.02 \
      --offset 0 --stride 2 --part /tmp/part0.npz &
  python tools/render_cache.py --frames 4500 --landmarks 54000 --noise 0.02 \
      --offset 1 --stride 2 --part /tmp/part1.npz &
  wait
  python tools/render_cache.py --frames 4500 --landmarks 54000 --noise 0.02 \
      --merge /tmp/part0.npz /tmp/part1.npz
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_seq(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vo_tpu.io import kitti, synthetic

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from longrun import out_and_back_poses

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    if args.traj == "full":
        poses = kitti.read_poses("/root/reference/kitti/poses/00.txt")[: args.frames]
    else:
        poses = out_and_back_poses(args.frames)
    seq = synthetic.SyntheticSequence(
        calib, poses, n_landmarks=args.landmarks, seed=args.seed, noise=args.noise
    )
    return seq, poses


def quant(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, required=True)
    ap.add_argument("--landmarks", type=int, required=True)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--traj", choices=("full", "outback"), default="full")
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--part", default=None, help="write this worker's strided slice here")
    ap.add_argument("--merge", nargs="*", default=None, help="part files to merge into the cache")
    args = ap.parse_args()

    seq, poses = build_seq(args)
    nz = "" if args.noise == 0.0 else f"_n{args.noise:g}"
    cache = f"/tmp/longrun_frames_v4_{args.frames}_{args.landmarks}_{args.seed}{nz}.npz"

    if args.merge:
        if os.path.exists(cache):
            # The cache name does not encode --traj; refuse to clobber a
            # cache rendered from DIFFERENT poses (e.g. a full-trajectory
            # render vs an out-and-back with identical frame/landmark
            # counts) — preload_cached would reject it anyway, after the
            # hour-long render was already destroyed.
            z = np.load(cache)
            if "poses" in z and (z["poses"].shape != poses.shape or not np.allclose(z["poses"], poses)):
                raise SystemExit(
                    f"refusing to overwrite {cache}: existing cache was rendered "
                    "from different poses (--traj mismatch?); delete it explicitly"
                )
        H, W = seq.H, seq.W
        L = np.zeros((args.frames, H, W), np.uint8)
        R = np.zeros((args.frames, H, W), np.uint8)
        seen = np.zeros(args.frames, bool)
        for p in args.merge:
            z = np.load(p)
            idx = z["idx"]
            L[idx] = z["l"]
            R[idx] = z["r"]
            seen[idx] = True
        assert seen.all(), f"missing frames: {np.flatnonzero(~seen)[:10]}"
        np.savez(cache, l=L, r=R, poses=poses)
        print("merged ->", cache, flush=True)
        return

    idx = np.arange(args.offset, args.frames, args.stride)
    Ls, Rs = [], []
    t0 = time.perf_counter()
    for j, i in enumerate(idx):
        l, r = seq.frame(int(i))
        Ls.append(quant(l))
        Rs.append(quant(r))
        if j % 200 == 199:
            dt = time.perf_counter() - t0
            print(f"# worker {args.offset}: {j + 1}/{idx.size} frames, {dt:.0f}s", flush=True)
    np.savez(args.part, idx=idx, l=np.stack(Ls), r=np.stack(Rs))
    print(f"# worker {args.offset}: done {idx.size} frames in {time.perf_counter() - t0:.0f}s -> {args.part}", flush=True)


if __name__ == "__main__":
    main()
