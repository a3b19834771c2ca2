"""Measure persistent-track-id survival across keyframes (BA observability)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--every", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _Preloaded
    from vo_tpu.config import PipelineConfig
    from vo_tpu.io import synthetic
    from vo_tpu.odometry.pipeline import init_state, make_jitted_step

    seq = synthetic.kitti_synthetic_sequence(n_frames=args.frames, n_landmarks=6000, seed=0)
    pre = _Preloaded(seq, args.frames)
    cfg = PipelineConfig()
    step = make_jitted_step(seq.calib, cfg)
    state = init_state(cfg)
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    snaps = []
    for i in range(args.frames):
        l, r = pre.frame(i)
        key, sub = jax.random.split(key)
        state, out = step(state, jnp.asarray(l), jnp.asarray(r), sub)
        if i % args.every == 0:
            ids = np.asarray(state.prev.ids)
            msk = np.asarray(state.prev.mask)
            snaps.append((i, set(int(t) for t in ids[msk & (ids >= 0)])))

    for j in range(1, len(snaps)):
        i0, s0 = snaps[j - 1]
        i1, s1 = snaps[j]
        print(
            f"frame {i0:3d}->{i1:3d}: |prev|={len(s0):4d} |cur|={len(s1):4d} "
            f"overlap={len(s0 & s1):4d} ({100.0 * len(s0 & s1) / max(len(s0), 1):.0f}%)"
        )
    # survival over 5 and 10 frames
    for gap in (5, 10):
        tot, surv = 0, 0
        for j in range(len(snaps) - gap):
            s0 = snaps[j][1]
            sg = snaps[j + gap][1]
            tot += len(s0)
            surv += len(s0 & sg)
        if tot:
            print(f"{gap}-frame id survival: {100.0 * surv / tot:.1f}%")


if __name__ == "__main__":
    main()
