"""Multi-process bring-up smoke: init_distributed + one sharded solve.

The reference is a single MATLAB process (SURVEY §2.3); this is the
bring-up check for the engine's multi-HOST story: every process joins the
jax.distributed cluster, the global mesh spans all processes' devices, and
one hypothesis-sharded RANSAC solve runs with its all_gather winner
reduction crossing the process boundary. Each process prints one JSON line
with the resulting pose translation; a launcher (tests/test_multihost.py)
asserts the lines agree bit-for-bit — the collectives contract is that
every host ends with the SAME winner.

Run manually (two shells or one line):

  python -m vo_tpu.dist.multihost_smoke --processes 2 --process-id 0 --port 12631 &
  python -m vo_tpu.dist.multihost_smoke --processes 2 --process-id 1 --port 12631
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--port", type=int, default=12631)
    ap.add_argument("--coordinator", default="127.0.0.1")
    ap.add_argument("--hypotheses", type=int, default=256)
    args = ap.parse_args(argv)

    # CPU everywhere unless the caller configured TPU hosts.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if os.environ["JAX_PLATFORMS"] == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from .mesh import init_distributed, make_mesh

    init_distributed(
        coordinator=f"{args.coordinator}:{args.port}",
        num_processes=args.processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from ..config import MeshConfig, RansacConfig
    from ..geom.triangulate import triangulate_rectified
    from ..io import kitti, synthetic
    from . import ransac_sharded

    n_global = len(jax.devices())
    assert n_global >= args.processes, (n_global, args.processes)
    mesh = make_mesh(MeshConfig(data=1, model=n_global))

    # Identical replicated inputs on every process (same seed).
    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    gt = kitti.read_poses("/root/reference/kitti/poses/00.txt")
    rng = np.random.default_rng(0)
    lms = synthetic.scatter_landmarks(rng, gt[:2], 400)
    tr = synthetic.make_tracks(rng, calib, gt[0], gt[1], lms, noise_px=0.3)
    X = triangulate_rectified(
        jnp.asarray(tr.px_prev_l, jnp.float32), jnp.asarray(tr.px_prev_r, jnp.float32), calib
    )
    est = ransac_sharded.estimate_world_pose_sharded(
        jnp.asarray(tr.px_cur_l, jnp.float32),
        X,
        jnp.ones(tr.px_cur_l.shape[0], bool),
        calib,
        RansacConfig(n_hypotheses=args.hypotheses),
        jax.random.PRNGKey(0),
        mesh,
    )
    pose = np.asarray(est.pose_c2w)
    print(
        json.dumps(
            dict(
                process=args.process_id,
                n_global_devices=n_global,
                ok=bool(est.ok),
                n_inliers=int(est.n_inliers),
                t=[float(v) for v in pose[:3, 3]],
            )
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
