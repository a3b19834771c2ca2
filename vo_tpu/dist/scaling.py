"""Scaling-efficiency harness (BASELINE.md: >=70% at N>=2 chips target).

Measures throughput of the mesh-parallel components at increasing device
counts and reports efficiency = T(N)/ (N * T(1)). On a single-chip dev box,
run on the 8-way virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python -m vo_tpu.dist.scaling

The harness exercises the two production shardings:
- frame-parallel front-end (data axis): B frames detect+describe per step
- hypothesis-parallel RANSAC (model axis): fixed hypothesis budget split
  across devices, all_gather winner reduction
"""
from __future__ import annotations

import json
import time

import numpy as np


def _bench(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run(device_counts=(1, 2, 4, 8), frame_batch=8, image_size=(128, 256), n_hyp=2048):
    import jax
    import jax.numpy as jnp

    from ..config import MeshConfig, RansacConfig, SIFTConfig
    from ..geom.triangulate import triangulate_rectified
    from ..io import synthetic
    from . import frontend_batch, mesh as mesh_mod, ransac_sharded

    n_avail = len(jax.devices())
    device_counts = [d for d in device_counts if d <= n_avail]
    seq = synthetic.kitti_synthetic_sequence(
        n_frames=frame_batch, n_landmarks=1000, seed=0, image_size=image_size
    )
    frames = np.stack([seq.frame(i)[0] for i in range(frame_batch)]).astype(np.float32)
    sift_cfg = SIFTConfig(max_keypoints=256, n_octaves=2)

    rng = np.random.default_rng(0)
    tr = synthetic.make_tracks(rng, seq.calib, seq.gt_poses[0], seq.gt_poses[1], seq.landmarks, noise_px=0.3)
    X = triangulate_rectified(
        jnp.asarray(tr.px_prev_l, jnp.float32), jnp.asarray(tr.px_prev_r, jnp.float32), seq.calib
    )
    px = jnp.asarray(tr.px_cur_l, jnp.float32)
    msk = jnp.ones(px.shape[0], bool)

    rows = []
    t1_front = t1_ransac = None
    for nd in device_counts:
        mesh = mesh_mod.make_mesh(MeshConfig(data=nd, model=1), devices=jax.devices()[:nd])
        fb = frames[: max(frame_batch // 1, nd)]
        # Pad batch to a multiple of nd.
        reps = -(-fb.shape[0] // nd) * nd
        fbp = np.resize(fb, (reps,) + fb.shape[1:])
        t_front = _bench(lambda a: frontend_batch.detect_batch(a, sift_cfg, mesh), jnp.asarray(fbp))
        per_frame_front = t_front / fbp.shape[0]

        mesh_m = mesh_mod.make_mesh(MeshConfig(data=1, model=nd), devices=jax.devices()[:nd])
        cfg_r = RansacConfig(n_hypotheses=n_hyp)
        t_ransac = _bench(
            lambda p, x, m: ransac_sharded.estimate_world_pose_sharded(
                p, x, m, seq.calib, cfg_r, jax.random.PRNGKey(0), mesh_m
            ),
            px,
            X,
            msk,
        )
        if nd == device_counts[0]:
            t1_front, t1_ransac = per_frame_front * nd, t_ransac  # normalize vs smallest
        rows.append(
            dict(
                devices=nd,
                frontend_ms_per_frame=round(1000 * per_frame_front, 2),
                frontend_efficiency=round(t1_front / (nd * per_frame_front), 3),
                ransac_ms=round(1000 * t_ransac, 2),
                ransac_speedup=round(t1_ransac / t_ransac, 2),
            )
        )
    return rows


def run_integrated(mesh_shape=(2, 4), n_frames=48, image_size=(188, 620)):
    """End-to-end PRODUCTION runner on a mesh (the --mesh CLI mode): the
    fused per-frame step with detection sharded on "data" and RANSAC
    hypothesis-sharded on "model", vs the identical single-device run.

    On a virtual CPU mesh the devices TIMESHARE the host cores, so the fps
    ratio measures integration overhead, not scaling — the honest number a
    single-chip dev box can produce (BASELINE.md's >=70% target needs real
    multi-chip ICI). Trajectory equivalence with the single-device run is
    asserted (the same check as tests/test_dist.py's mesh-equivalence
    test, here at artifact scale)."""
    import jax
    import numpy as np

    from ..config import MeshConfig, PipelineConfig
    from ..io import synthetic
    from ..odometry import runner
    from . import mesh as mesh_mod

    seq = synthetic.kitti_synthetic_sequence(
        n_frames=n_frames, n_landmarks=3000, seed=1, image_size=image_size
    )
    cfg = PipelineConfig()
    res1 = runner.run_sequence(seq, cfg, n_frames=n_frames, progress=lambda i, s: None)
    mesh = mesh_mod.make_mesh(
        MeshConfig(data=mesh_shape[0], model=mesh_shape[1]),
        devices=jax.devices()[: mesh_shape[0] * mesh_shape[1]],
    )
    resM = runner.run_sequence(seq, cfg, n_frames=n_frames, mesh=mesh)
    pose_dev = float(np.abs(resM.poses - res1.poses).max()) if res1.poses.size else 0.0
    return dict(
        integrated_mesh=list(mesh_shape),
        n_frames=n_frames,
        single_device_fps=round(res1.frames_per_sec, 2),
        meshed_fps=round(resM.frames_per_sec, 2),
        max_pose_deviation_m=round(pose_dev, 6),
        equivalent=pose_dev < 2e-2,
        note="virtual CPU mesh timeshares host cores: ratio = integration overhead, not scaling",
    )


def main():
    # The environment's sitecustomize force-registers the TPU platform and
    # overrides JAX_PLATFORMS; pin the backend AFTER import or this harness
    # silently grabs the (single) real chip instead of the virtual mesh.
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    for row in run():
        print(json.dumps(row))
    print(json.dumps(run_integrated()))


if __name__ == "__main__":
    main()
