import time, jax, jax.numpy as jnp, numpy as np
from vo_tpu.config import PipelineConfig
from vo_tpu.io import synthetic
from vo_tpu.frontend.sift import detect_and_describe
from vo_tpu.frontend.track import stereo_features_with_matches, track
from vo_tpu.odometry.pipeline import init_state, vo_step
from vo_tpu.pose.ransac import estimate_world_pose
from vo_tpu.geom.triangulate import triangulate_rectified
from vo_tpu.utils.padding import gather_rows

cfg = PipelineConfig()
seq = synthetic.kitti_synthetic_sequence(n_frames=3, n_landmarks=6000, seed=0)
calib = seq.calib
l0, r0 = seq.frame(0)
l1, r1 = seq.frame(1)
left = jnp.asarray(np.asarray(l1), jnp.float32)
right = jnp.asarray(np.asarray(r1), jnp.float32)

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:30s} {dt:8.2f} ms")
    return out

# stage 1: detect+describe both images (vmapped)
det2 = jax.jit(lambda l, r: jax.vmap(lambda im: detect_and_describe(im, cfg.sift))(jnp.stack([l, r])))
feats_lr = timeit("detect+describe x2 (vmap)", det2, left, right)
feats_l = jax.tree.map(lambda x: x[0], feats_lr)
feats_r = jax.tree.map(lambda x: x[1], feats_lr)

# stage 2: stereo match
st = jax.jit(lambda fl, fr: stereo_features_with_matches(fl, fr, cfg.matcher, cfg.max_tracks))
stereo, m_st = timeit("stereo match", st, feats_l, feats_r)

# stage 3: temporal track (prev = stereo)
trk = jax.jit(lambda prev, fl, fr: track(prev, fl, fr, cfg.matcher, cfg.max_tracks))
tr = timeit("temporal 4-view track", trk, stereo, feats_l, feats_r)

# stage 4: triangulate + ransac
def pose_stage(tr, stereo, fl, fr, key):
    cur_l_px = gather_rows(fl.xy, tr.cur_l_idx, tr.mask)
    old_l_px = gather_rows(stereo.l_xy, tr.old_row, tr.mask)
    old_r_px = gather_rows(stereo.r_xy, tr.old_row, tr.mask)
    X_prev = triangulate_rectified(old_l_px, old_r_px, calib)
    mask = tr.mask & (X_prev[:,2] > 0.1) & (X_prev[:,2] < 400.)
    return estimate_world_pose(cur_l_px, X_prev, mask, calib, cfg.ransac, jax.random.PRNGKey(0))
ps = jax.jit(lambda tr, stereo, fl, fr: pose_stage(tr, stereo, fl, fr, None))
timeit("triangulate+RANSAC", ps, tr, stereo, feats_l, feats_r)

# full step
state = init_state(cfg)
step = jax.jit(lambda s, l, r, k: vo_step(s, l, r, k, calib, cfg))
key = jax.random.PRNGKey(0)
s1, o1 = step(state, left, right, key); jax.block_until_ready(o1.pose_c2w)
t0 = time.perf_counter()
N = 20
s = s1
for i in range(N):
    s, o = step(s, left, right, key)
jax.block_until_ready(o.pose_c2w)
print(f"{'full vo_step':30s} {(time.perf_counter()-t0)/N*1000:8.2f} ms")
