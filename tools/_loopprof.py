import time, jax, jax.numpy as jnp, numpy as np
from vo_tpu.config import PipelineConfig
from vo_tpu.io import synthetic
from vo_tpu.odometry import landmarks as lm_mod
from vo_tpu.odometry.pipeline import init_state, make_jitted_step

cfg = PipelineConfig()
N = 30
seq = synthetic.kitti_synthetic_sequence(n_frames=N, n_landmarks=6000, seed=0)
calib = seq.calib
step = make_jitted_step(calib, cfg)
insert = jax.jit(lambda m, lpx, rpx, msk, pose: lm_mod.insert(m, lpx, rpx, msk, pose, calib, cfg.landmarks), donate_argnums=0)

def to_u8(img):
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return a

frames_np = [(to_u8(seq.frame(i)[0]), to_u8(seq.frame(i)[1])) for i in range(N)]
frames_dev = [(jnp.asarray(l), jnp.asarray(r)) for l, r in frames_np]
jax.block_until_ready(frames_dev[-1][0])

key = jax.random.PRNGKey(0)
state = init_state(cfg); lmap = lm_mod.init_map(cfg.landmarks)
# warmup
s, o = step(state, *frames_dev[0], key); jax.block_until_ready(o.pose_c2w)
lm_w = insert(lm_mod.init_map(cfg.landmarks), o.new_lm_l_px, o.new_lm_r_px, o.new_lm_mask, o.pose_c2w); jax.block_until_ready(lm_w.xyz); del lm_w

# A: device-resident frames, step only
state = init_state(cfg); key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
for i in range(N):
    key, sub = jax.random.split(key)
    state, o = step(state, *frames_dev[i], sub)
jax.block_until_ready(o.pose_c2w)
print(f"A step-only, device frames   : {(time.perf_counter()-t0)/N*1000:7.2f} ms/frame")

# B: + insert
state = init_state(cfg); key = jax.random.PRNGKey(0); lmap = lm_mod.init_map(cfg.landmarks)
t0 = time.perf_counter()
for i in range(N):
    key, sub = jax.random.split(key)
    state, o = step(state, *frames_dev[i], sub)
    lmap = insert(lmap, o.new_lm_l_px, o.new_lm_r_px, o.new_lm_mask, o.pose_c2w)
jax.block_until_ready(o.pose_c2w); jax.block_until_ready(lmap.xyz)
print(f"B step+insert, device frames : {(time.perf_counter()-t0)/N*1000:7.2f} ms/frame")

# C: host frames transferred per frame (like runner)
state = init_state(cfg); key = jax.random.PRNGKey(0); lmap = lm_mod.init_map(cfg.landmarks)
t0 = time.perf_counter()
for i in range(N):
    l, r = frames_np[i]
    key, sub = jax.random.split(key)
    state, o = step(state, jnp.asarray(l), jnp.asarray(r), sub)
    lmap = insert(lmap, o.new_lm_l_px, o.new_lm_r_px, o.new_lm_mask, o.pose_c2w)
jax.block_until_ready(o.pose_c2w); jax.block_until_ready(lmap.xyz)
print(f"C step+insert, host frames   : {(time.perf_counter()-t0)/N*1000:7.2f} ms/frame")

# D: host frames, async device_put prefetch 2 ahead
state = init_state(cfg); key = jax.random.PRNGKey(0); lmap = lm_mod.init_map(cfg.landmarks)
t0 = time.perf_counter()
dev = jax.devices()[0]
pending = {}
AHEAD = 3
for i in range(N):
    for j in range(i, min(i+AHEAD, N)):
        if j not in pending:
            l, r = frames_np[j]
            pending[j] = (jax.device_put(l, dev), jax.device_put(r, dev))
    dl, dr = pending.pop(i)
    key, sub = jax.random.split(key)
    state, o = step(state, dl, dr, sub)
    lmap = insert(lmap, o.new_lm_l_px, o.new_lm_r_px, o.new_lm_mask, o.pose_c2w)
jax.block_until_ready(o.pose_c2w); jax.block_until_ready(lmap.xyz)
print(f"D step+insert, prefetch 3    : {(time.perf_counter()-t0)/N*1000:7.2f} ms/frame")
