import time, jax, jax.numpy as jnp, numpy as np
from vo_tpu.config import PipelineConfig
from vo_tpu.io import synthetic
from vo_tpu.frontend import pyramid as pyr_mod, dense_desc, sift as sift_mod

cfg = PipelineConfig()
scfg = cfg.sift
seq = synthetic.kitti_synthetic_sequence(n_frames=2, n_landmarks=6000, seed=0)
l1, r1 = seq.frame(1)
img2 = jnp.stack([jnp.asarray(np.asarray(l1), jnp.float32), jnp.asarray(np.asarray(r1), jnp.float32)])

def timeit(name, fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return out

vm = lambda f: jax.jit(jax.vmap(f))
pyr_f = lambda im: pyr_mod.build_pyramid(im, scfg)
timeit("pyramid", vm(pyr_f), img2)

def cands(im):
    pyr = pyr_f(im)
    return sift_mod._detect_candidates(pyr, scfg)
timeit("pyramid+cands(pallas)+refine", vm(cands), img2)

def selected(im):
    return sift_mod._select_top(cands(im), scfg.max_keypoints)[0]
timeit("+select_top", vm(selected), img2)

sig, _ = pyr_mod.sigma_schedule(scfg)
def binmaps(im):
    pyr = pyr_f(im)
    rows = []
    for o in range(scfg.n_octaves):
        G = pyr.gauss[o]
        rows.append(dense_desc.build_bin_map_rows(G[1:scfg.scales_per_octave+1], sig[1:scfg.scales_per_octave+1], use_pallas=True))
    return jnp.concatenate(rows, axis=0)
timeit("pyramid+binmaps(pallas+blur)", vm(binmaps), img2)

dd = vm(lambda im: sift_mod.detect_and_describe(im, scfg))
timeit("detect_and_describe full", dd, img2)
