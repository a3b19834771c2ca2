import time, jax, jax.numpy as jnp, numpy as np
from vo_tpu.config import PipelineConfig
from vo_tpu.io import synthetic
from vo_tpu.frontend import pyramid as pyr_mod, dense_desc, sift as sift_mod

cfg = PipelineConfig()
scfg = cfg.sift
seq = synthetic.kitti_synthetic_sequence(n_frames=2, n_landmarks=6000, seed=0)
l1, r1 = seq.frame(1)
img2 = jnp.stack([jnp.asarray(np.asarray(l1), jnp.float32), jnp.asarray(np.asarray(r1), jnp.float32)])

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return out

# 1. pyramid (both images vmapped)
bp = jax.jit(jax.vmap(lambda im: pyr_mod.build_pyramid(im, scfg)))
pyr = timeit("build_pyramid x2", bp, img2)

# 2. candidates + topk per octave
def cands(img2):
    p = jax.vmap(lambda im: pyr_mod.build_pyramid(im, scfg))(img2)
    outs = []
    for o in range(scfg.n_octaves):
        k_cap = sift_mod._octave_caps(scfg)[o]
        outs.append(jax.vmap(lambda d: sift_mod._find_candidates(d, scfg, k_cap))(p.dog[o]))
    return outs
timeit("pyramid+candidates(top_k)", jax.jit(cands), img2)

# 3. + refine
def refined(img2):
    p = jax.vmap(lambda im: pyr_mod.build_pyramid(im, scfg))(img2)
    outs = []
    for o in range(scfg.n_octaves):
        k_cap = sift_mod._octave_caps(scfg)[o]
        def per_img(dog):
            S2, H, W = dog.shape
            lvl, ys, xs, score, valid = sift_mod._find_candidates(dog, scfg, k_cap)
            dog_flat = dog.reshape(-1)
            return jax.vmap(lambda l, y, x: sift_mod._refine_one(dog_flat, l, y, x, H, W, scfg))(lvl, ys, xs)
        outs.append(jax.vmap(per_img)(p.dog[o]))
    return outs
timeit("pyramid+cands+refine", jax.jit(refined), img2)

# 4. bin maps only (all octaves+levels)
def binmaps(img2):
    p = jax.vmap(lambda im: pyr_mod.build_pyramid(im, scfg))(img2)
    sig, _ = pyr_mod.sigma_schedule(scfg)
    outs = []
    for o in range(scfg.n_octaves):
        G = p.gauss[o]
        for l in range(1, scfg.scales_per_octave + 1):
            outs.append(jax.vmap(lambda g: dense_desc.build_bin_maps(g, float(sig[l])))(G[:, l]))
    return outs
timeit("pyramid+bin_maps", jax.jit(binmaps), img2)

# full
dd = jax.jit(jax.vmap(lambda im: sift_mod.detect_and_describe(im, scfg)))
timeit("detect_and_describe x2", dd, img2)
