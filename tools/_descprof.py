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
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return out

vm = lambda f: jax.jit(jax.vmap(f))
sig, _ = pyr_mod.sigma_schedule(scfg)
s = scfg.scales_per_octave

def upto_sel(im):
    pyr = pyr_mod.build_pyramid(im, scfg)
    cand = sift_mod._detect_candidates(pyr, scfg)
    sel, _ = sift_mod._select_top(cand, scfg.max_keypoints)
    return pyr, sel

def maps_and_sel(im):
    pyr, sel = upto_sel(im)
    rows, oct_off, H2s, W2s = [], [], [], []
    off = 0
    for o in range(scfg.n_octaves):
        G = pyr.gauss[o]
        H2, W2 = G.shape[1] // 2, G.shape[2] // 2
        rows.append(dense_desc.build_bin_map_rows(G[1:s+1], sig[1:s+1], use_pallas=scfg.use_pallas))
        oct_off.append(off)
        off += s * H2 * W2
        H2s.append(H2); W2s.append(W2)
    maps_flat = jnp.concatenate(rows, axis=0)
    lvl0 = jnp.clip(sel.lvl - 1, 0, s - 1)
    H2_k = jnp.take(jnp.asarray(H2s, jnp.int32), sel.octave)
    W2_k = jnp.take(jnp.asarray(W2s, jnp.int32), sel.octave)
    row_base = jnp.take(jnp.asarray(oct_off, jnp.int32), sel.octave) + lvl0 * H2_k * W2_k
    return maps_flat, sel, row_base, H2_k, W2_k

timeit("upto_sel", vm(lambda im: upto_sel(im)[1].xf), img2)
timeit("maps_and_sel", vm(lambda im: maps_and_sel(im)[0]), img2)

def with_ori(im):
    maps_flat, sel, row_base, H2_k, W2_k = maps_and_sel(im)
    return dense_desc.orientations(maps_flat, row_base, sel.yf, sel.xf, sel.sigma_rel, H2_k, W2_k)
timeit("+orientations", vm(with_ori), img2)

def with_desc(im):
    maps_flat, sel, row_base, H2_k, W2_k = maps_and_sel(im)
    ori = dense_desc.orientations(maps_flat, row_base, sel.yf, sel.xf, sel.sigma_rel, H2_k, W2_k)
    return dense_desc.descriptors(maps_flat, row_base, sel.yf, sel.xf, sel.sigma_rel, ori, H2_k, W2_k)
timeit("+descriptors", vm(with_desc), img2)
