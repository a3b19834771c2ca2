"""Dense-map SIFT descriptor + orientation: the TPU fast path.

The straightforward per-keypoint formulation (frontend.sift._descriptor_one /
_orientation_one) performs ~4k scalar bilinear gathers per keypoint — on TPU
random HBM gathers dominate the whole frame budget (measured ~230 ms of a
264 ms detect+describe). This module restructures the computation so the
heavy part is DENSE and the sparse part touches almost nothing:

1. Per pyramid level, soft-bin gradient orientations into 8 channel maps
   (exact linear interpolation between adjacent bins), 2x2-sum-pool to
   stride 2, and blur with a per-level static Gaussian whose sigma matches
   the descriptor cell window (sigma_cell ~ 1.5 * sigma_rel). All of this is
   elementwise math + small separable convolutions — VPU/MXU work.
2. A keypoint descriptor is then 16 rotated cell-center samples; each sample
   is a 4-tap bilinear ROW gather of 8 contiguous channels from the
   [N, 8]-flattened maps (~128 row-gathers per keypoint instead of ~4k
   scalar gathers).
3. The dominant orientation comes from the SAME maps: one bilinear row
   sample at the keypoint is an 8-bin orientation histogram of the
   surrounding Gaussian window; circular smoothing + parabolic peak
   interpolation give a continuous angle. Descriptor bins are rotated into
   the keypoint frame by fractional circular shift (again exact under the
   soft-binning model).

Approximations vs frontend.sift's exact path (kept for oracle tests):
- the descriptor's spatial weighting is an isotropic Gaussian per cell
  instead of trilinear sample-into-cell binning (the dense-SIFT standard);
- the orientation histogram has 8 bins instead of 36;
- within a level, the cell window sigma is fixed by the level's sigma
  rather than the refined sub-level scale.
These preserve matching behavior (both views are transformed identically)
while removing the gather bottleneck; see tests/test_fast_frontend.py for
the cross-view consistency checks that gate the approximation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SIFTConfig
from .pyramid import gaussian_kernel_1d

_NB = 8  # descriptor orientation bins
_CELLS = 4  # 4x4 spatial cells


def _cell_weights() -> np.ndarray:
    """Per-cell global Gaussian weight (ratio-invariant in units of cell size)."""
    w = np.zeros((_CELLS * _CELLS,), np.float32)
    for i in range(_CELLS):
        for j in range(_CELLS):
            a, b = i - 1.5, j - 1.5
            w[i * _CELLS + j] = math.exp(-(a * a + b * b) / 8.0)
    return w


_W_CELL = _cell_weights()  # [16]


def _soft_bin_pool(G_level: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> UNBLURRED pooled soft-bin maps [8, H2, W2] (XLA reference path)."""
    gx = 0.5 * (jnp.roll(G_level, -1, axis=1) - jnp.roll(G_level, 1, axis=1))
    gy = 0.5 * (jnp.roll(G_level, -1, axis=0) - jnp.roll(G_level, 1, axis=0))
    gx = gx.at[:, 0].set(0).at[:, -1].set(0)
    gy = gy.at[0, :].set(0).at[-1, :].set(0)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    b = (ang / (2.0 * jnp.pi) + 0.5) * _NB  # [0, 8]
    b0 = jnp.floor(b)
    fb = b - b0
    b0i = b0.astype(jnp.int32) % _NB
    # Exact soft binning: each pixel feeds its two adjacent bins.
    oh0 = jax.nn.one_hot(b0i, _NB, dtype=mag.dtype) * ((1.0 - fb) * mag)[..., None]
    oh1 = jax.nn.one_hot((b0i + 1) % _NB, _NB, dtype=mag.dtype) * (fb * mag)[..., None]
    maps = oh0 + oh1  # [H, W, 8]
    # 2x2 sum-pool to stride 2 (energy-preserving).
    H, W = G_level.shape
    H2, W2 = H // 2, W // 2
    maps = maps[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2, _NB).sum(axis=(1, 3))
    return jnp.moveaxis(maps, -1, 0)  # [8, H2, W2]


def _blur_maps(maps: jnp.ndarray, sigma_rel: float) -> jnp.ndarray:
    """Blur [8, H2, W2] pooled maps at the descriptor cell window scale.

    Separable Gaussian at half sigma (stride-2 grid); banded-matmul
    formulation (see pyramid.blur_separable) keeps it on the MXU.
    """
    from .pyramid import blur_separable

    sigma_map = max(1.5 * sigma_rel / 2.0, 0.5)
    return blur_separable(maps, gaussian_kernel_1d(sigma_map))


def build_bin_maps(G_level: jnp.ndarray, sigma_rel: float) -> jnp.ndarray:
    """One Gaussian level [H, W] -> blurred stride-2 bin maps [H2, W2, 8].

    sigma_rel is the level's static scale (relative to the octave base); the
    blur approximates the descriptor cell window sigma_cell = 1.5*sigma_rel.
    """
    return jnp.moveaxis(_blur_maps(_soft_bin_pool(G_level), sigma_rel), 0, -1)


def build_bin_map_rows(
    G_levels: jnp.ndarray, sigma_rels, use_pallas: bool = False
) -> jnp.ndarray:
    """[L, H, W] Gaussian levels of one octave -> flat [L*H2*W2, 8] map rows.

    On the TPU backend with ``use_pallas`` the fused Pallas kernel computes
    the pooled soft-bin maps in one VMEM pass (pallas_kernels.bin_maps_pallas);
    elsewhere the XLA reference path is used. The per-level blur is shared.
    """
    L = G_levels.shape[0]
    if use_pallas and jax.default_backend() == "tpu":
        from .pallas_kernels import bin_maps_pallas

        raw = bin_maps_pallas(G_levels)  # [L, 8, H2, W2]
    else:
        raw = jnp.stack([_soft_bin_pool(G_levels[l]) for l in range(L)])
    rows = []
    for l in range(L):
        blurred = _blur_maps(raw[l], float(sigma_rels[l]))  # [8, H2, W2]
        rows.append(jnp.moveaxis(blurred, 0, -1).reshape(-1, _NB))
    return jnp.concatenate(rows, axis=0)


def _bilinear_rows(flat: jnp.ndarray, row_base: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, H2, W2):
    """Bilinear sample of [N, 8] rows at stride-2 coords -> [..., 8].

    ``row_base`` is the flat row index of (y=0, x=0) of the level the sample
    reads from (i.e. octave offset + level * H2 * W2 precomputed by the
    caller). H2/W2 may be python ints (single-octave maps) or per-keypoint
    integer arrays broadcastable against ``ys``/``xs`` (multi-octave
    flattened maps).
    """
    x0 = jnp.clip(jnp.floor(xs), 0, W2 - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, H2 - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(ys - y0, 0.0, 1.0)[..., None]
    base = row_base + y0.astype(jnp.int32) * W2 + x0.astype(jnp.int32)
    v00 = jnp.take(flat, base, axis=0, mode="clip")
    v10 = jnp.take(flat, base + 1, axis=0, mode="clip")
    v01 = jnp.take(flat, base + W2, axis=0, mode="clip")
    v11 = jnp.take(flat, base + W2 + 1, axis=0, mode="clip")
    return (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _col(v):
    """Broadcast a per-keypoint [K] array (or python int) against [K, P] taps."""
    return v[:, None] if getattr(v, "ndim", 0) == 1 else v


def orientation_hists(
    maps_flat: jnp.ndarray,
    row_base: jnp.ndarray,
    yf: jnp.ndarray,
    xf: jnp.ndarray,
    sigma_rel: jnp.ndarray,
    H2,
    W2,
) -> jnp.ndarray:
    """Smoothed circular orientation histogram per keypoint, [K, 8].

    The maps are blurred at the DESCRIPTOR-cell scale (~1.5 sigma); Lowe's
    orientation window is effectively ~2x wider, and a single row sample is
    so local that sub-pixel localization shifts flip the winning bin (the
    radial gradient field around a blob dominates off-center). A 3x3 tap
    grid at 1.5*sigma spacing with Gaussian weights widens the effective
    window to ~2.4 sigma at the cost of 9 row samples per keypoint.

    row_base: [K] flat row index of the keypoint's level origin;
    yf/xf: [K] octave-local full-res coords.
    """
    d = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    oy = oy.reshape(-1)  # [9]
    ox = ox.reshape(-1)
    w = jnp.exp(-0.5 * (oy**2 + ox**2))  # [9]
    step = 1.5 * sigma_rel[:, None]  # [K, 1] full-res px
    # Stride-2 map cell (i, j) covers full-res pixels (2i, 2i+1): its center
    # sits at full-res 2i + 0.5, so map coords are (p - 0.5) / 2.
    ys = (yf[:, None] + oy[None] * step - 0.5) / 2.0
    xs = (xf[:, None] + ox[None] * step - 0.5) / 2.0
    taps = _bilinear_rows(maps_flat, _col(row_base), ys, xs, _col(H2), _col(W2))  # [K, 9, 8]
    hist = jnp.einsum("p,kpb->kb", w, taps)  # [K, 8]
    # Circular smoothing (the maps are spatially but not angularly smoothed).
    return (jnp.roll(hist, 1, axis=-1) + hist + jnp.roll(hist, -1, axis=-1)) / 3.0


def orientations(
    maps_flat: jnp.ndarray,
    row_base: jnp.ndarray,
    yf: jnp.ndarray,
    xf: jnp.ndarray,
    sigma_rel: jnp.ndarray,
    H2,
    W2,
) -> jnp.ndarray:
    """Dominant orientation per keypoint (argmax peak of orientation_hists)."""
    hist = orientation_hists(maps_flat, row_base, yf, xf, sigma_rel, H2, W2)
    peak = jnp.argmax(hist, axis=-1)  # [K]
    hc = jnp.take_along_axis(hist, peak[:, None], axis=-1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % _NB)[:, None], axis=-1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % _NB)[:, None], axis=-1)[:, 0]
    denom = hl - 2.0 * hc + hr
    interp = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    bin_f = peak.astype(jnp.float32) + interp
    return (bin_f / _NB - 0.5 + 1.0 / (2.0 * _NB)) * 2.0 * jnp.pi


def descriptors(
    maps_flat: jnp.ndarray,
    row_base: jnp.ndarray,
    yf: jnp.ndarray,
    xf: jnp.ndarray,
    sigma_rel: jnp.ndarray,
    theta: jnp.ndarray,
    H2,
    W2,
) -> jnp.ndarray:
    """[K, 128] descriptors via 16 rotated cell-center row samples per keypoint."""
    K = yf.shape[0]
    d = jnp.arange(_CELLS, dtype=jnp.float32) - (_CELLS - 1) / 2.0  # cell offsets
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    oy = oy.reshape(-1)  # [16]
    ox = ox.reshape(-1)
    cell = 3.0 * sigma_rel  # [K] cell width in full-res px
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # Rotated cell centers, full-res px -> stride-2 map coords.
    xs = (xf[:, None] + (ct[:, None] * ox[None] - st[:, None] * oy[None]) * cell[:, None] - 0.5) / 2.0
    ys = (yf[:, None] + (st[:, None] * ox[None] + ct[:, None] * oy[None]) * cell[:, None] - 0.5) / 2.0
    cells = _bilinear_rows(maps_flat, _col(row_base), ys, xs, _col(H2), _col(W2))  # [K, 16, 8]
    cells = cells * jnp.asarray(_W_CELL)[None, :, None]
    # Rotate orientation bins into the keypoint frame (fractional circular
    # shift) as a per-keypoint 8x8 one-hot matmul: a lane-axis
    # take_along_axis would force per-element cross-lane permutes on TPU
    # (measured ~15 ms/frame); the einsum is VPU-friendly dense math.
    shift = theta / (2.0 * jnp.pi) * _NB  # [K]
    s0 = jnp.floor(shift)
    fs = (shift - s0)[:, None]  # [K, 1]
    bins = jnp.arange(_NB)
    i0 = (bins[None, :] + s0[:, None].astype(jnp.int32)) % _NB  # [K, 8] out-bin -> in-bin
    rot = (1.0 - fs[..., None]) * jax.nn.one_hot(i0, _NB, dtype=cells.dtype) + fs[
        ..., None
    ] * jax.nn.one_hot((i0 + 1) % _NB, _NB, dtype=cells.dtype)  # [K, 8out, 8in]
    # HIGHEST precision: the contraction is only 8x8 per keypoint, so full
    # f32 precision is free and keeps bit-level agreement with the exact
    # gather formulation (default bf16 matmul adds ~1.2e-2 abs error).
    desc = jnp.einsum(
        "koi,kci->kco", rot, cells, precision=jax.lax.Precision.HIGHEST
    ).reshape(K, _CELLS * _CELLS * _NB)
    # Lowe normalization: L2 -> clip 0.2 -> L2.
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
    desc = jnp.minimum(desc, 0.2)
    return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
