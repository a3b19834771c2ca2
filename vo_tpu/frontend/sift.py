"""SIFT-style feature detection and description, TPU-native.

Replaces MATLAB ``detectSIFTFeatures`` + ``extractFeatures(...,"SIFT")``
(VO.m:79-84). Behavioral contract replicated (defaults per MATLAB docs):
DoG scale-space extrema with contrast threshold 0.0133 and edge threshold 10,
sigma0 1.6, 3 scales/octave; 4x4x8 gradient-orientation descriptors with
Gaussian weighting, trilinear binning, 0.2-clipped renormalization.

TPU-first design (NOT a translation):
- Extrema detection is dense 3x3x3 min/max pooling over the whole DoG stack
  (``lax.reduce_window``) — no per-pixel scan.
- Keypoint selection is ``top_k`` over the masked response map: the output is
  a FIXED-capacity (max_keypoints) set with a validity mask, because XLA
  requires static shapes (the reference returns ragged arrays).
- Subpixel refinement, orientation histograms, and descriptors are one
  ``vmap`` over the candidate axis; all image reads are bilinear gathers from
  the flattened per-octave Gaussian/gradient stacks.
- Everything jits; per-image work is a single XLA program per octave count.

Multi-orientation (MATLAB emits a duplicate keypoint per histogram peak
>= 80% of the max): ``SIFTConfig.n_orientations=2`` replicates that with
static shapes — candidates are duplicated with their secondary peak and the
2K set is compacted back to capacity by response before the descriptor
stage (so the extra cost is only in keypoints that actually survive).
The default 1 keeps the dominant peak only; tests/test_sift_oracle.py
quantifies the match-count delta between the two.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SIFTConfig
from . import pyramid as pyr_mod
from .pyramid import Pyramid, build_pyramid, gradients


class Features(NamedTuple):
    """Fixed-capacity feature set for one image (replaces SIFTPoints + desc arrays)."""

    xy: jnp.ndarray  # [K, 2] (x, y) pixel coords, 0-based, original resolution
    scale: jnp.ndarray  # [K] absolute sigma
    orientation: jnp.ndarray  # [K] radians
    response: jnp.ndarray  # [K] |DoG| contrast
    desc: jnp.ndarray  # [K, 128] L2-normalized
    mask: jnp.ndarray  # [K] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


# ---------------------------------------------------------------------------
# static descriptor geometry (computed once in numpy at import time)
# ---------------------------------------------------------------------------

_DESC_GRID = 16  # samples per axis
_DESC_CELLS = 4
_DESC_BINS = 8
_ORI_R = 8  # orientation window radius (samples)


def _spatial_weights() -> np.ndarray:
    """[256, 16] trilinear spatial weights of each sample into the 4x4 cells."""
    n, c = _DESC_GRID, _DESC_CELLS
    w = np.zeros((n * n, c * c), dtype=np.float32)
    for i in range(n):  # y
        for j in range(n):  # x
            cy = (i + 0.5) * c / n - 0.5  # cell-space coordinate
            cx = (j + 0.5) * c / n - 0.5
            y0, x0 = int(np.floor(cy)), int(np.floor(cx))
            fy, fx = cy - y0, cx - x0
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < c and 0 <= xx < c:
                        w[i * n + j, yy * c + xx] = wy * wx
    return w


def _gauss_window(n: int, sigma: float) -> np.ndarray:
    ax = np.arange(n) - (n - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    return np.outer(g, g).astype(np.float32).reshape(-1)


_W_SPATIAL = _spatial_weights()  # [256, 16]
_W_GAUSS_DESC = _gauss_window(_DESC_GRID, _DESC_GRID / 2.0)  # [256]


def _bilinear_flat(flat: jnp.ndarray, level: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, H, W, row0=0):
    """Bilinear sample a [L*H*W]-flattened stack at (level, ys, xs); level integer.

    H/W may be traced per-keypoint scalars and ``row0`` an element offset of
    the stack's first row (multi-octave flattened buffers).
    """
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    base = row0 + level * (H * W) + y0i * W + x0i
    v00 = jnp.take(flat, base, mode="clip")
    v10 = jnp.take(flat, base + 1, mode="clip")
    v01 = jnp.take(flat, base + W, mode="clip")
    v11 = jnp.take(flat, base + W + 1, mode="clip")
    return (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )


# ---------------------------------------------------------------------------
# per-octave detection
# ---------------------------------------------------------------------------


def _win3(axis: int) -> tuple:
    """Window dims for a 3-tap reduce along one axis of a rank-3 array."""
    w = [1, 1, 1]
    w[axis] = 3
    return tuple(w)


def _find_candidates(dog: jnp.ndarray, cfg: SIFTConfig, k_cap: int, border: int = 5):
    """Dense extrema test + top-k selection on one octave's [S+2, H, W] DoG stack.

    Returns (level, y, x, score, valid) each [k_cap]; level indexes the DoG
    stack (inner levels 1..S).
    """
    S2, H, W = dog.shape
    # 3x3x3 extrema via SEPARABLE 1-D min/max passes (exact: max of a cube =
    # max along each axis in turn). One fused 27-tap reduce_window lowers to
    # a much slower stencil on TPU than three 3-tap passes.
    mx = dog
    mn = dog
    for axis in (2, 1, 0):
        mx = jax.lax.reduce_window(mx, -jnp.inf, jax.lax.max, _win3(axis), (1, 1, 1), "SAME")
        mn = jax.lax.reduce_window(mn, jnp.inf, jax.lax.min, _win3(axis), (1, 1, 1), "SAME")
    is_ext = (dog >= mx) | (dog <= mn)
    prefilter = jnp.abs(dog) > 0.5 * cfg.contrast_threshold
    ys = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 2)
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    valid = is_ext & prefilter & inb
    # Only inner levels can be 3D extrema centers.
    levels = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 0)
    valid &= (levels >= 1) & (levels <= S2 - 2)
    score = jnp.where(valid, jnp.abs(dog), -1.0)
    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, k_cap)
    lvl = idx // (H * W)
    rem = idx % (H * W)
    return lvl, rem // W, rem % W, top, top > 0


def _refine_one(dog_flat, lvl, y, x, H: int, W: int, cfg: SIFTConfig):
    """Quadratic subpixel refinement of one candidate (vmapped).

    Returns (dx, dy, ds, contrast, ok): offsets in (x, y, scale), interpolated
    contrast, and the accept flag (offset bound + contrast + edge tests).
    """
    # Gather the 3x3x3 neighborhood.
    dl = jnp.arange(-1, 2)
    off_l, off_y, off_x = jnp.meshgrid(dl, dl, dl, indexing="ij")
    idx = (lvl + off_l) * (H * W) + (y + off_y) * W + (x + off_x)
    C = jnp.take(dog_flat, idx.reshape(-1), mode="clip").reshape(3, 3, 3)  # [l, y, x]
    # Gradient and Hessian by central differences.
    g = jnp.array(
        [
            0.5 * (C[1, 1, 2] - C[1, 1, 0]),  # d/dx
            0.5 * (C[1, 2, 1] - C[1, 0, 1]),  # d/dy
            0.5 * (C[2, 1, 1] - C[0, 1, 1]),  # d/ds
        ]
    )
    c = C[1, 1, 1]
    dxx = C[1, 1, 2] - 2 * c + C[1, 1, 0]
    dyy = C[1, 2, 1] - 2 * c + C[1, 0, 1]
    dss = C[2, 1, 1] - 2 * c + C[0, 1, 1]
    dxy = 0.25 * (C[1, 2, 2] - C[1, 2, 0] - C[1, 0, 2] + C[1, 0, 0])
    dxs = 0.25 * (C[2, 1, 2] - C[2, 1, 0] - C[0, 1, 2] + C[0, 1, 0])
    dys = 0.25 * (C[2, 2, 1] - C[2, 0, 1] - C[0, 2, 1] + C[0, 0, 1])
    # Closed-form symmetric 3x3 solve (adjugate/Cramer): batched
    # jnp.linalg.solve/det lower to LU loops that dominate TPU time when
    # vmapped over thousands of candidates (measured ~67 ms/frame).
    A0 = dyy * dss - dys * dys
    A1 = dxs * dys - dxy * dss
    A2 = dxy * dys - dxs * dyy
    det = dxx * A0 + dxy * A1 + dxs * A2
    B0 = dxx * dss - dxs * dxs
    B1 = dxs * dxy - dxx * dys
    C0 = dxx * dyy - dxy * dxy
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.array([[A0, A1, A2], [A1, B0, B1], [A2, B1, C0]])
    offset = -(adj @ g) / det_safe
    contrast = c + 0.5 * jnp.dot(g, offset)
    ok = jnp.all(jnp.abs(offset) < 0.6)
    ok &= jnp.abs(contrast) >= cfg.contrast_threshold
    # Edge response on the 2x2 spatial Hessian (Lowe's r-test).
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = cfg.edge_threshold
    ok &= (det2 > 0) & (tr * tr * r < (r + 1) ** 2 * det2)
    return offset[0], offset[1], offset[2], contrast, ok


def _orientation_hist_one(gx_flat, gy_flat, lvl, yc, xc, sigma_rel, H, W, cfg: SIFTConfig, row0=0):
    """Smoothed circular orientation histogram of one keypoint (vmapped), [ori_bins]."""
    R = _ORI_R
    d = jnp.arange(-R, R + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    # Sample spacing proportional to the keypoint scale (window radius ~ 3*1.5*sigma).
    step = 1.5 * sigma_rel * 3.0 / R
    ys = yc + oy.reshape(-1) * step
    xs = xc + ox.reshape(-1) * step
    gxs = _bilinear_flat(gx_flat, lvl, ys, xs, H, W, row0)
    gys = _bilinear_flat(gy_flat, lvl, ys, xs, H, W, row0)
    mag = jnp.sqrt(gxs * gxs + gys * gys)
    w = jnp.exp(-(oy.reshape(-1) ** 2 + ox.reshape(-1) ** 2) / (2.0 * (R / 1.5) ** 2))
    ang = jnp.arctan2(gys, gxs)  # [-pi, pi]
    nb = cfg.ori_bins
    b = (ang / (2 * jnp.pi) + 0.5) * nb  # [0, nb]
    b0 = jnp.floor(b)
    fb = b - b0
    b0i = b0.astype(jnp.int32) % nb
    b1i = (b0i + 1) % nb
    wm = w * mag
    onehot0 = jax.nn.one_hot(b0i, nb, dtype=wm.dtype)
    onehot1 = jax.nn.one_hot(b1i, nb, dtype=wm.dtype)
    hist = jnp.einsum("p,pb->b", wm * (1 - fb), onehot0) + jnp.einsum("p,pb->b", wm * fb, onehot1)
    # Circular smoothing (two box passes).
    for _ in range(2):
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    return hist


def _interp_peak(hist: jnp.ndarray, peak: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Parabolic sub-bin interpolation of a histogram peak -> radians.

    hist: [..., nb]; peak: integer bins, either hist's batch shape (one peak
    per histogram) or with one extra trailing axis (several peaks per
    histogram). Shared by the exact and dense paths (bin->angle convention:
    bin centers at (i + 0.5)/nb of the circle).
    """
    squeeze = peak.ndim == hist.ndim - 1
    p = peak[..., None] if squeeze else peak
    hc = jnp.take_along_axis(hist, p % nb, axis=-1)
    hl = jnp.take_along_axis(hist, (p - 1) % nb, axis=-1)
    hr = jnp.take_along_axis(hist, (p + 1) % nb, axis=-1)
    denom = hl - 2 * hc + hr
    interp = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    bin_f = p.astype(jnp.float32) + interp
    theta = (bin_f / nb - 0.5 + 1.0 / (2 * nb)) * 2 * jnp.pi
    return theta[..., 0] if squeeze else theta


def _orientation_one(gx_flat, gy_flat, lvl, yc, xc, sigma_rel, H, W, cfg: SIFTConfig, row0=0):
    """Dominant gradient orientation of one keypoint (vmapped). Returns radians."""
    hist = _orientation_hist_one(gx_flat, gy_flat, lvl, yc, xc, sigma_rel, H, W, cfg, row0)
    peak = jnp.argmax(hist)
    return _interp_peak(hist, peak, cfg.ori_bins)


def _two_peaks(hist: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(theta1, theta2, has2) from smoothed circular histograms [K, nb].

    Lowe/MATLAB multi-orientation rule (detectSIFTFeatures emits a duplicate
    keypoint per histogram peak >= 80% of the max): peaks are circular local
    maxima; the strongest is the primary, the runner-up qualifies iff it
    clears 0.8x the primary.
    """
    nb = hist.shape[-1]
    hl = jnp.roll(hist, 1, axis=-1)
    hr = jnp.roll(hist, -1, axis=-1)
    is_peak = (hist >= hl) & (hist > hr)
    pk = jnp.where(is_peak, hist, -1e30)
    vals, bins = jax.lax.top_k(pk, 2)  # [K, 2]
    theta = _interp_peak(hist, bins, nb)  # [K, 2]
    # Degenerate (flat) histograms have no strict peak: fall back to argmax.
    no_peak = vals[:, 0] <= -1e29
    theta1 = jnp.where(no_peak, _interp_peak(hist, jnp.argmax(hist, axis=-1), nb), theta[:, 0])
    has2 = (vals[:, 1] > -1e29) & (vals[:, 1] >= 0.8 * vals[:, 0]) & ~no_peak
    return theta1, theta[:, 1], has2


def _descriptor_one(gx_flat, gy_flat, lvl, yc, xc, sigma_rel, theta, H, W, row0=0):
    """128-D SIFT descriptor of one keypoint (vmapped)."""
    n = _DESC_GRID
    d = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    oy = oy.reshape(-1)
    ox = ox.reshape(-1)
    # Sample spacing: 3*sigma per histogram cell, 4 samples per cell.
    step = 3.0 * sigma_rel / (n / _DESC_CELLS)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    xs = xc + (ct * ox - st * oy) * step
    ys = yc + (st * ox + ct * oy) * step
    gxs = _bilinear_flat(gx_flat, lvl, ys, xs, H, W, row0)
    gys = _bilinear_flat(gy_flat, lvl, ys, xs, H, W, row0)
    # Rotate gradients into the keypoint frame.
    rgx = ct * gxs + st * gys
    rgy = -st * gxs + ct * gys
    mag = jnp.sqrt(rgx * rgx + rgy * rgy) * jnp.asarray(_W_GAUSS_DESC)
    ang = jnp.arctan2(rgy, rgx)
    nb = _DESC_BINS
    b = (ang / (2 * jnp.pi) + 0.5) * nb
    b0 = jnp.floor(b)
    fb = b - b0
    b0i = b0.astype(jnp.int32) % nb
    b1i = (b0i + 1) % nb
    onehot0 = jax.nn.one_hot(b0i, nb, dtype=mag.dtype) * ((1 - fb) * mag)[:, None]
    onehot1 = jax.nn.one_hot(b1i, nb, dtype=mag.dtype) * (fb * mag)[:, None]
    ori_w = onehot0 + onehot1  # [256, 8]
    desc = jnp.einsum("pc,pb->cb", jnp.asarray(_W_SPATIAL), ori_w).reshape(-1)  # [128]
    # Normalize -> clip 0.2 -> renormalize (Lowe).
    desc = desc / (jnp.linalg.norm(desc) + 1e-12)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc) + 1e-12)
    return desc


def _octave_caps(cfg: SIFTConfig) -> list:
    return [max(64, cfg.max_keypoints >> o) for o in range(cfg.n_octaves)]


class _Candidates(NamedTuple):
    """Refined extrema from all octaves, octave-local coordinates."""

    octave: jnp.ndarray  # [M] int32
    lvl: jnp.ndarray  # [M] int32 DoG level of the extremum
    xf: jnp.ndarray  # [M] octave-local subpixel x
    yf: jnp.ndarray  # [M]
    sigma_rel: jnp.ndarray  # [M] sigma relative to the octave base
    response: jnp.ndarray  # [M] |interpolated contrast|
    valid: jnp.ndarray  # [M] bool


def _find_candidates_pallas(dog: jnp.ndarray, cfg: SIFTConfig, k_cap: int, border: int = 5):
    """Fused-kernel variant of _find_candidates (same contract, TPU backend)."""
    from .pallas_kernels import extrema_scores_pallas

    scores, Hp, Wp = extrema_scores_pallas(dog, cfg.contrast_threshold, border)
    # Candidate selection over the ~1.5M-pixel octave-0 response map is the
    # detector's single hottest op (exact sort-based top_k: 3.45 ms for the
    # stereo pair). approx_max_k's bucketed reduction (1.34 ms) recovers
    # >=98% of the exact set — the misses are ties among the WEAKEST
    # candidates, which the global response re-selection (_select_top) was
    # discarding with high probability anyway.
    top, idx = jax.lax.approx_max_k(scores.reshape(-1), k_cap, recall_target=0.98)
    lvl = idx // (Hp * Wp) + 1  # kernel emits inner levels only
    rem = idx % (Hp * Wp)
    return lvl, rem // Wp, rem % Wp, top, top > 0


def _detect_candidates(pyr: Pyramid, cfg: SIFTConfig) -> _Candidates:
    """Extrema + subpixel refinement for every octave (detection phase only)."""
    use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
    fields = {k: [] for k in _Candidates._fields}
    for o in range(cfg.n_octaves):
        dog = pyr.dog[o]
        S2, H, W = dog.shape
        k_cap = _octave_caps(cfg)[o]
        if use_pallas:
            lvl, ys, xs, score, valid = _find_candidates_pallas(dog, cfg, k_cap)
        else:
            lvl, ys, xs, score, valid = _find_candidates(dog, cfg, k_cap)
        dog_flat = dog.reshape(-1)
        refine = jax.vmap(lambda l, y, x: _refine_one(dog_flat, l, y, x, H, W, cfg))
        dx, dy, ds, contrast, ok = refine(lvl, ys, xs)
        lf = lvl.astype(jnp.float32) + ds
        fields["octave"].append(jnp.full(lvl.shape, o, jnp.int32))
        fields["lvl"].append(lvl)
        fields["xf"].append(xs.astype(jnp.float32) + dx)
        fields["yf"].append(ys.astype(jnp.float32) + dy)
        fields["sigma_rel"].append(cfg.sigma0 * (2.0 ** (lf / cfg.scales_per_octave)))
        fields["response"].append(jnp.abs(contrast))
        fields["valid"].append(valid & ok)
    return _Candidates(**{k: jnp.concatenate(v) for k, v in fields.items()})


def _select_top(cand: _Candidates, k: int) -> tuple[_Candidates, jnp.ndarray]:
    """Global top-k by response over all octaves' candidates."""
    score = jnp.where(cand.valid, cand.response, -1.0)
    _, idx = jax.lax.top_k(score, k)
    sel = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), cand)
    return sel._replace(valid=jnp.take(score, idx) > 0), idx


def detect_and_describe(img: jnp.ndarray, cfg: SIFTConfig) -> Features:
    """Full detector + descriptor for one [H, W] image. Jit-friendly.

    Output is a fixed-capacity Features (cfg.max_keypoints) with validity
    mask. TPU structure: detection (dense extrema + refine, per octave) runs
    over the full per-octave candidate capacity, then candidates are
    COMPACTED to the global top ``max_keypoints`` by response BEFORE the
    gather-heavy orientation/descriptor stage — the descriptors only touch
    the keypoints that survive, and a single call covers all octaves via a
    flattened multi-octave bin-map buffer (per-keypoint row offsets).
    """
    pyr = build_pyramid(img, cfg)
    sig, _ = pyr_mod.sigma_schedule(cfg)
    cand = _detect_candidates(pyr, cfg)
    sel, _ = _select_top(cand, cfg.max_keypoints)

    # --- orientation stage (histograms first so multi-peak can duplicate) ---
    if cfg.fast_descriptor:
        from . import dense_desc

        s = cfg.scales_per_octave
        rows, oct_off, H2s, W2s = [], [], [], []
        off = 0
        for o in range(cfg.n_octaves):
            G = pyr.gauss[o]
            H2, W2 = G.shape[1] // 2, G.shape[2] // 2
            rows.append(
                dense_desc.build_bin_map_rows(
                    G[1 : s + 1], sig[1 : s + 1], use_pallas=cfg.use_pallas
                )
            )
            oct_off.append(off)
            off += s * H2 * W2
            H2s.append(H2)
            W2s.append(W2)
        maps_flat = jnp.concatenate(rows, axis=0)

        def fast_derived(sl):
            lvl0 = jnp.clip(sl.lvl - 1, 0, s - 1)
            H2_k = jnp.take(jnp.asarray(H2s, jnp.int32), sl.octave)
            W2_k = jnp.take(jnp.asarray(W2s, jnp.int32), sl.octave)
            row_base = jnp.take(jnp.asarray(oct_off, jnp.int32), sl.octave) + lvl0 * H2_k * W2_k
            return row_base, H2_k, W2_k

        row_base, H2_k, W2_k = fast_derived(sel)
        hist = dense_desc.orientation_hists(
            maps_flat, row_base, sel.yf, sel.xf, sel.sigma_rel, H2_k, W2_k
        )
    else:
        # Lowe-exact oracle path: per-keypoint scalar-gather sampling from a
        # flattened multi-octave gradient stack (same compaction benefit).
        gx_rows, gy_rows, oct_off, GHs, GWs = [], [], [], [], []
        off = 0
        for o in range(cfg.n_octaves):
            G = pyr.gauss[o]
            gx, gy = gradients(G)
            gx_rows.append(gx.reshape(-1))
            gy_rows.append(gy.reshape(-1))
            oct_off.append(off)
            off += G.shape[0] * G.shape[1] * G.shape[2]
            GHs.append(G.shape[1])
            GWs.append(G.shape[2])
        gx_flat = jnp.concatenate(gx_rows)
        gy_flat = jnp.concatenate(gy_rows)

        def exact_derived(sl):
            GH_k = jnp.take(jnp.asarray(GHs, jnp.int32), sl.octave)
            GW_k = jnp.take(jnp.asarray(GWs, jnp.int32), sl.octave)
            base_k = jnp.take(jnp.asarray(oct_off, jnp.int32), sl.octave)
            return base_k, GH_k, GW_k

        base_k, GH_k, GW_k = exact_derived(sel)
        hist = jax.vmap(
            lambda b, l, y, x, s_, gh, gw: _orientation_hist_one(
                gx_flat, gy_flat, l, y, x, s_, gh, gw, cfg, row0=b
            )
        )(base_k, sel.lvl, sel.yf, sel.xf, sel.sigma_rel, GH_k, GW_k)

    # --- multi-peak duplication (Lowe/MATLAB >=80% rule), static shapes ---
    if cfg.n_orientations >= 2:
        th1, th2, has2 = _two_peaks(hist)
        ori_all = jnp.concatenate([th1, th2])
        valid_all = jnp.concatenate([sel.valid, sel.valid & has2])
        # Secondaries rank a hair below their primary so, at capacity, a
        # duplicate never evicts a stronger keypoint's primary orientation.
        resp_all = jnp.concatenate([sel.response, sel.response * 0.99999])
        score = jnp.where(valid_all, resp_all, -1.0)
        _, idx = jax.lax.top_k(score, cfg.max_keypoints)
        sel = jax.tree.map(
            lambda a: jnp.take(jnp.concatenate([a, a], axis=0), idx, axis=0), sel
        )._replace(valid=jnp.take(score, idx) > 0)
        ori = jnp.take(ori_all, idx)
    else:
        # Single dominant peak (identical to the pre-multi-peak behavior).
        ori = _interp_peak(hist, jnp.argmax(hist, axis=-1), hist.shape[-1])

    # --- descriptor stage on the final keypoint set ---
    if cfg.fast_descriptor:
        row_base, H2_k, W2_k = fast_derived(sel)
        desc = dense_desc.descriptors(
            maps_flat, row_base, sel.yf, sel.xf, sel.sigma_rel, ori, H2_k, W2_k
        )
    else:
        base_k, GH_k, GW_k = exact_derived(sel)
        desc = jax.vmap(
            lambda b, l, y, x, s_, t, gh, gw: _descriptor_one(
                gx_flat, gy_flat, l, y, x, s_, t, gh, gw, row0=b
            )
        )(base_k, sel.lvl, sel.yf, sel.xf, sel.sigma_rel, ori, GH_k, GW_k)

    oct_scale = jnp.take(
        jnp.asarray([2.0**o for o in range(cfg.n_octaves)], jnp.float32), sel.octave
    )
    xy = jnp.stack([sel.xf, sel.yf], axis=-1) * oct_scale[:, None]
    sigma_abs = sel.sigma_rel * oct_scale
    return Features(
        xy=xy,
        scale=sigma_abs,
        orientation=ori,
        response=sel.response,
        desc=desc,
        mask=sel.valid,
    )
