"""Gaussian / difference-of-Gaussian scale-space pyramid.

The compute substrate for the SIFT-style detector that replaces MATLAB
``detectSIFTFeatures`` (VO.m:79-80). Design notes for TPU:

- All blurs are separable 1-D convolutions expressed via
  ``lax.conv_general_dilated`` so XLA lowers them onto the conv/MXU path and
  fuses the elementwise DoG subtraction.
- Kernel taps are computed at trace time from the static sigma schedule —
  shapes and weights are compile-time constants; nothing is data-dependent.
- Each octave halves resolution by strided slicing of the (s+1)-th Gaussian
  level (the standard Lowe construction).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SIFTConfig


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


_BAND_CACHE: dict = {}


def _band_matrix(n: int, kernel: np.ndarray) -> np.ndarray:
    """[n, n] banded blur matrix with edge-replicate boundary handling.

    Row i holds the kernel centered at i; taps that fall outside [0, n)
    accumulate onto the border element (== 'edge' padding). Cached per
    (n, kernel) and baked into the executable as a constant.
    """
    key = (n, kernel.tobytes())
    hit = _BAND_CACHE.get(key)
    if hit is not None:
        return hit
    r = (kernel.shape[0] - 1) // 2
    B = np.zeros((n, n), np.float32)
    rows = np.arange(n)
    for t, kt in enumerate(kernel):
        src = np.clip(rows + t - r, 0, n - 1)
        np.add.at(B, (rows, src), kt)
    _BAND_CACHE[key] = B
    return B


def blur_separable(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of [..., H, W] with edge-replicate padding.

    TPU-first: a 1-channel spatial conv lowers to the VPU with a dead
    channel dimension (~100x off roofline); expressing each 1-D pass as a
    banded-matrix matmul runs on the MXU instead. The band matrices are
    trace-time constants (built once per (size, sigma)).
    """
    H, W = img.shape[-2], img.shape[-1]
    Bh = jnp.asarray(_band_matrix(H, kernel))
    Bw = jnp.asarray(_band_matrix(W, kernel))
    x = jnp.einsum("hH,...Hw->...hw", Bh, img, preferred_element_type=jnp.float32)
    return jnp.einsum("...hw,Ww->...hW", x, Bw, preferred_element_type=jnp.float32)


class Pyramid(NamedTuple):
    """Per-octave stacks. Lists are static-length python lists (one per octave)."""

    gauss: list  # octave -> [S+3, H_o, W_o]
    dog: list  # octave -> [S+2, H_o, W_o]
    sigmas: np.ndarray  # [S+3] sigma of each level relative to octave base
    n_scales: int  # S = scales_per_octave


def sigma_schedule(cfg: SIFTConfig) -> tuple[np.ndarray, np.ndarray]:
    """Absolute per-level sigmas and the incremental blur from level i-1 -> i."""
    s = cfg.scales_per_octave
    k = 2.0 ** (1.0 / s)
    sig = np.array([cfg.sigma0 * (k**i) for i in range(s + 3)])
    inc = np.zeros_like(sig)
    for i in range(1, s + 3):
        inc[i] = math.sqrt(max(sig[i] ** 2 - sig[i - 1] ** 2, 1e-8))
    return sig, inc


def _decimation_matrix(n_in: int) -> np.ndarray:
    """[(n_in+1)//2, n_in] every-2nd-row selector (the ::2 decimation)."""
    n_out = (n_in + 1) // 2
    D = np.zeros((n_out, n_in), np.float32)
    D[np.arange(n_out), 2 * np.arange(n_out)] = 1.0
    return D


def _blur_stack_from_base(
    base: jnp.ndarray, sig: np.ndarray, decimate: bool = False
) -> jnp.ndarray:
    """All levels of one octave as TWO batched matmuls (direct-from-base).

    The chained construction (level i = level i-1 * inc_i) serializes
    2*(S+2) small matmuls per octave — measured 2.6 ms of the 5.7 ms
    detector on the v5e, dominated by serialization rather than FLOPs.
    The Gaussian semigroup lets every level blur DIRECTLY from the octave
    base (sigma_i^2 = sigma_0^2 + d_i^2): the H-passes of all levels fuse
    into one [L*H, H] @ [H, W] matmul and the W-passes into one batched
    [L, H, W] x [L, W, W] einsum. Same math (band matrices are dense, so
    wider direct kernels cost nothing extra), fewer-but-bigger MXU ops,
    and one fewer cascaded truncation per level.

    ``decimate``: ``base`` is the PREVIOUS octave's level-S Gaussian at
    full previous-octave resolution; the 2x decimation folds into the band
    matrices (B @ D — identical math to blurring the ::2 slice, since D
    selects rows before the blur's edge-replicate band is applied on the
    decimated grid). The explicit ``[::2, ::2]`` it replaces lowers to a
    double-strided slice that costs ~2.5 ms/frame on the v5e (lane-dim
    gather) — 3.5 of the 5.7 ms detector was the three octave handoffs.

    base: [..., H, W]; returns [..., L, H', W'] with L = len(sig)."""
    H, W = base.shape[-2], base.shape[-1]
    Dh = _decimation_matrix(H) if decimate else None
    Dw = _decimation_matrix(W) if decimate else None
    Ho = Dh.shape[0] if decimate else H
    Wo = Dw.shape[0] if decimate else W
    Bh, Bw = [], []
    for i in range(len(sig)):
        d2 = float(sig[i]) ** 2 - float(sig[0]) ** 2
        k = (
            np.array([1.0], np.float32)
            if d2 <= 1e-8
            else gaussian_kernel_1d(math.sqrt(d2))
        )
        bh = _band_matrix(Ho, k)
        bw = _band_matrix(Wo, k)
        Bh.append(bh @ Dh if decimate else bh)
        Bw.append(bw @ Dw if decimate else bw)
    Bh_all = jnp.asarray(np.stack(Bh))  # [L, H', H]
    Bw_all = jnp.asarray(np.stack(Bw))  # [L, W', W]
    x = jnp.einsum("lhH,...Hw->...lhw", Bh_all, base, preferred_element_type=jnp.float32)
    return jnp.einsum("...lhw,lWw->...lhW", x, Bw_all, preferred_element_type=jnp.float32)


def build_pyramid(img: jnp.ndarray, cfg: SIFTConfig) -> Pyramid:
    """img: [H, W] float32 in [0, 1]."""
    sig, _ = sigma_schedule(cfg)
    s = cfg.scales_per_octave
    # Base image: assume the input carries sigma ~0.5 of the camera; bring to sigma0.
    base_blur = math.sqrt(max(cfg.sigma0**2 - 0.5**2, 0.01))
    base = blur_separable(img, gaussian_kernel_1d(base_blur))
    gauss_octaves = []
    dog_octaves = []
    cur = base
    for o in range(cfg.n_octaves):
        # Next-octave handoff: level S (sigma = 2*sigma0) decimated 2x —
        # folded into the band matrices (see _blur_stack_from_base).
        G_all = _blur_stack_from_base(cur, sig, decimate=o > 0)
        # Stack-of-slices rather than moveaxis: under vmap this reproduces
        # the batched physical layout the Pallas kernels' block specs were
        # written against (a moveaxis lands the batch dim mid-array and the
        # Mosaic lowering rejects the resulting block shapes).
        G = jnp.stack([G_all[..., i, :, :] for i in range(len(sig))])
        gauss_octaves.append(G)
        dog_octaves.append(G[1:] - G[:-1])
        cur = G[s]
    return Pyramid(gauss=gauss_octaves, dog=dog_octaves, sigmas=sig, n_scales=s)


def gradients(G: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients of a [S, H, W] Gaussian stack -> (gx, gy)."""
    gx = 0.5 * (jnp.roll(G, -1, axis=2) - jnp.roll(G, 1, axis=2))
    gy = 0.5 * (jnp.roll(G, -1, axis=1) - jnp.roll(G, 1, axis=1))
    # Zero the wrapped borders.
    gx = gx.at[:, :, 0].set(0).at[:, :, -1].set(0)
    gy = gy.at[:, 0, :].set(0).at[:, -1, :].set(0)
    return gx, gy
