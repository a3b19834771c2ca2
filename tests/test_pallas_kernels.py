"""Pallas front-end kernels vs their XLA reference paths (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.frontend import dense_desc
from vo_tpu.frontend.pallas_kernels import _bin_maps_call, _round_up


def _bin_maps_interpret(G: np.ndarray) -> np.ndarray:
    """bin_maps_pallas with interpret=True (CPU test harness)."""
    B, H, W = G.shape
    th = min(96, _round_up(H, 16))
    Hp = _round_up(H, th)
    Wp = _round_up(W, 256)
    Gp = jnp.pad(jnp.asarray(G, jnp.float32), ((0, 0), (1, Hp + 1 - H), (0, Wp - W)))
    out = _bin_maps_call(Gp, H, W, th, interpret=True)
    return np.asarray(out[:, :, : H // 2, : W // 2])


def test_bin_maps_pallas_matches_xla(rng):
    for H, W in [(64, 300), (94, 310), (120, 256)]:
        G = rng.random((2, H, W), np.float32)
        ref = np.stack(
            [np.asarray(dense_desc._soft_bin_pool(jnp.asarray(g, jnp.float32))) for g in G]
        )
        got = _bin_maps_interpret(G)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bin_maps_pallas_odd_width(rng):
    # KITTI-like odd width: pooled output drops the last source column pair.
    G = rng.random((1, 96, 311), np.float32)
    ref = np.asarray(dense_desc._soft_bin_pool(jnp.asarray(G[0], jnp.float32)))
    got = _bin_maps_interpret(G)[0]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_extrema_scores_pallas_matches_reference(rng):
    from scipy.ndimage import gaussian_filter, maximum_filter, minimum_filter

    from vo_tpu.frontend.pallas_kernels import extrema_scores_pallas

    H, W, L = 70, 150, 5
    thr = 0.0133
    border = 5
    dog = gaussian_filter(rng.standard_normal((L, H, W)), 1.2).astype(np.float32) * 0.1
    scores, Hp, Wp = extrema_scores_pallas(jnp.asarray(dog), thr, border, interpret=True)
    scores = np.asarray(scores)

    mx = maximum_filter(dog, size=(3, 3, 3), mode="nearest")
    mn = minimum_filter(dog, size=(3, 3, 3), mode="nearest")
    # The kernel's halo is zero-padded, not edge-replicated, but border rows/
    # cols are masked out anyway; compare the interior only.
    is_ext = (dog >= mx) | (dog <= mn)
    ys, xs = np.mgrid[0:H, 0:W]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    ref_ok = is_ext & (np.abs(dog) > 0.5 * thr) & inb[None]
    ref = np.where(ref_ok, np.abs(dog), -1.0)[1:-1]

    np.testing.assert_allclose(scores[:, :H, :W], ref, rtol=1e-6, atol=1e-6)
    # Padded cells must never be candidates.
    assert (scores[:, H:, :] <= 0).all() and (scores[:, :, W:] <= 0).all()


def test_build_bin_map_rows_xla_path_consistent(rng):
    # The shared-rows helper (XLA path) must equal per-level build_bin_maps.
    G = jnp.asarray(rng.random((3, 64, 128), np.float32))
    sig = [1.6, 2.0, 2.5]
    rows = dense_desc.build_bin_map_rows(G, sig, use_pallas=False)
    ref = jnp.concatenate(
        [dense_desc.build_bin_maps(G[l], sig[l]).reshape(-1, 8) for l in range(3)]
    )
    np.testing.assert_allclose(np.asarray(rows), np.asarray(ref), rtol=1e-5, atol=1e-6)
