"""Dense-map fast descriptor path: matching behavior gates the approximation.

The fast path (frontend.dense_desc) may deviate numerically from the exact
per-keypoint path (frontend.sift with fast_descriptor=False); what must hold
is CONSISTENCY: the same world points, seen from two nearby views, must still
match each other by descriptor distance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.config import MatcherConfig, SIFTConfig
from vo_tpu.frontend import match as match_mod, sift
from vo_tpu.io import synthetic


@pytest.fixture(scope="module")
def stereo_pair():
    seq = synthetic.kitti_synthetic_sequence(
        n_frames=3, n_landmarks=1200, seed=11, image_size=(192, 384)
    )
    l0, r0 = seq.frame(0)
    l1, _ = seq.frame(1)
    return l0, r0, l1


def _detect(img, cfg):
    return jax.jit(lambda im: sift.detect_and_describe(im, cfg), static_argnums=())(
        jnp.asarray(img, jnp.float32)
    )


def _match_count(fa, fb, thresh_px=3.0):
    """Matches whose pixel displacement is physically plausible (small stereo/temporal motion)."""
    cfg = MatcherConfig()
    m = match_mod.match(fa.desc, fa.mask, fb.desc, fb.mask, cfg, 512)
    a = np.asarray(fa.xy)[np.asarray(m.a_idx)]
    b = np.asarray(fb.xy)[np.asarray(m.b_idx)]
    k = np.asarray(m.mask)
    d = np.linalg.norm(a - b, axis=1)
    good = k & (d < 60.0)  # stereo disparity / flow bound for this geometry
    return int(k.sum()), int(good.sum())


def test_fast_path_matches_across_views(stereo_pair):
    l0, r0, l1 = stereo_pair
    cfg = SIFTConfig(max_keypoints=512, n_octaves=3, fast_descriptor=True)
    fl = _detect(l0, cfg)
    fr = _detect(r0, cfg)
    ft = _detect(l1, cfg)
    n_st, good_st = _match_count(fl, fr)
    n_t, good_t = _match_count(fl, ft)
    assert n_st >= 40, n_st
    assert good_st > 0.8 * n_st, (n_st, good_st)
    assert n_t >= 40, n_t
    assert good_t > 0.8 * n_t, (n_t, good_t)


def test_fast_and_exact_find_same_keypoints(stereo_pair):
    """Detection (pre-descriptor) is identical code; keypoint sets must agree.

    Pinned to n_orientations=1: multi-peak duplicates depend on the
    orientation histogram, which the fast (dense bin-map) and exact
    (per-keypoint sampling) paths legitimately compute differently."""
    l0, _, _ = stereo_pair
    fast = _detect(
        l0, SIFTConfig(max_keypoints=256, n_octaves=2, fast_descriptor=True, n_orientations=1)
    )
    exact = _detect(
        l0, SIFTConfig(max_keypoints=256, n_octaves=2, fast_descriptor=False, n_orientations=1)
    )
    np.testing.assert_allclose(np.asarray(fast.xy), np.asarray(exact.xy), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fast.mask), np.asarray(exact.mask))


@pytest.mark.slow
def test_default_multi_peak_config_stays_covered(stereo_pair):
    """ADVICE r3: the SHIPPED default (fast_descriptor=True, n_orientations=2)
    had no parity coverage — the keypoint-equality test pins n_orientations=1.
    Two weaker invariants that must hold at the default:
      1. multi-peak duplication only ADDS keypoints: every dominant-peak
         detection survives at the same location (given capacity headroom);
      2. fast-vs-exact matching parity at n_orientations=2: descriptors
         differ numerically between the paths, plausible-match counts may not.
    """
    l0, r0, _ = stereo_pair
    big = 768  # headroom so duplicates can't evict dominant peaks
    f1 = _detect(
        l0, SIFTConfig(max_keypoints=big, n_octaves=2, fast_descriptor=True, n_orientations=1)
    )
    f2 = _detect(
        l0, SIFTConfig(max_keypoints=big, n_octaves=2, fast_descriptor=True, n_orientations=2)
    )
    xy1 = np.asarray(f1.xy)[np.asarray(f1.mask)]
    xy2 = np.asarray(f2.xy)[np.asarray(f2.mask)]
    assert xy2.shape[0] >= xy1.shape[0], (xy1.shape, xy2.shape)
    d = np.linalg.norm(xy1[:, None] - xy2[None], axis=-1).min(axis=1)
    assert (d < 1e-3).mean() > 0.95, float((d < 1e-3).mean())

    cfg_fast = SIFTConfig(max_keypoints=512, n_octaves=3, fast_descriptor=True, n_orientations=2)
    cfg_exact = dataclasses.replace(cfg_fast, fast_descriptor=False)
    n_f, good_f = _match_count(_detect(l0, cfg_fast), _detect(r0, cfg_fast))
    n_e, good_e = _match_count(_detect(l0, cfg_exact), _detect(r0, cfg_exact))
    assert good_f >= 40 and good_e >= 40, (good_f, good_e)
    assert good_f > 0.6 * good_e, (good_f, good_e)  # fast path must not regress silently


def test_fast_descriptors_normalized(stereo_pair):
    l0, _, _ = stereo_pair
    f = _detect(l0, SIFTConfig(max_keypoints=256, n_octaves=2, fast_descriptor=True))
    d = np.asarray(f.desc)[np.asarray(f.mask)]
    norms = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # Clip happens BEFORE the final renormalization, so entries may exceed
    # 0.2 afterwards, but not by much for well-spread descriptors.
    assert (d <= 0.5).all()
    assert (d >= 0).all()


def _shaded_blob_image(n=36, size=256, seed=0):
    """Gaussian blobs with a linear shading ramp in a known direction alpha.

    Blob keypoints get gradient histograms peaked near alpha — a structured
    oracle for orientation (the VO synthetic splats are pure noise textures
    whose orientation histograms are legitimately flat).
    """
    rng = np.random.default_rng(seed)
    img = np.full((size, size), 0.4, np.float32)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    alphas, centers = [], []
    for _ in range(n):
        cx, cy = rng.uniform(20, size - 20, 2)
        a = rng.uniform(-np.pi, np.pi)
        s = 3.0
        r2 = (x - cx) ** 2 + (y - cy) ** 2
        ramp = 1.0 + 0.8 * (np.cos(a) * (x - cx) + np.sin(a) * (y - cy)) / (2 * s)
        img += 0.5 * np.exp(-r2 / (2 * s * s)) * ramp
        alphas.append(a)
        centers.append((cx, cy))
    return np.clip(img, 0, 1), np.array(centers), np.array(alphas)


def test_orientation_consistent_under_image_rotation():
    """Rotating a structured image by 90 deg shifts orientations by -90 deg
    (np.rot90 is CCW in array axes = clockwise visually under y-down)."""
    img, _, _ = _shaded_blob_image()
    cfg = SIFTConfig(max_keypoints=128, n_octaves=2, fast_descriptor=True)
    f0 = _detect(img, cfg)
    f90 = _detect(np.rot90(img).copy(), cfg)
    H = img.shape[0]
    xy0 = np.asarray(f0.xy)[np.asarray(f0.mask)]
    th0 = np.asarray(f0.orientation)[np.asarray(f0.mask)]
    xy9 = np.asarray(f90.xy)[np.asarray(f90.mask)]
    th9 = np.asarray(f90.orientation)[np.asarray(f90.mask)]
    mapped = np.stack([xy0[:, 1], H - 1 - xy0[:, 0]], axis=1)
    diffs = []
    for i in range(mapped.shape[0]):
        j = np.argmin(np.linalg.norm(xy9 - mapped[i], axis=1))
        if np.linalg.norm(xy9[j] - mapped[i]) < 1.5:
            diffs.append((th9[j] - th0[i]) % (2 * np.pi))
    assert len(diffs) > 10, len(diffs)
    ang = np.angle(np.exp(1j * (np.array(diffs) + np.pi / 2)).mean())
    assert abs(ang) < 0.3, ang


def test_orientation_tracks_shading_direction():
    """Blob orientations ~ the known shading direction alpha."""
    img, centers, alphas = _shaded_blob_image(seed=2)
    cfg = SIFTConfig(max_keypoints=128, n_octaves=2, fast_descriptor=True)
    f = _detect(img, cfg)
    xy = np.asarray(f.xy)[np.asarray(f.mask)]
    th = np.asarray(f.orientation)[np.asarray(f.mask)]
    errs = []
    for c, a in zip(centers, alphas):
        j = np.argmin(np.linalg.norm(xy - c, axis=1))
        if np.linalg.norm(xy[j] - c) < 3.0:
            errs.append(np.angle(np.exp(1j * (th[j] - a))))
    assert len(errs) > 10, len(errs)
    med = np.median(np.abs(errs))
    assert med < 0.5, (med, len(errs))
