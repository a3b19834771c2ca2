import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.config import MatcherConfig, SIFTConfig
from vo_tpu.frontend import match as match_mod
from vo_tpu.frontend import sift, track
from vo_tpu.io import synthetic


@pytest.fixture(scope="module")
def small_cfg():
    return SIFTConfig(max_keypoints=512, n_octaves=3)


@pytest.fixture(scope="module")
def seq():
    return synthetic.kitti_synthetic_sequence(n_frames=3, n_landmarks=1200, seed=7)


def _detect(img, cfg):
    f = jax.jit(lambda x: sift.detect_and_describe(x, cfg))(jnp.asarray(img, jnp.float32))
    return jax.tree.map(np.asarray, f)


def test_detect_blob_location_and_scale():
    # Single Gaussian blob: detector must fire at its center.
    H, W = 128, 192
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cy, cx, s = 61.0, 97.0, 3.0
    img = 0.8 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    cfg = SIFTConfig(max_keypoints=64, n_octaves=3)
    f = _detect(img, cfg)
    assert f.mask.sum() >= 1
    best = np.argmax(f.response * f.mask)
    x, y = f.xy[best]
    assert abs(x - cx) < 1.0 and abs(y - cy) < 1.0
    # DoG scale of a blob of std s is ~s (keypoint sigma within a factor ~1.5).
    assert 0.5 * s < f.scale[best] < 2.0 * s


def test_detect_on_rendered_frame(seq, small_cfg):
    left, _ = seq.frame(0)
    f = _detect(left, small_cfg)
    n = int(f.mask.sum())
    assert n > 150  # hundreds of splats -> hundreds of keypoints
    # Descriptors of valid keypoints are unit-norm.
    d = f.desc[f.mask]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
    # Positions inside the image.
    xy = f.xy[f.mask]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 1241
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 376


def test_stereo_match_disparity(seq, small_cfg):
    left, right = seq.frame(0)
    fl = _detect(left, small_cfg)
    fr = _detect(right, small_cfg)
    mcfg = MatcherConfig()
    m = match_mod.match(
        jnp.asarray(fl.desc), jnp.asarray(fl.mask), jnp.asarray(fr.desc), jnp.asarray(fr.mask), mcfg
    )
    m = jax.tree.map(np.asarray, m)
    k = int(m.mask.sum())
    assert k > 80
    pl = fl.xy[m.a_idx[m.mask]]
    pr = fr.xy[m.b_idx[m.mask]]
    disp = pl[:, 0] - pr[:, 0]
    dv = np.abs(pl[:, 1] - pr[:, 1])
    # Rectified pair: v must agree, disparity positive and physical (z in [2, 100] m).
    frac_good = np.mean((dv < 1.5) & (disp > 3.0) & (disp < 200.0))
    assert frac_good > 0.8


def test_match_respects_masks():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mask = np.zeros(64, bool)
    mask[:10] = True
    m = match_mod.match(
        jnp.asarray(d), jnp.asarray(mask), jnp.asarray(d), jnp.asarray(mask), MatcherConfig()
    )
    m = jax.tree.map(np.asarray, m)
    # Identical sets: each valid row matches itself, none outside the mask.
    assert m.mask.sum() == 10
    assert np.all(m.a_idx[m.mask] == m.b_idx[m.mask])
    assert np.all(m.a_idx[m.mask] < 10)


def test_mutual_vs_matlab_unique_default():
    """MatcherConfig.mutual=True deviates from MATLAB's Unique=false default
    (VO.m:87): without the cross-check a single B feature may be claimed by
    several A rows. Pin down both semantics so the deviation is explicit."""
    e = np.zeros((3, 128), np.float32)
    e[0, 0] = e[1, 1] = e[2, 2] = 1.0
    b = jnp.asarray(e[:2])  # b0, b1 orthogonal unit descriptors
    a0 = e[0]
    a1 = e[0] + 0.1 * e[2]
    a1 /= np.linalg.norm(a1)
    a = jnp.asarray(np.stack([a0, a1]))
    ones = jnp.ones(2, bool)
    m_uni = match_mod.match(a, ones, b, ones, MatcherConfig(mutual=False))
    m_mut = match_mod.match(a, ones, b, ones, MatcherConfig(mutual=True))
    m_uni, m_mut = jax.tree.map(np.asarray, (m_uni, m_mut))
    # Unique=false semantics: BOTH a-rows claim b0 (duplicate b index).
    assert m_uni.mask.sum() == 2
    assert np.all(m_uni.b_idx[m_uni.mask] == 0)
    # Mutual cross-check keeps only the pair that is best both ways.
    assert m_mut.mask.sum() == 1
    assert m_mut.a_idx[m_mut.mask][0] == 0 and m_mut.b_idx[m_mut.mask][0] == 0


@pytest.mark.slow
def test_track_cascade_mutual_delta(seq, small_cfg):
    """Quantify the cascade's behavioral delta between the MATLAB default
    (Unique=false -> mutual=False) and this engine's mutual=True default.
    The 4-view cascade re-aligns rows either way; mutual only prunes
    one-to-many claims, so its survivors must be (near-)contained in the
    Unique=false survivors."""
    cap = 256
    left0, right0 = seq.frame(0)
    left1, right1 = seq.frame(1)
    fl0, fr0 = _detect(left0, small_cfg), _detect(right0, small_cfg)
    fl1, fr1 = _detect(left1, small_cfg), _detect(right1, small_cfg)
    to_j = lambda f: sift.Features(*[jnp.asarray(x) for x in f])

    def pairs(mcfg):
        old = track.stereo_features(to_j(fl0), to_j(fr0), mcfg, cap)
        res = jax.tree.map(np.asarray, track.track(old, to_j(fl1), to_j(fr1), mcfg, cap))
        return {
            (int(c), int(o))
            for c, o in zip(res.cur_l_idx[res.mask], res.old_row[res.mask])
        }

    p_mutual = pairs(MatcherConfig(mutual=True))
    p_unique = pairs(MatcherConfig(mutual=False))
    assert len(p_mutual) > 50 and len(p_unique) > 50
    # The two defaults must land in the same ballpark. (Unique=false is not
    # strictly a superset through the 4-stage cascade: duplicate b-claims
    # collapse during the re-alignment stages, so on blob-like textures the
    # mutual config can retain MORE rows, not fewer.)
    assert len(p_unique) >= 0.6 * len(p_mutual)
    # NOTE: the old-row numbering differs between runs (stereo_features
    # compacts under each config), so compare via current-left index only.
    cur_mutual = {c for c, _ in p_mutual}
    cur_unique = {c for c, _ in p_unique}
    overlap = len(cur_mutual & cur_unique) / max(len(cur_mutual), 1)
    # Blob-like splat textures make duplicate claims (and therefore the two
    # modes' survivor sets) more divergent than corner-like texture; ~0.7
    # overlap is the measured regime, anything below ~2/3 would indicate a
    # cascade bug rather than matcher-mode semantics.
    assert overlap > 0.65, f"cascade diverges between mutual modes: {overlap:.2f}"


@pytest.mark.slow
def test_track_cascade(seq, small_cfg):
    mcfg = MatcherConfig()
    cap = 256
    left0, right0 = seq.frame(0)
    left1, right1 = seq.frame(1)
    fl0, fr0 = _detect(left0, small_cfg), _detect(right0, small_cfg)
    fl1, fr1 = _detect(left1, small_cfg), _detect(right1, small_cfg)
    to_j = lambda f: sift.Features(*[jnp.asarray(x) for x in f])
    old = track.stereo_features(to_j(fl0), to_j(fr0), mcfg, cap)
    res = track.track(old, to_j(fl1), to_j(fr1), mcfg, cap)
    res = jax.tree.map(np.asarray, res)
    old_np = jax.tree.map(np.asarray, old)
    k = int(res.mask.sum())
    assert k > 50
    # Tracked features should move only a little between consecutive frames
    # (KITTI frame 0->1 is ~0.86 m forward; flow is small for mid-range points).
    cur = fl1.xy[res.cur_l_idx[res.mask]]
    old_px = old_np.l_xy[res.old_row[res.mask]]
    flow = np.linalg.norm(cur - old_px, axis=1)
    assert np.median(flow) < 40.0
    # Stereo consistency of the current rows.
    cur_r = fr1.xy[res.cur_r_idx[res.mask]]
    assert np.mean(np.abs(cur[:, 1] - cur_r[:, 1]) < 2.0) > 0.8
