"""Persistent track-id propagation through the per-frame step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.config import LandmarkConfig, PipelineConfig, RansacConfig, SIFTConfig
from vo_tpu.io import synthetic
from vo_tpu.odometry.pipeline import init_state, make_jitted_step


@pytest.fixture(scope="module")
def run_states():
    seq = synthetic.kitti_synthetic_sequence(
        n_frames=5, n_landmarks=900, seed=7, image_size=(128, 256)
    )
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=256, n_octaves=2),
        ransac=RansacConfig(n_hypotheses=64),
        max_tracks=256,
    )
    step = make_jitted_step(seq.calib, cfg)
    st = init_state(cfg)
    states = []
    key = jax.random.PRNGKey(0)
    for i in range(5):
        l, r = seq.frame(i)
        key, sub = jax.random.split(key)
        st, out = step(st, jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32), sub)
        states.append((st, out))
    return seq, states


def test_ids_unique_per_frame(run_states):
    _, states = run_states
    for st, _ in states:
        ids = np.asarray(st.prev.ids)
        m = np.asarray(st.prev.mask)
        valid = ids[m]
        assert (valid >= 0).all()
        assert len(np.unique(valid)) == len(valid)  # no duplicate ids in a frame
        assert (ids[~m] == -1).all()


def test_ids_persist_across_frames(run_states):
    seq, states = run_states
    # A healthy fraction of frame-3 ids should already exist in frame 2
    # (features tracked across consecutive synthetic frames).
    ids2 = np.asarray(states[2][0].prev.ids)[np.asarray(states[2][0].prev.mask)]
    ids3 = np.asarray(states[3][0].prev.ids)[np.asarray(states[3][0].prev.mask)]
    shared = np.intersect1d(ids2, ids3)
    assert len(shared) > 0.3 * min(len(ids2), len(ids3)), (len(shared), len(ids2), len(ids3))


def test_shared_ids_are_same_landmark(run_states):
    """Rows sharing an id across frames must be geometrically consistent:
    the world point triangulated in frame 2 ~ the one from frame 3."""
    from vo_tpu.geom import se3, triangulate

    seq, states = run_states
    pts = {}
    for k in (2, 3):
        st, out = states[k]
        m = np.asarray(st.prev.mask)
        ids = np.asarray(st.prev.ids)[m]
        X = triangulate.triangulate_rectified(st.prev.l_xy, st.prev.r_xy, seq.calib)
        Xw = np.asarray(se3.apply(out.pose_c2w, X[None])[0])[m]
        pts[k] = dict(zip(ids.tolist(), Xw))
    shared = set(pts[2]) & set(pts[3])
    assert shared
    errs = [np.linalg.norm(pts[2][i] - pts[3][i]) for i in shared]
    med = np.median(errs)
    # Stereo depth noise scales as z^2 / (f * b): at this reduced resolution
    # (fu ~ 148 px) a half-pixel disparity error at z = 30 m is already ~3 m.
    # Id mix-ups would show tens of meters; gate well below that.
    sigma_z = 30.0**2 / (float(seq.calib.fu) * float(seq.calib.baseline)) * 0.25
    assert med < max(1.0, 2.0 * sigma_z), (med, sigma_z)


def test_next_id_monotone(run_states):
    _, states = run_states
    nid = [int(st.next_id) for st, _ in states]
    assert all(b >= a for a, b in zip(nid, nid[1:]))
    assert nid[-1] > 0
