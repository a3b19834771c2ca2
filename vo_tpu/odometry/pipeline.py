"""Per-frame VO step: the reference's main loop body as ONE jitted program.

Replicates the VO.m:64-232 loop semantics — detect (VO.m:79-84), stereo match
(VO.m:87), 4-view temporal cascade (VO.m:280-334), triangulate both frames
(VO.m:113-116), RANSAC-P3P pose (VO.m:123-127), chain into the world frame
(VO.m:130), select brand-new stereo features for the landmark map
(VO.m:141-161) — but as a single static-shape XLA program:

- state carried across frames is a fixed-capacity StereoFeatures + the pose
  (the VO.m:225-231 ``features``/``pose`` contract),
- first-frame behavior falls out of the mask algebra (empty prev set =>
  tracker yields nothing => pose update falls back to identity), no python
  branch on frame index,
- on pose-estimation failure the step falls back to a constant-velocity
  model (the reference would abort, VO.m has no try/catch — SURVEY §5),
- the "is this landmark new" test replaces the reference's O(K*M)
  coordinate-equality scan (VO.m:147-154, "terribly slow") with an index-set
  membership matrix over the fixed capacities.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..frontend.sift import Features, detect_and_describe
from ..frontend.track import (
    StereoFeatures,
    TrackResult,
    stereo_features_with_matches,
    track,
)
from ..geom import se3
from ..geom.camera import StereoCalib
from ..geom.triangulate import triangulate_rectified
from ..pose.ransac import estimate_world_pose
from ..utils.padding import gather_rows


class VOState(NamedTuple):
    prev: StereoFeatures  # stereo-matched features of the previous frame
    pose_c2w: jnp.ndarray  # [4, 4] world pose (identity at start, VO.m:58)
    prev_rel: jnp.ndarray  # [4, 4] last relative pose (constant-velocity fallback)
    frame_idx: jnp.ndarray  # scalar int32
    next_id: jnp.ndarray  # scalar int32 — persistent track-id counter
    # PRNG key, split INSIDE the jitted step: a separate per-frame
    # jax.random.split dispatch costs ~3.5 ms of per-op latency over the
    # tunneled TPU (measured: 16.0 -> 12.5 ms/frame with the split removed).
    key: jnp.ndarray


class FrameOutput(NamedTuple):
    pose_c2w: jnp.ndarray  # [4, 4] world pose after this frame
    rel_pose: jnp.ndarray  # [4, 4] estimated relative pose (estworldpose analogue)
    pose_ok: jnp.ndarray  # bool — RANSAC succeeded (False on frame 1 / fallback)
    n_tracks: jnp.ndarray  # tracked correspondences entering RANSAC
    n_inliers: jnp.ndarray
    mean_reproj_err: jnp.ndarray
    # Viz / landmark payloads (fixed capacity + masks):
    tracked_cur_px: jnp.ndarray  # [C, 2] current left px of tracked features
    tracked_old_px: jnp.ndarray  # [C, 2] previous left px (flow overlay, ShowFeaturesOnFeed)
    tracked_disp_3d: jnp.ndarray  # [C] displacement magnitude label (ShowFeaturesOnFeed.m:12)
    tracked_mask: jnp.ndarray  # [C]
    new_lm_l_px: jnp.ndarray  # [C, 2] left px of NEW stereo features (VO.m:157-158)
    new_lm_r_px: jnp.ndarray  # [C, 2]
    new_lm_mask: jnp.ndarray  # [C]


def init_state(cfg: PipelineConfig, seed: int = 0) -> VOState:
    c = cfg.max_tracks
    z2 = jnp.zeros((c, 2), jnp.float32)
    zd = jnp.zeros((c, 128), jnp.float32)
    prev = StereoFeatures(
        l_xy=z2,
        r_xy=z2,
        l_desc=zd,
        r_desc=zd,
        mask=jnp.zeros(c, bool),
        ids=jnp.full((c,), -1, jnp.int32),
    )
    eye = jnp.eye(4, dtype=jnp.float32)
    return VOState(
        prev=prev,
        pose_c2w=eye,
        prev_rel=eye,
        frame_idx=jnp.int32(0),
        next_id=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )


def _membership(query_idx, query_mask, ref_idx, ref_mask):
    """query_idx[i] in ref_idx set? -> [Cq] bool (masked)."""
    eq = query_idx[:, None] == ref_idx[None, :]
    eq &= query_mask[:, None] & ref_mask[None, :]
    return jnp.any(eq, axis=1)


def _normalize(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> [0,1] float32 (the runner ships 1 byte/px over the tunnel)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) * (1.0 / 255.0)
    return img


def _step_core(
    state: VOState,
    feats_l: Features,
    feats_r: Features,
    key: jax.Array,
    next_key: jax.Array,
    calib: StereoCalib,
    cfg: PipelineConfig,
    pose_fn=None,
) -> tuple[VOState, FrameOutput]:
    """Everything after detection: the serial (pose-dependent) part of the
    frame. Split out of vo_step so the two-frame pipelined step can batch
    DETECTION over both frames (pose-independent) while chaining this part
    sequentially (VERDICT r5 item 6).

    ``pose_fn(px2d, pts3d, mask, key) -> PoseEstimate`` overrides the
    single-device RANSAC — the mesh-integrated production step passes the
    hypothesis-sharded estimator here (dist.ransac_sharded)."""
    cap = cfg.max_tracks
    stereo, m_st = stereo_features_with_matches(feats_l, feats_r, cfg.matcher, cap)

    # --- temporal 4-view cascade (VO.m:106-107 / 280-334) ---
    tr: TrackResult = track(state.prev, feats_l, feats_r, cfg.matcher, cap)
    cur_l_px = gather_rows(feats_l.xy, tr.cur_l_idx, tr.mask)
    cur_r_px = gather_rows(feats_r.xy, tr.cur_r_idx, tr.mask)
    old_l_px = gather_rows(state.prev.l_xy, tr.old_row, tr.mask)
    old_r_px = gather_rows(state.prev.r_xy, tr.old_row, tr.mask)

    # --- triangulate both frames (VO.m:113-116), batched ---
    X_prev = triangulate_rectified(old_l_px, old_r_px, calib)
    X_cur = triangulate_rectified(cur_l_px, cur_r_px, calib)
    depth_ok = (X_prev[:, 2] > 0.1) & (X_prev[:, 2] < 400.0)
    pose_mask = tr.mask & depth_ok

    # --- RANSAC-P3P world pose (VO.m:123-127) ---
    if pose_fn is None:
        est = estimate_world_pose(cur_l_px, X_prev, pose_mask, calib, cfg.ransac, key)
    else:
        est = pose_fn(cur_l_px, X_prev, pose_mask, key)

    # --- chain / fallback (VO.m:130) ---
    first = state.frame_idx == 0
    # Constant-velocity fallback when RANSAC fails mid-sequence; identity on frame 1.
    fallback = jnp.where(first, jnp.eye(4, dtype=state.prev_rel.dtype), state.prev_rel)
    rel = jnp.where(est.ok, est.pose_c2w, fallback)
    pose = jnp.where(first, state.pose_c2w, se3.compose(state.pose_c2w, rel))

    # --- new-landmark selection (VO.m:141-161) ---
    # A current stereo pair is "new" iff its LEFT feature wasn't tracked from
    # the previous frame (index membership, replacing the VO.m:148-154 scan).
    tracked_l = _membership(m_st.a_idx, m_st.mask, tr.cur_l_idx, tr.mask)
    new_mask = m_st.mask & ~tracked_l
    new_l_px = gather_rows(feats_l.xy, m_st.a_idx, new_mask)
    new_r_px = gather_rows(feats_r.xy, m_st.b_idx, new_mask)

    # --- per-feature 3D displacement labels (ShowFeaturesOnFeed.m:11-12) ---
    disp = jnp.linalg.norm(X_cur - X_prev, axis=-1)

    # --- persistent track ids ---
    # Stereo row j (left feature a_idx[j]) inherits the id of the previous-
    # frame feature it was tracked from; untracked rows get fresh ids.
    eq = (m_st.a_idx[:, None] == tr.cur_l_idx[None, :]) & m_st.mask[:, None] & tr.mask[None, :]
    inherited_pos = jnp.argmax(eq, axis=1)  # [C] position in TrackResult rows
    has_parent = jnp.any(eq, axis=1)
    parent_ids = jnp.take(state.prev.ids, jnp.take(tr.old_row, inherited_pos))
    fresh_needed = m_st.mask & ~has_parent
    fresh_rank = jnp.cumsum(fresh_needed.astype(jnp.int32)) - 1
    fresh_ids = state.next_id + fresh_rank
    ids = jnp.where(
        m_st.mask, jnp.where(has_parent, parent_ids, fresh_ids), jnp.int32(-1)
    ).astype(jnp.int32)
    next_id = state.next_id + jnp.sum(fresh_needed.astype(jnp.int32))

    new_state = VOState(
        prev=stereo._replace(ids=ids),
        pose_c2w=pose,
        prev_rel=rel,
        frame_idx=state.frame_idx + 1,
        next_id=next_id,
        key=next_key,
    )
    out = FrameOutput(
        pose_c2w=pose,
        rel_pose=rel,
        pose_ok=est.ok & ~first,
        n_tracks=jnp.sum(pose_mask),
        n_inliers=est.n_inliers,
        mean_reproj_err=est.mean_err,
        tracked_cur_px=cur_l_px,
        tracked_old_px=old_l_px,
        tracked_disp_3d=jnp.where(tr.mask, disp, 0.0),
        tracked_mask=tr.mask,
        new_lm_l_px=new_l_px,
        new_lm_r_px=new_r_px,
        new_lm_mask=new_mask,
    )
    return new_state, out


def vo_step(
    state: VOState,
    left: jnp.ndarray,
    right: jnp.ndarray,
    key: jax.Array | None,
    calib: StereoCalib,
    cfg: PipelineConfig,
    pose_fn=None,
    img_sharding=None,
    return_feats: bool = False,
) -> tuple:
    """One frame. Jit with static (calib-as-weak-static via closure, cfg static).

    ``key=None`` draws from ``state.key`` (split inside the program — the
    production path, saving a per-frame dispatch); an explicit key overrides
    it (determinism tests, hypothesis-sharded RANSAC drivers).
    ``img_sharding`` (a NamedSharding over the mesh's "data" axis) shards the
    stereo detection batch across devices; ``pose_fn`` swaps in the sharded
    RANSAC (see _step_core) — together these make the PRODUCTION step run
    distributed (odometry.runner ``mesh=``, VERDICT r5 item 2).
    ``return_feats`` additionally returns the FULL left detection set
    (xy/desc/mask) — loop-closure verification matches the query's complete
    detections, not just its stereo subset (slam.loop_closure)."""
    next_key = state.key
    if key is None:
        next_key, key = jax.random.split(state.key)

    # --- front-end (VO.m:79-87) ---
    # One vmapped program over the stereo pair: convs/top_k/gathers batch
    # across the two images instead of running as two serial programs.
    imgs = jnp.stack([_normalize(left), _normalize(right)])
    if img_sharding is not None:
        imgs = jax.lax.with_sharding_constraint(imgs, img_sharding)
    feats_lr = jax.vmap(lambda im: detect_and_describe(im, cfg.sift))(imgs)
    feats_l = jax.tree.map(lambda x: x[0], feats_lr)
    feats_r = jax.tree.map(lambda x: x[1], feats_lr)
    state, out = _step_core(state, feats_l, feats_r, key, next_key, calib, cfg, pose_fn=pose_fn)
    if return_feats:
        return state, out, (feats_l.xy, feats_l.desc, feats_l.mask)
    return state, out


def vo_step_multi(
    state: VOState,
    frames: tuple,
    calib: StereoCalib,
    cfg: PipelineConfig,
) -> tuple[VOState, list]:
    """N frames in one program, detection batched across all 2N images.

    ``frames`` is a flat tuple (l0, r0, l1, r1, ...). The frame->frame
    serial dependency binds only tracking/RANSAC/chaining (~5 ms of the
    step); detection is pose-independent, and its cost is
    op-count-dominated (dozens of pyramid/top-k/gather dispatches at ~1 %
    MFU, STAGES_r04) — measured on the v5e, an 8-image detection batch
    costs within noise of a 2-image batch (~51 vs ~57 ms/call with host
    sync), so batching across frames amortizes both the op latency and the
    per-program dispatch by N. The math is IDENTICAL to N sequential
    vo_step calls — same per-image detection (vmap semantics), same PRNG
    split sequence — so the trajectory is bit-identical to the
    single-frame path. Returns (state, [FrameOutput x N]).
    """
    n = len(frames) // 2
    feats = jax.vmap(lambda im: detect_and_describe(im, cfg.sift))(
        jnp.stack([_normalize(f) for f in frames])
    )
    outs = []
    for k in range(n):
        fl = jax.tree.map(lambda x: x[2 * k], feats)
        fr = jax.tree.map(lambda x: x[2 * k + 1], feats)
        nk, sk = jax.random.split(state.key)
        state, out = _step_core(state, fl, fr, sk, nk, calib, cfg)
        outs.append(out)
    return state, outs


def vo_step_pair(
    state: VOState,
    left0: jnp.ndarray,
    right0: jnp.ndarray,
    left1: jnp.ndarray,
    right1: jnp.ndarray,
    calib: StereoCalib,
    cfg: PipelineConfig,
) -> tuple[VOState, FrameOutput, FrameOutput]:
    """TWO frames in one program (vo_step_multi at N=2)."""
    state, outs = vo_step_multi(state, (left0, right0, left1, right1), calib, cfg)
    return state, outs[0], outs[1]


def make_jitted_step(calib: StereoCalib, cfg: PipelineConfig, precision: str | None = None):
    """Compile the per-frame step once; returns step(state, left, right, key).

    ``precision`` (default cfg.matmul_precision) pins every matmul/conv in
    the step. float32 is REQUIRED when the step feeds window BA: TPU's bf16
    default perturbs the DoG pyramid enough to flicker ~10% of detections
    between runs/backends and add subpixel jitter — harmless to
    RANSAC-guarded frame-to-frame VO but fatal to window BA, whose
    multi-view observations must be consistent at the ~0.1 px level
    (measured: identical window problems solve identically on CPU/TPU, yet
    TPU-assembled problems carried 2x the per-observation inconsistency and
    every solve degraded the window). The runner promotes to float32
    whenever use_ba=True; plain VO may run bfloat16/bfloat16_3x for MXU
    throughput if the ATE bound holds (VERDICT r3 item 5).
    """
    precision = cfg.matmul_precision if precision is None else precision

    @jax.jit
    def step(state, left, right, key):
        with jax.default_matmul_precision(precision):
            return vo_step(state, left, right, key, calib, cfg)

    return step


def _mesh_step_overrides(calib: StereoCalib, cfg: PipelineConfig, mesh):
    """(pose_fn, img_sharding) routing the step through the dist layer.

    "model" axis > 1 -> hypothesis-sharded RANSAC (dist.ransac_sharded:
    per-shard PRNG fold + all_gather winner); "data" axis > 1 -> the stereo
    detection batch sharded across devices (the production analogue of
    dist.frontend_batch — the batch is the L/R pair, so data must be 1 or 2).
    """
    if mesh is None:
        return None, None
    from jax.sharding import NamedSharding, PartitionSpec

    pose_fn = None
    img_sharding = None
    if mesh.shape.get("model", 1) > 1:
        from ..dist.ransac_sharded import estimate_world_pose_sharded

        def pose_fn(px2d, pts3d, mask, key):
            return estimate_world_pose_sharded(
                px2d, pts3d, mask, calib, cfg.ransac, key, mesh
            )

    data = mesh.shape.get("data", 1)
    if data > 1:
        if data != 2:
            raise ValueError(
                f"integrated step shards the stereo pair on 'data'; axis size {data} != 2"
            )
        img_sharding = NamedSharding(mesh, PartitionSpec("data"))
    return pose_fn, img_sharding


def make_fused_loop_step(
    calib: StereoCalib,
    cfg: PipelineConfig,
    precision: str | None = None,
    with_landmarks: bool = False,
    mesh=None,
    with_query_feats: bool = False,
):
    """ONE device program per frame for the production loop.

    Folds the PRNG split (state.key) and, with ``with_landmarks``, the
    landmark-map insert into the step: over the tunneled TPU each extra
    per-frame dispatch costs ~1.5-3.5 ms of op latency (measured 16.0 ->
    12.5 ms/frame dropping just the split), which dominated the loop once
    the compute itself ran at ~13 ms. The map argument is donated — updated
    in place, never copied.

    With ``mesh`` the SAME program runs distributed: detection sharded on
    the "data" axis, RANSAC hypothesis-sharded on "model"
    (_mesh_step_overrides; VERDICT r5 item 2 — the dist layer as a
    capability of the production engine, not a test-only library).

    Returns ``step(state, lmap, left, right) -> (state, lmap, out)``; pass
    ``lmap=None`` when ``with_landmarks=False``. ``with_query_feats``
    appends the full left detection set (xy/desc/mask device refs) to the
    return — the refined path feeds it to loop-closure verification
    (query side of slam.loop_closure; only keyframes ever read it, and the
    refiner never host-copies it).
    """
    from . import landmarks as lm_mod

    precision = cfg.matmul_precision if precision is None else precision
    pose_fn, img_sharding = _mesh_step_overrides(calib, cfg, mesh)

    def body(state, lmap, left, right):
        with jax.default_matmul_precision(precision):
            r = vo_step(
                state, left, right, None, calib, cfg,
                pose_fn=pose_fn, img_sharding=img_sharding,
                return_feats=with_query_feats,
            )
            state, out = r[0], r[1]
            if with_landmarks:
                lmap = lm_mod.insert(
                    lmap, out.new_lm_l_px, out.new_lm_r_px, out.new_lm_mask,
                    out.pose_c2w, calib, cfg.landmarks,
                )
        if with_query_feats:
            return state, lmap, out, r[2]
        return state, lmap, out

    if with_landmarks:
        return partial(jax.jit, donate_argnums=(1,))(body)
    return jax.jit(body)


def make_fused_multi_step(
    calib: StereoCalib,
    cfg: PipelineConfig,
    precision: str | None = None,
    with_landmarks: bool = False,
    group: int = 4,
):
    """``group`` frames per device program (vo_step_multi + landmark inserts).

    The production fast path when no per-frame host consumer exists
    (odometry.runner): detection — 12.6 ms of the 15.5 ms single-frame step
    at ~1 % MFU (STAGES_r04) — batches across all ``group`` frames, and
    per-frame dispatch latency divides by ``group``. Numerically equivalent
    to the single-frame step (same ops; XLA's wider batching may reorder
    reductions -> ~1e-6-level subpixel jitter, absorbed by per-frame
    RANSAC).

    Returns ``stepN(state, lmap, l0, r0, ..., l{g-1}, r{g-1})
    -> (state, lmap, out0, ..., out{g-1})``.
    """
    from . import landmarks as lm_mod

    precision = cfg.matmul_precision if precision is None else precision

    if with_landmarks:

        @partial(jax.jit, donate_argnums=(1,))
        def stepN(state, lmap, *frames):
            with jax.default_matmul_precision(precision):
                state, outs = vo_step_multi(state, frames, calib, cfg)
                for out in outs:
                    lmap = lm_mod.insert(
                        lmap, out.new_lm_l_px, out.new_lm_r_px, out.new_lm_mask,
                        out.pose_c2w, calib, cfg.landmarks,
                    )
            return (state, lmap, *outs)

    else:

        @jax.jit
        def stepN(state, lmap, *frames):
            with jax.default_matmul_precision(precision):
                state, outs = vo_step_multi(state, frames, calib, cfg)
            return (state, lmap, *outs)

    return stepN


def make_fused_pair_step(
    calib: StereoCalib,
    cfg: PipelineConfig,
    precision: str | None = None,
    with_landmarks: bool = False,
):
    """TWO frames per device program (make_fused_multi_step at group=2)."""
    return make_fused_multi_step(
        calib, cfg, precision=precision, with_landmarks=with_landmarks, group=2
    )
