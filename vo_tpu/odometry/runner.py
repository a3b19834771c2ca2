"""Host-side sequence runner: IO loop around the jitted per-frame step.

The reference's outer ``for i = 1:n_frames`` (VO.m:64) with its every-100th
frame telemetry (VO.m:168-204) and end-of-run persistence (VO.m:247-253).
Host does IO + bookkeeping only; all math runs in the single jitted step.

Refinement (BA / loop closure — north-star extensions, no reference
counterpart) runs on a background worker (odometry.refiner): the frame loop
submits keyframes with async device->host copies; corrections live entirely
in the worker's frame (the live chain stays pure VO — see the refiner
docstring for why), and the full trajectory is re-anchored onto the
corrected keyframes at end of run (odometry.correction). The main thread
therefore never blocks on a device->host read, keeping the dispatch-ahead
fast path intact with refinement enabled.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..geom.camera import StereoCalib
from . import landmarks as lm_mod
from .pipeline import init_state, make_fused_loop_step, make_fused_multi_step

KITTI_DT = 0.10374  # mean frame period of kitti/00/times.txt (~9.6 Hz)


class _DeviceHistory:
    """Per-frame scalar/pose history kept ON DEVICE, flushed to host in chunks.

    Fetching ``int(out.n_inliers)`` / ``np.asarray(out.pose_c2w)`` every frame
    costs one blocking device->host round trip each — over a tunneled TPU that
    dominates end-to-end time (measured ~220 ms/frame of pure sync overhead
    vs a 70 ms compiled step). Instead the tiny per-frame outputs are stacked
    on device every ``chunk`` frames and copied back asynchronously; the host
    only blocks once at the end.
    """

    def __init__(self, chunk: int = 128):
        self.chunk = chunk
        self._pending: list = []
        self._chunks: list = []  # (stacked fields, n_valid)
        # ONE jitted fixed-arity stack program shared by every flush: the
        # eager jnp.stack path compiles a fresh ~chunk-operand concatenate
        # per distinct operand count (~1.2 s XLA compile x 5 fields,
        # measured INSIDE the timed loop at the first 128-frame flush —
        # 81.5 -> 37 fps on the 200-frame sustained bench). Flushes pad to
        # exactly ``chunk`` rows (repeating the last row; result() trims)
        # so this compiles once, and warm() can pay that during the
        # runner's warmup.
        self._stack = jax.jit(lambda *rows: tuple(jnp.stack(f) for f in zip(*rows)))

    def warm(self, *example_row) -> None:
        """Compile the flush program on an example row (runner warmup)."""
        self._stack(*([tuple(example_row)] * self.chunk))

    def append(self, *arrs) -> None:
        self._pending.append(arrs)
        if len(self._pending) >= self.chunk:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        n = len(self._pending)
        rows = self._pending + [self._pending[-1]] * (self.chunk - n)
        stacked = self._stack(*rows)
        for s in stacked:
            try:
                s.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # backend without async host copies; np.asarray below still works
        self._chunks.append((stacked, n))
        self._pending = []

    def result(self) -> list:
        """One np.ndarray per field, concatenated over all frames (safe to
        call mid-run: chunks are kept, a later call re-reads them)."""
        self.flush()
        if not self._chunks:
            return []
        n_fields = len(self._chunks[0][0])
        return [
            np.concatenate([np.asarray(stacked[k])[:n] for stacked, n in self._chunks])
            for k in range(n_fields)
        ]


@dataclasses.dataclass
class RunResult:
    poses: np.ndarray  # [T, 4, 4] world poses (frames 2..N like all_poses, VO.m:133)
    rel_poses: np.ndarray  # [T, 4, 4]
    n_inliers: np.ndarray  # [T]
    n_tracks: np.ndarray  # [T]
    pose_ok: np.ndarray  # [T] bool
    landmarks: np.ndarray  # [M, 3]
    frames_per_sec: float
    per_frame_ms: float
    refine_stats: dict = dataclasses.field(default_factory=dict)


def _refiner_ckpt(refiner, kf_assoc, ring_desc, ring_mask, assoc_slot):
    """RefinerWorker.checkpoint_state + the runner-side associator ring."""
    if refiner is None:
        return None
    p = refiner.checkpoint_state()
    if kf_assoc is not None:
        p["runner_ring_desc"] = np.asarray(ring_desc)
        p["runner_ring_mask"] = np.asarray(ring_mask)
        p["runner_assoc_slot"] = np.asarray(assoc_slot, np.int64)
    return p


def _dt_at(seq, i: int) -> float:
    times = getattr(seq, "times", None)
    if times is not None and i > 0 and i < len(times):
        return float(times[i] - times[i - 1])
    return KITTI_DT


def run_sequence(
    seq,
    cfg: PipelineConfig,
    n_frames: Optional[int] = None,
    seed: int = 0,
    insert_landmarks: Optional[bool] = None,
    progress: Optional[Callable[[int, dict], None]] = None,
    warmup: bool = True,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    metrics_path: Optional[str] = None,
    use_ba: bool = False,
    use_loop_closure: bool = False,
    viz_every: int = 0,
    viz_dir: Optional[str] = None,
    verbose: bool = False,
    mesh=None,
) -> RunResult:
    """Run VO over ``seq`` (StereoSequence or SyntheticSequence surface).

    ``mesh`` (a jax.sharding.Mesh, e.g. dist.mesh.make_mesh) routes the
    production step through the dist layer: detection sharded on "data",
    RANSAC hypothesis-sharded on "model", and the window solve sharded on
    "model" when ``use_ba`` (VERDICT r5 item 2).

    ``insert_landmarks`` defaults to cfg.view_3d (the reference's single flag,
    VO.m:6/145). With ``checkpoint_every > 0`` the resumable state is dumped
    to ``checkpoint_path`` periodically; ``resume=True`` restarts from it.
    ``viz_every > 0`` replicates the reference's every-Nth-frame figure dump
    to ``viz_dir``/<i>/{view,map,error,3d_map}.png plus the pretty_print
    console block (VO.m:168-204, 261-277).
    """
    calib: StereoCalib = seq.calib
    if insert_landmarks is None:
        insert_landmarks = cfg.view_3d
    n = len(seq) if n_frames is None else min(n_frames, len(seq))
    # Window BA needs f32-consistent multi-view observations from the step
    # (make_jitted_step docstring); plain VO honors cfg.matmul_precision.
    precision = "float32" if use_ba else cfg.matmul_precision
    # Fast path: no per-frame host consumer -> keep history on device and
    # let dispatch run ahead of the chip (async). Refinement stays on the
    # fast path (the worker owns all host copies); progress / metrics /
    # checkpoints need per-frame host values.
    deferred = not (
        progress is not None
        or metrics_path is not None
        or (checkpoint_every and checkpoint_path)
    )
    # cfg.fused_group frames per device program on the deferred no-refiner
    # path: detection (pose-independent, op-latency-dominated) batches
    # across all of them and dispatch overhead divides by the group size —
    # numerically equivalent trajectories (pipeline.vo_step_multi; VERDICT
    # r5 item 6). The refined path keeps the single-frame step: keyframe
    # submission needs state.prev at exact keyframe boundaries.
    group = cfg.fused_group if (deferred and not (use_ba or use_loop_closure) and mesh is None) else 1
    use_multi = group > 1
    # ONE device program per frame: PRNG split + landmark insert fused into
    # the step (each extra per-frame dispatch costs ~1.5-3.5 ms of op
    # latency over the tunneled TPU); the map is donated, updated in place.
    # The loop-closure path needs the step's full left detection set as the
    # verification query side (pipeline.make_fused_loop_step docstring).
    with_query = bool(use_loop_closure)
    step = make_fused_loop_step(
        calib, cfg, precision=precision, with_landmarks=insert_landmarks, mesh=mesh,
        with_query_feats=with_query,
    )
    stepN = (
        make_fused_multi_step(
            calib, cfg, precision=precision, with_landmarks=insert_landmarks, group=group
        )
        if use_multi
        else None
    )

    def to_device(img):
        if isinstance(img, jax.Array):
            return img  # feed pre-staged in device HBM (e.g. tools/bigrun.py)
        a = np.asarray(img)
        if a.dtype != np.uint8:
            # Quantize to the camera's native 8 bits: 4x less tunnel traffic.
            a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        return jnp.asarray(a)
    state = init_state(cfg, seed=seed)
    lmap = lm_mod.init_map(cfg.landmarks) if insert_landmarks else None

    poses, rels, n_in, n_tr, oks = [], [], [], [], []
    start_frame = 0
    resumed_refiner_state = None
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        from . import checkpoint as ckpt_mod

        ck = ckpt_mod.load(checkpoint_path)
        state, start_frame = ck.state, ck.frame_idx
        if ck.lmap is not None:
            lmap = ck.lmap
        poses = [p for p in ck.poses]
        rels = [p for p in ck.rel_poses]
        # Real per-frame stats (v2 checkpoints); zero-fill only for v1.
        n_in = list(ck.n_inliers) if ck.n_inliers is not None else [0] * len(poses)
        n_tr = list(ck.n_tracks) if ck.n_tracks is not None else [0] * len(poses)
        oks = list(ck.pose_ok) if ck.pose_ok is not None else [True] * len(poses)
        resumed_refiner_state = ck.refiner
    # Warm-up compile on frame 0 data so timing excludes compilation.
    t_compile0 = time.perf_counter()
    if warmup:
        l0, r0 = seq.frame(0)
        l0 = to_device(l0)
        r0 = to_device(r0)
        # The map argument is donated: warm up on a throwaway map so the
        # real one is not consumed before the loop starts.
        if use_multi:
            m_w = lm_mod.init_map(cfg.landmarks) if insert_landmarks else None
            outs_w = stepN(state, m_w, *((l0, r0) * group))
            jax.block_until_ready(outs_w[-1].pose_c2w)
            del outs_w, m_w
        if not use_multi or (n - start_frame) % group != 0:
            # The single-frame step runs the tail frames in multi mode.
            m_w = lm_mod.init_map(cfg.landmarks) if insert_landmarks else None
            s_w, m_w, o_w = step(state, m_w, l0, r0)[:3]
            jax.block_until_ready(o_w.pose_c2w)
            del s_w, m_w
    compile_s = time.perf_counter() - t_compile0

    from ..utils.profiling import MetricsLog, pretty_frame

    mlog = MetricsLog(metrics_path) if metrics_path else None
    refiner = None
    kf_assoc = None
    if use_ba or use_loop_closure:
        from .refiner import RefinerWorker

        refiner = RefinerWorker(
            calib, cfg, use_ba=use_ba, use_loop_closure=use_loop_closure, mesh=mesh
        )
        if resumed_refiner_state is not None:
            # Bit-exact resume of refined runs: ledgers, archive, loop
            # edges, in-flight rounds (VERDICT r5 item 7).
            refiner.restore_state(resumed_refiner_state)
    if use_ba:
        # On-device keyframe associator: one vmapped descriptor match of the
        # new keyframe against every keyframe still in the BA window (MXU
        # matmul, dispatched async — the worker union-finds the results;
        # ba_runner.WindowAssociator explains why frame-level id chaining
        # isn't enough).
        from ..frontend.match import match as _match

        Kw = cfg.ba.window
        Cw = cfg.max_tracks
        ring_desc = jnp.zeros((Kw, Cw, 128), jnp.float32)
        ring_mask = jnp.zeros((Kw, Cw), bool)
        assoc_slot = 0

        @jax.jit
        def kf_assoc(rd, rm, new_desc, new_mask, pos):
            def one(d, m):
                # f32-pinned like the step: bf16 distance matrices flip
                # marginal ratio/mutual decisions into mis-associations
                # that bias the window solve.
                with jax.default_matmul_precision("float32"):
                    r = _match(new_desc, new_mask, d, m, cfg.matcher, Cw)
                return r.a_idx, r.b_idx, r.mask

            a, b, ok = jax.vmap(one)(rd, rm)
            rd = rd.at[pos].set(new_desc)
            rm = rm.at[pos].set(new_mask)
            return rd, rm, a, b, ok

        if warmup:
            # Compile on the zero ring now: otherwise the compile lands inside
            # the timed loop at the first keyframe (ADVICE r2).
            w = kf_assoc(
                ring_desc, ring_mask, jnp.zeros((Cw, 128), jnp.float32),
                jnp.zeros(Cw, bool), jnp.int32(0),
            )
            jax.block_until_ready(w[2])
            del w
        if resumed_refiner_state is not None and "runner_ring_desc" in resumed_refiner_state:
            # The descriptor ring feeding the window associator is part of
            # the resumable state: a zero ring would mis-associate the first
            # resumed window (VERDICT r5 item 7).
            ring_desc = jnp.asarray(resumed_refiner_state["runner_ring_desc"])
            ring_mask = jnp.asarray(resumed_refiner_state["runner_ring_mask"])
            assoc_slot = int(resumed_refiner_state["runner_assoc_slot"])
    gt_poses = getattr(seq, "gt_poses", None)
    if viz_every and viz_dir:
        os.makedirs(viz_dir, exist_ok=True)
    hist = _DeviceHistory() if deferred else None
    if hist is not None and warmup:
        # Compile the chunked-flush stack program now (a ~1.2 s XLA compile
        # that otherwise lands inside the timed loop at frame ``chunk``).
        z44 = jnp.eye(4, dtype=jnp.float32)
        hist.warm(z44, z44, jnp.int32(0), jnp.int32(0), jnp.asarray(False))
    ke = cfg.ba.keyframe_every

    def live_viz(i, out, left):
        # --- reference live telemetry: every-Nth-frame figures + console
        # block (VO.m:168-204, 261-277). A deliberate host sync, amortized
        # over viz_every frames exactly like the reference's mod(i,100).
        pose_h = np.asarray(out.pose_c2w)
        rel_h = np.asarray(out.rel_pose)
        print(pretty_frame(i, rel_h, pose_h, _dt_at(seq, i)))
        if viz_dir:
            from ..viz import figures

            fields_so_far = hist.result() if hist is not None else []
            poses_so_far = fields_so_far[0] if fields_so_far else np.asarray(poses)
            if len(poses_so_far) == 0:
                poses_so_far = pose_h[None]
            lms = None
            if insert_landmarks:
                cnt = int(lmap.count)
                lms = np.asarray(lmap.xyz[:cnt]) if cnt else np.zeros((0, 3), np.float32)
            figures.frame_report(
                viz_dir,
                i,
                np.asarray(left),
                dict(
                    tracked_cur_px=np.asarray(out.tracked_cur_px),
                    tracked_old_px=np.asarray(out.tracked_old_px),
                    tracked_disp_3d=np.asarray(out.tracked_disp_3d),
                    tracked_mask=np.asarray(out.tracked_mask),
                ),
                poses_so_far,
                np.asarray(gt_poses) if gt_poses is not None else None,
                times=getattr(seq, "times", None),
                landmarks=lms,
            )

    wait_s = 0.0  # main-thread time blocked on the refiner (lock-step waits)
    t0 = time.perf_counter()
    i = start_frame
    while use_multi and i + group - 1 < n:
        # --- multi-frame fast path (no refiner / per-frame host consumer) ---
        host_frames = [seq.frame(i + k) for k in range(group)]
        dev = []
        for l, r in host_frames:
            dev += [to_device(l), to_device(r)]
        state, lmap, *outs = stepN(state, lmap, *dev)
        for k, out in enumerate(outs):
            if i + k > 0:  # all_poses starts at frame 2 (VO.m:133)
                hist.append(out.pose_c2w, out.rel_pose, out.n_inliers, out.n_tracks, out.pose_ok)
        if viz_every:
            for k, out in enumerate(outs):
                j = i + k
                if j > 0 and j % viz_every == 0:
                    live_viz(j, out, host_frames[k][0])
        i += group
    for i in range(i, n):
        t_frame = time.perf_counter()
        left, right = seq.frame(i)
        if refiner is not None and i > 0 and i % ke == 0:
            # Bounded lag: block only if the worker is >2 keyframes behind.
            # Corrections stay in the worker's frame (refiner docstring), so
            # the result is bit-identical to lock-step; the bound just keeps
            # a slow refinement burst (graph solve + verifies) from stalling
            # the frame loop (ADVICE r3 medium: main_wait_s 35 s of 43.5 s).
            t_wait = time.perf_counter()
            refiner.throttle(max_lag=2)
            wait_s += time.perf_counter() - t_wait
        step_out = step(state, lmap, to_device(left), to_device(right))
        state, lmap, out = step_out[:3]
        query_feats = step_out[3] if with_query else None
        if refiner is not None and i > 0 and i % ke == 0:
            # state.prev now holds THIS frame's stereo features + track ids.
            assoc = None
            if kf_assoc is not None:
                ring_desc, ring_mask, m_a, m_b, m_ok = kf_assoc(
                    ring_desc, ring_mask, state.prev.l_desc, state.prev.mask,
                    jnp.int32(assoc_slot),
                )
                assoc = (assoc_slot, m_a, m_b, m_ok)
                assoc_slot = (assoc_slot + 1) % Kw
            refiner.submit(i, out.pose_c2w, state.prev, assoc=assoc, query=query_feats)
        if deferred:
            if i > 0:  # all_poses starts at frame 2 (VO.m:133)
                hist.append(out.pose_c2w, out.rel_pose, out.n_inliers, out.n_tracks, out.pose_ok)
        else:
            if i > 0:
                poses.append(np.asarray(out.pose_c2w))
                rels.append(np.asarray(out.rel_pose))
                n_in.append(int(out.n_inliers))
                n_tr.append(int(out.n_tracks))
                oks.append(bool(out.pose_ok))
            if progress is not None:
                progress(
                    i,
                    dict(
                        n_tracks=int(out.n_tracks),
                        n_inliers=int(out.n_inliers),
                        pose_ok=bool(out.pose_ok),
                    ),
                )
            if mlog is not None:
                nt = int(out.n_tracks)
                mlog.log(
                    i,
                    n_tracks=nt,
                    n_inliers=int(out.n_inliers),
                    inlier_ratio=round(int(out.n_inliers) / max(nt, 1), 4),
                    pose_ok=bool(out.pose_ok),
                    mean_reproj_err=float(out.mean_reproj_err),
                    frame_ms=round(1000.0 * (time.perf_counter() - t_frame), 2),
                )
            if checkpoint_every and checkpoint_path and (i + 1) % checkpoint_every == 0:
                from . import checkpoint as ckpt_mod

                ckpt_mod.save(
                    checkpoint_path,
                    state,
                    lmap if insert_landmarks else None,
                    np.asarray(poses) if poses else np.zeros((0, 4, 4), np.float32),
                    np.asarray(rels) if rels else np.zeros((0, 4, 4), np.float32),
                    state.key,
                    i + 1,
                    stats=(n_in, n_tr, oks),
                    refiner_state=_refiner_ckpt(refiner, kf_assoc, ring_desc if kf_assoc else None, ring_mask if kf_assoc else None, assoc_slot if kf_assoc else 0),
                )
        if viz_every and i > 0 and i % viz_every == 0:
            live_viz(i, out, left)
    jax.block_until_ready(state.pose_c2w)
    wall = time.perf_counter() - t0
    if hist is not None:
        fields = hist.result()
        if fields:
            h_poses, h_rels, h_nin, h_ntr, h_ok = fields
            poses = list(poses) + list(h_poses)
            rels = list(rels) + list(h_rels)
            n_in = list(n_in) + h_nin.tolist()
            n_tr = list(n_tr) + h_ntr.tolist()
            oks = list(oks) + h_ok.tolist()
    if mlog is not None:
        mlog.close()

    poses_arr = np.asarray(poses) if poses else np.zeros((0, 4, 4), np.float32)
    rels_arr = np.asarray(rels) if rels else np.zeros((0, 4, 4), np.float32)
    refine_stats: dict = {}
    if refiner is not None:
        refiner.close()
        refine_stats = dict(refiner.stats)
        refine_stats["main_wait_s"] = round(wait_s, 3)
        kf_idx, kf_poses = refiner.corrected_keyframes()
        # History row for frame i is i-1 (all_poses convention, VO.m:133).
        rows = kf_idx - 1
        keep = (rows >= 0) & (rows < poses_arr.shape[0])
        if keep.any():
            from .correction import reanchor_trajectory, rebuild_rel_poses

            poses_arr = reanchor_trajectory(poses_arr, rows[keep], kf_poses[keep])
            rels_arr = rebuild_rel_poses(poses_arr)
        refine_stats["n_keyframes"] = int(kf_idx.size)

    count = int(lmap.count) if lmap is not None else 0
    lms = np.asarray(lmap.xyz[:count]) if insert_landmarks else np.zeros((0, 3), np.float32)
    return RunResult(
        poses=poses_arr,
        rel_poses=rels_arr,
        n_inliers=np.asarray(n_in, np.int32),
        n_tracks=np.asarray(n_tr, np.int32),
        pose_ok=np.asarray(oks, bool),
        landmarks=lms,
        frames_per_sec=(n - start_frame) / wall if wall > 0 else float("nan"),
        per_frame_ms=1000.0 * wall / max(n - start_frame, 1),
        refine_stats=refine_stats,
    )


def save_result(result: RunResult, out_dir: str) -> None:
    """npz persistence replacing poses.mat / error.mat / landmarks.mat (VO.m:247-253)."""
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(out_dir, "trajectory.npz"),
        poses=result.poses,
        rel_poses=result.rel_poses,
        n_inliers=result.n_inliers,
        n_tracks=result.n_tracks,
        pose_ok=result.pose_ok,
    )
    np.savez_compressed(os.path.join(out_dir, "landmarks.npz"), landmarks=result.landmarks)
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(
            dict(
                frames_per_sec=result.frames_per_sec,
                per_frame_ms=result.per_frame_ms,
                n_frames=int(result.poses.shape[0]) + 1,
                **{f"refine_{k}": v for k, v in result.refine_stats.items()},
            ),
            f,
            indent=2,
        )
