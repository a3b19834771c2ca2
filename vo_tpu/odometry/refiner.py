"""Background keyframe refiner: BA + loop closure OFF the frame critical path.

Round-1 design ran windowed BA (odometry.ba_runner) and loop closure
(slam.loop_closure) inline in the frame loop, which forced a blocking
device->host read of the keyframe payload every keyframe — on a tunneled
TPU the sync round trips dominated (~220 ms/frame measured vs a ~16 ms
compiled step). Here the frame loop only starts ASYNC host copies of the
keyframe payload (pose + stereo features + descriptors) and enqueues the
job; at the NEXT keyframe boundary it waits for the previous job (normally
long finished — the worker had ``keyframe_every`` frames of wall time).
The lock-step wait keeps results DETERMINISTIC regardless of thread timing.

CORRECTIONS NEVER TOUCH THE LIVE CHAIN. The round-2 design left-multiplied
each solve's rigid delta onto the live pose, which fed every solve's noise
back into the next window's initialization; with the ~0.2-0.3 px residual
observation inconsistency of any real frontend, that feedback loop
compounded platform-dependently (measured: identical code, 0.04 m final
ATE on CPU vs 1.7-3.5 m on TPU from sub-mm per-solve differences).
Instead the worker keeps a cumulative world-frame correction ``D`` and
maps each incoming chain pose into its own corrected frame (pose_corr =
D @ pose_chain); the live loop stays pure VO (proven stable), while
corrected keyframe poses drive loop-closure decisions and the end-of-run
re-anchoring of the full trajectory (odometry.correction). Per-solve noise
then stays independent per keyframe instead of integrating.

No reference counterpart — the reference never refines (VO.m:130 chains
raw relative poses; drift is visible in 4500/map.png).
"""
from __future__ import annotations

import queue
import threading
import time
from collections import defaultdict
from typing import Optional

import numpy as np

from ..config import PipelineConfig
from ..geom.camera import StereoCalib


class _KeyframeJob:
    """Device arrays captured at a keyframe boundary (host copies in flight)."""

    __slots__ = ("frame_idx", "pose", "l_xy", "r_xy", "l_desc", "mask", "ids", "assoc", "gdesc")

    def __init__(self, frame_idx, pose, l_xy, r_xy, l_desc, mask, ids, assoc=None, gdesc=None):
        self.frame_idx = frame_idx
        self.pose = pose
        self.l_xy = l_xy
        self.r_xy = r_xy
        self.l_desc = l_desc
        self.mask = mask
        self.ids = ids
        # (slot, a_idx [K,C], b_idx [K,C], ok [K,C]) — window-match payload
        # from the runner's on-device keyframe associator (ba_runner.
        # WindowAssociator); None when BA is off.
        self.assoc = assoc
        # [128] device global descriptor (loop closure retrieval): computed
        # on device at submit so the worker reads 512 B instead of the
        # [C, 128] descriptor block (899 keyframes x 512 KB saturated the
        # tunnel downlink against the frame uploads at reference scale).
        self.gdesc = gdesc


def _start_async_copy(arr):
    try:
        arr.copy_to_host_async()
    except (AttributeError, RuntimeError):
        pass  # backend without async copies; np.asarray in the worker still works


def propagate_closure(
    kf_order: list[int],
    kf_corrected: dict[int, np.ndarray],
    kf_chain: dict[int, np.ndarray],
    surv: dict[int, np.ndarray],
) -> tuple[np.ndarray, dict[int, np.ndarray]]:
    """Apply a loop closure's corrected keyframe poses to the FULL ledger.

    ``surv`` maps frame_idx -> post-closure pose for keyframes still in the
    LoopCloser archive. Keyframes decimated out of the archive get the rigid
    delta of their nearest surviving neighbor (by frame index) so every
    anchor moves coherently; leaving them stale made reanchor_trajectory
    alternate between pre- and post-closure anchors, zigzagging segments by
    the full closure correction (ADVICE r3 high). Deltas are computed
    against the CHAIN ledger (loop-corrected, BA-free) and applied ON TOP
    of the corrected ledger for EVERY keyframe — survivors included — so a
    keyframe's window-BA offset rides through the closure instead of being
    wiped for survivors but kept for their decimated neighbors (which would
    leave adjacent anchors inconsistent by the BA-offset scale). The chain
    ledger itself adopts the survivor poses / deltas exactly. Returns
    (sorted survivor indices, delta dict)."""
    deltas = {
        fi: surv[fi].astype(np.float64) @ np.linalg.inv(kf_chain[fi].astype(np.float64))
        for fi in surv
        if fi in kf_chain
    }
    surv_sorted = np.array(sorted(deltas.keys()), np.int64)
    for fi in kf_order:
        if fi in surv:
            d = deltas[fi]
            kf_corrected[fi] = (d @ kf_corrected[fi].astype(np.float64)).astype(np.float32)
            kf_chain[fi] = surv[fi].astype(np.float32)
        elif surv_sorted.size:
            d = deltas[int(surv_sorted[np.argmin(np.abs(surv_sorted - fi))])]
            kf_corrected[fi] = (d @ kf_corrected[fi].astype(np.float64)).astype(np.float32)
            kf_chain[fi] = (d @ kf_chain[fi].astype(np.float64)).astype(np.float32)
    return surv_sorted, deltas


class RefinerWorker:
    """Owns BA + loop closure on a worker thread; main thread never blocks on
    device->host transfers for refinement."""

    def __init__(
        self,
        calib: StereoCalib,
        cfg: PipelineConfig,
        use_ba: bool,
        use_loop_closure: bool,
    ):
        self.calib = calib
        self.cfg = cfg
        self.wba = None
        self.lclo = None
        if use_ba:
            from .ba_runner import WindowAssociator, WindowedBA

            self.wba = WindowedBA(calib, cfg.ba)
            self.associator = WindowAssociator(cfg.ba.window)
            # Compile the window solver NOW (runner constructs the worker
            # before its timed loop) instead of inside the first keyframe's
            # lock-step wait.
            self.wba.warmup()
        else:
            self.associator = None
        if use_loop_closure:
            import jax
            import jax.numpy as jnp

            from ..slam.loop_closure import LoopCloser

            self.lclo = LoopCloser(calib, cfg.loop, matcher=cfg.matcher)

            # On-device global descriptor (mirror of loop_closure._global_desc).
            @jax.jit
            def _gdesc(d, m):
                mf = m.astype(jnp.float32)[:, None]
                s = (d * mf).sum(0) / jnp.maximum(mf.sum(), 1.0)
                n = jnp.linalg.norm(s)
                return jnp.where(n > 1e-12, s / n, s)

            self._gdesc_fn = _gdesc
            # Compile now: the first submit otherwise pays the XLA compile
            # on the main thread inside the timed frame loop (the same
            # reason wba.warmup() and the runner's kf_assoc warmup exist).
            C = cfg.max_tracks
            jax.block_until_ready(
                _gdesc(jnp.zeros((C, 128), jnp.float32), jnp.zeros(C, bool))
            )
        else:
            self._gdesc_fn = None
        # frame_idx -> latest corrected [4,4] pose (worker-owned, lock-guarded)
        self._kf_corrected: dict[int, np.ndarray] = {}
        # frame_idx -> loop-corrected CHAIN pose (excludes window-BA deltas).
        # Closure deltas are computed against this ledger so keyframes the
        # LoopCloser has DECIMATED out of its archive still ride along with
        # their nearest surviving neighbor instead of keeping stale poses
        # (stale anchors zigzag reanchor_trajectory by the full closure
        # correction — ADVICE r3 high).
        self._kf_chain: dict[int, np.ndarray] = {}
        self._kf_order: list[int] = []
        # Cumulative rigid correction mapping live-chain poses into the
        # worker's corrected frame (worker-thread only; no lock needed).
        self._D = np.eye(4, dtype=np.float64)
        self._lock = threading.Lock()
        self._q: queue.Queue = queue.Queue()
        self._error: Optional[BaseException] = None
        self._loops_closed = 0
        self._ba_solves = 0
        self._ba_skipped = 0  # window solves skipped under queue backlog
        self._phase_s: defaultdict = defaultdict(float)  # worker-phase seconds
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- main-thread API ------------------------------------------------------

    def submit(self, frame_idx: int, pose_dev, prev_feats, assoc=None) -> None:
        """Enqueue a keyframe. ``pose_dev``/``prev_feats`` are DEVICE arrays;
        async host copies are started here so the worker's np.asarray is a
        cheap completion wait, not a fresh round trip. ``assoc`` is the
        (slot, a_idx, b_idx, ok) window-match payload (device arrays)."""
        job = _KeyframeJob(
            frame_idx,
            pose_dev,
            prev_feats.l_xy,
            prev_feats.r_xy,
            # Device refs for loop-closure verification (never host-copied).
            prev_feats.l_desc if self.lclo is not None else None,
            prev_feats.mask,
            prev_feats.ids,
            assoc=assoc,
            gdesc=self._gdesc_fn(prev_feats.l_desc, prev_feats.mask)
            if self._gdesc_fn is not None
            else None,
        )
        # Host copies: pose always (64 B); the [C, *] feature payloads only
        # when window BA assembles on the host — the loop closer works from
        # the device refs + the 512 B global descriptor.
        copy_names = ["pose", "gdesc"]
        if self.wba is not None:
            copy_names += ["l_xy", "r_xy", "mask", "ids"]
        for name in copy_names:
            arr = getattr(job, name)
            if arr is not None:
                _start_async_copy(arr)
        if assoc is not None:
            for arr in assoc[1:]:
                _start_async_copy(arr)
        self._q.put(job)

    def wait_pending(self) -> None:
        """Block until the worker has consumed every submitted job. NB: the
        newest job may still be STAGED (processed on the next submit or at
        close() — see _run); only close() guarantees full processing."""
        self._q.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def throttle(self, max_lag: int = 2) -> None:
        """Block only while more than ``max_lag`` submitted jobs are pending.

        Corrections never feed back into the live chain (worker-frame
        design, module docstring), and the worker consumes its queue in FIFO
        order on one thread — so the final trajectory is bit-identical
        whatever the main thread's timing. The bound exists only to cap the
        lifetime of the queued device arrays and keep the worker from
        falling unboundedly behind; ``max_lag=0`` is the old lock-step,
        whose wait dominated the run whenever one keyframe's refinement
        (graph solve + verifies) exceeded the keyframe cadence
        (main_wait_s 35 s of a 43.5 s run, ADVICE r3 medium)."""
        while self._q.unfinished_tasks > max_lag:
            with self._q.all_tasks_done:
                if self._q.unfinished_tasks > max_lag:
                    self._q.all_tasks_done.wait(timeout=0.05)
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def corrected_keyframes(self) -> tuple[np.ndarray, np.ndarray]:
        """(frame_idx [K], poses [K,4,4]) — final corrected keyframe poses."""
        with self._lock:
            idxs = np.asarray(self._kf_order, np.int64)
            poses = (
                np.stack([self._kf_corrected[i] for i in self._kf_order])
                if self._kf_order
                else np.zeros((0, 4, 4), np.float32)
            )
        return idxs, poses

    @property
    def stats(self) -> dict:
        s = dict(loops_closed=self._loops_closed, ba_solves=self._ba_solves)
        if self.wba is not None:
            s["ba_rejected"] = self.wba.n_rejected
            s["ba_skipped_backlog"] = self._ba_skipped
            if self.wba.n_active:  # solver-capacity telemetry (VERDICT r5 item 3)
                act = sorted(self.wba.n_active)
                cand = sorted(self.wba.n_candidate)
                s["ba_active_p50"] = act[len(act) // 2]
                s["ba_active_max"] = act[-1]
                s["ba_candidate_max"] = cand[-1]
        if self.lclo is not None:
            s["loops_skipped_small"] = self.lclo.skipped_small
            s["decimations"] = self.lclo.decimations
            ev = self.lclo.disc_events  # bounded ring of the latest events
            s["lc_verified"] = self.lclo.n_verified
            if ev:  # gate-decision telemetry: what discrepancies were seen
                discs = sorted(e[1] for e in ev)
                s["lc_disc_max_m"] = discs[-1]
                s["lc_disc_p50_m"] = discs[len(discs) // 2]
            s.update({f"worker_lc_{k}_s": round(v, 3) for k, v in self.lclo.phase_s.items()})
        s.update({f"worker_{k}_s": round(v, 3) for k, v in self._phase_s.items()})
        return s

    def close(self) -> None:
        """Drain the queue and stop the thread."""
        self._q.join()
        self._q.put(None)
        self._thread.join(timeout=60.0)
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    # -- worker thread --------------------------------------------------------

    def _finalize(self) -> None:
        """Collect the LoopCloser's final in-flight verification round (the
        pipelined dispatch at the last keyframe has no successor to collect
        it) and fold an end-of-run closure into the ledger."""
        if self.lclo is None:
            return
        res = self.lclo.flush()
        if res is None:
            return
        self._loops_closed += 1
        surv = {akf.frame_idx: akf.pose_c2w.copy() for akf in self.lclo.keyframes}
        with self._lock:
            propagate_closure(self._kf_order, self._kf_corrected, self._kf_chain, surv)

    def _run(self) -> None:
        # Jobs are processed ONE KEYFRAME LATE: job k's host reads (pose /
        # gdesc / feature payloads) block until the device's dispatch-ahead
        # queue reaches the ops that produced them, and at submit time those
        # ops sit at the head of a multi-frame backlog — reading immediately
        # measured ~50 ms of pure queue wait per keyframe (worker_copy_s
        # 43.7 s + lc_collect_s 21.4 s over 899 keyframes, BIGRUN_r04 vo_lc;
        # VERDICT r5 item 4). By the time job k+1 arrives the device has
        # advanced a full keyframe period and the async copies started at
        # submit have landed, so the reads complete without blocking.
        # Deterministic: processing order is unchanged, only shifted.
        staged: Optional[_KeyframeJob] = None
        while True:
            job = self._q.get()
            if job is None:
                try:
                    if staged is not None:
                        self._process(staged)
                    self._finalize()
                except BaseException as e:  # surfaced on the main thread
                    self._error = e
                self._q.task_done()
                return
            try:
                if staged is not None:
                    self._process(staged)
            except BaseException as e:  # surfaced on the main thread
                self._error = e
            finally:
                staged = job
                self._q.task_done()

    def _process(self, job: _KeyframeJob) -> None:
        t0 = time.perf_counter()
        pose_chain = np.asarray(job.pose, np.float64)
        pose = (self._D @ pose_chain).astype(np.float32)
        if self.wba is not None:  # host-side window assembly needs these
            l_xy = np.asarray(job.l_xy, np.float32)
            r_xy = np.asarray(job.r_xy, np.float32)
            mask = np.asarray(job.mask, bool)
        else:
            l_xy = r_xy = mask = None
        snapshot = pose.copy()
        with self._lock:
            self._kf_corrected[job.frame_idx] = pose
            self._kf_chain[job.frame_idx] = pose
            self._kf_order.append(job.frame_idx)
        self._phase_s["copy"] += time.perf_counter() - t0

        if self.lclo is not None:
            from ..slam.loop_closure import ArchivedKeyframe

            t0 = time.perf_counter()
            res = self.lclo.add_keyframe(
                ArchivedKeyframe(
                    frame_idx=job.frame_idx,
                    pose_c2w=pose,
                    # Host copies are not needed by the closer: verification
                    # runs from the device refs, retrieval from the device-
                    # computed global descriptor (512 B read vs 512 KB).
                    l_px=l_xy,
                    r_px=r_xy,
                    l_desc=None,
                    mask=mask,
                    global_desc=np.asarray(job.gdesc, np.float32),
                    dev=(job.l_xy, job.r_xy, job.l_desc, job.mask),
                )
            )
            self._phase_s["loop_closure"] += time.perf_counter() - t0
            if res is not None:
                self._loops_closed += 1
                surv = {akf.frame_idx: akf.pose_c2w.copy() for akf in self.lclo.keyframes}
                with self._lock:
                    surv_sorted, deltas = propagate_closure(
                        self._kf_order, self._kf_corrected, self._kf_chain, surv
                    )
                    final_lc = self._kf_corrected[job.frame_idx]
                # Only LOOP CLOSURES shift the worker frame: they observe
                # global drift. Window-BA refinements are local and must not
                # feed into D (see WindowedBA.optimize on non-compounding).
                self._D = (
                    final_lc.astype(np.float64)
                    @ np.linalg.inv(snapshot.astype(np.float64))
                    @ self._D
                )
                pose = final_lc.copy()
                # Re-base the BA window onto the loop-corrected chain —
                # including window keyframes whose archive entry was
                # decimated (nearest-survivor delta), or the next window
                # solve initializes from pre-closure geometry (ADVICE r3).
                if self.wba is not None:
                    for kf in self.wba.window:
                        if kf.frame_idx in surv:
                            kf.pose_c2w = surv[kf.frame_idx].astype(np.float32)
                        elif surv_sorted.size:
                            d = deltas[
                                int(surv_sorted[np.argmin(np.abs(surv_sorted - kf.frame_idx))])
                            ]
                            kf.pose_c2w = (d @ kf.pose_c2w.astype(np.float64)).astype(
                                np.float32
                            )

        if self.wba is not None:
            from .ba_runner import Keyframe

            # BA inits from the (loop-corrected) chain pose, never from a
            # previous window solve (non-compounding local refinement).
            cur_pose = pose.copy()
            t0 = time.perf_counter()
            if job.assoc is not None:
                slot, m_a, m_b, m_ok = job.assoc
                tids = self.associator.add(
                    int(slot),
                    mask,
                    np.asarray(m_a),
                    np.asarray(m_b),
                    np.asarray(m_ok, bool),
                )
            else:
                tids = np.asarray(job.ids, np.int32)
            self._phase_s["associate"] += time.perf_counter() - t0
            self.wba.add_keyframe(
                Keyframe(
                    frame_idx=job.frame_idx,
                    pose_c2w=cur_pose,
                    # The associator keeps canonicalizing this array as later
                    # keyframes merge tracks — share it, don't copy.
                    ids=tids,
                    l_px=l_xy,
                    r_px=r_xy,
                    mask=mask,
                )
            )
            # Skip-on-backlog: if newer keyframes are already queued, solving
            # THIS window would only delay them — and corrections are
            # non-compounding by design (WindowedBA.optimize docstring:
            # every solve is an independent local refinement off the chain
            # pose), so a dropped solve costs nothing downstream. The
            # keyframe itself is still added to the window above, so the
            # next solve covers its observations.
            if self._q.qsize() > 1:
                self._ba_skipped += 1
                return
            t0 = time.perf_counter()
            ba_res = self.wba.optimize()
            self._phase_s["ba_solve"] += time.perf_counter() - t0
            if ba_res is not None:
                self._ba_solves += 1
                T_new, _ = ba_res
                with self._lock:
                    for k, kf in enumerate(self.wba.window):
                        self._kf_corrected[kf.frame_idx] = T_new[k].copy()
