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

    __slots__ = (
        "frame_idx", "pose", "l_xy", "r_xy", "l_desc", "mask", "ids", "assoc",
        "gdesc", "query",
    )

    def __init__(
        self, frame_idx, pose, l_xy, r_xy, l_desc, mask, ids, assoc=None,
        gdesc=None, query=None,
    ):
        self.frame_idx = frame_idx
        self.pose = pose
        self.l_xy = l_xy
        self.r_xy = r_xy
        self.l_desc = l_desc
        self.mask = mask
        self.ids = ids
        # (xy, desc, mask) device refs of the keyframe's FULL detection set:
        # the loop-closure verification query side (never host-copied).
        self.query = query
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


# Queue sentinel: process the STAGED job now (checkpoint_state needs the
# worker fully caught up, not one keyframe behind).
_FLUSH = object()


def _stack(arrs: list, tail_shape: tuple, dtype=np.float32) -> np.ndarray:
    """np.stack with a typed empty for zero-length lists (npz needs shapes)."""
    if arrs:
        return np.stack([np.asarray(a, dtype) for a in arrs])
    return np.zeros((0,) + tail_shape, dtype)


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
        mesh=None,
    ):
        self.calib = calib
        self.cfg = cfg
        self.wba = None
        self.lclo = None
        if use_ba:
            from .ba_runner import WindowAssociator, WindowedBA

            # With a mesh, the window solve runs landmark-sharded on the
            # "model" axis (dist.ba_sharded) — same solver, psum-reduced.
            self.wba = WindowedBA(calib, cfg.ba, mesh=mesh)
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
            # Compile the fused verification program now, not inside the
            # first candidate round on the worker thread (r5 measurement:
            # ~10 s of worker_lc_dispatch_s was first-round compile). The
            # query side runs at the detector's full capacity.
            self.lclo.warmup(cfg.max_tracks, cfg.sift.max_keypoints)

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
        self._phase_s: defaultdict = defaultdict(float)  # worker-phase seconds
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- main-thread API ------------------------------------------------------

    def submit(self, frame_idx: int, pose_dev, prev_feats, assoc=None, query=None) -> None:
        """Enqueue a keyframe. ``pose_dev``/``prev_feats`` are DEVICE arrays;
        async host copies are started here so the worker's np.asarray is a
        cheap completion wait, not a fresh round trip. ``assoc`` is the
        (slot, a_idx, b_idx, ok) window-match payload (device arrays);
        ``query`` the (xy, desc, mask) full-detection device refs for the
        loop-closure verification query side + global descriptor."""
        if self._gdesc_fn is not None:
            # Global descriptor over the FULL detection set when available:
            # ~1000 descriptors vs ~85 stereo-matched at reference feed
            # severity — measured revisit/unrelated cosine margin 0.0019 vs
            # 0.0001 (the stereo-subset signature saturates under noise).
            gd, gm = (query[1], query[2]) if query is not None else (
                prev_feats.l_desc, prev_feats.mask
            )
            gdesc = self._gdesc_fn(gd, gm)
        else:
            gdesc = None
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
            gdesc=gdesc,
            query=query if self.lclo is not None else None,
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

    # -- checkpoint / resume --------------------------------------------------
    #
    # r4 checkpointed only the VO-side state; a resumed --loop-closure run
    # quietly lost its keyframe ledger, loop edges and cumulative correction
    # D (VERDICT r5 item 7). Here the COMPLETE refinement state — ledgers,
    # LoopCloser archive (incl. descriptors read back from device), loop
    # edges, in-flight pipelined rounds (BA solve + verification, as host
    # arrays), associator rings — round-trips through a flat numpy dict, so
    # resume is bit-exact vs the uninterrupted run (tests/test_runtime.py).

    def checkpoint_state(self) -> dict:
        """Drain the worker (staged job included) and snapshot refinement
        state as a flat {name: np.ndarray} dict for npz persistence."""
        self._q.put(_FLUSH)
        self._q.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        p: dict = {}
        with self._lock:
            order = list(self._kf_order)
            p["ref_kf_order"] = np.asarray(order, np.int64)
            p["ref_kf_corrected"] = (
                np.stack([self._kf_corrected[i] for i in order])
                if order else np.zeros((0, 4, 4), np.float32)
            )
            p["ref_kf_chain"] = (
                np.stack([self._kf_chain[i] for i in order])
                if order else np.zeros((0, 4, 4), np.float32)
            )
        p["ref_D"] = self._D.copy()
        p["ref_counters"] = np.asarray([self._loops_closed, self._ba_solves], np.int64)
        if self.lclo is not None:
            lc = self.lclo
            kfs = lc.keyframes
            host = [self._kf_host_arrays(k) for k in kfs]
            p["lc_kf_frame_idx"] = np.asarray([k.frame_idx for k in kfs], np.int64)
            p["lc_kf_pose"] = _stack([k.pose_c2w for k in kfs], (4, 4))
            p["lc_kf_lpx"] = _stack([h[0] for h in host], (0, 2))
            p["lc_kf_rpx"] = _stack([h[1] for h in host], (0, 2))
            p["lc_kf_desc"] = _stack([h[2] for h in host], (0, 128))
            p["lc_kf_mask"] = _stack([h[3] for h in host], (0,), bool)
            p["lc_kf_gdesc"] = _stack([k.global_desc for k in kfs], (128,))
            p["lc_kf_path"] = np.asarray([k.path_m for k in kfs], np.float64)
            p["lc_edges_a"] = np.asarray([e[0] for e in lc.loop_edges], np.int64)
            p["lc_edges_b"] = np.asarray([e[1] for e in lc.loop_edges], np.int64)
            p["lc_edges_Z"] = _stack([e[2] for e in lc.loop_edges], (4, 4))
            p["lc_scalars"] = np.asarray(
                [lc.decimations, lc.skipped_small, lc.n_verified, lc._cooldown_left],
                np.int64,
            )
            p["lc_path_m"] = np.asarray(lc._path_m, np.float64)
            p["lc_last_t"] = (
                lc._last_t if lc._last_t is not None else np.full(3, np.nan, np.float64)
            )
            p["lc_key"] = np.asarray(lc._key)
            if lc._pending is not None:
                ver_fi, cand_fis, outs = lc._pending
                import jax

                ok, n_inl, poses, n_m = jax.tree.map(np.asarray, outs)
                p["lc_pend_ver"] = np.asarray(ver_fi, np.int64)
                p["lc_pend_cands"] = np.asarray(cand_fis, np.int64)
                p["lc_pend_ok"] = ok
                p["lc_pend_ninl"] = n_inl
                p["lc_pend_poses"] = poses
                p["lc_pend_nm"] = n_m
        if self.wba is not None:
            w = self.wba
            kfs = list(w.window)
            slots = self.associator._slot_tids
            p["ba_win_frame_idx"] = np.asarray([k.frame_idx for k in kfs], np.int64)
            p["ba_win_pose"] = _stack([k.pose_c2w for k in kfs], (4, 4))
            p["ba_win_lpx"] = _stack([k.l_px for k in kfs], (0, 2))
            p["ba_win_rpx"] = _stack([k.r_px for k in kfs], (0, 2))
            p["ba_win_mask"] = _stack([k.mask for k in kfs], (0,), bool)
            p["ba_win_ids"] = _stack(
                [np.asarray(k.ids, np.int64) for k in kfs], (0,), np.int64
            )
            # ids sharing: which associator ring slot each window keyframe's
            # ids array IS (in-place canonicalization must keep reaching it).
            p["ba_win_slot"] = np.asarray(
                [next((s for s, st in enumerate(slots) if st is not None and st is k.ids), -1)
                 for k in kfs],
                np.int64,
            )
            present = np.asarray([st is not None for st in slots], bool)
            C = self.cfg.max_tracks
            ring = np.full((len(slots), C), -1, np.int64)
            for s, st in enumerate(slots):
                if st is not None:
                    ring[s] = st
            p["ba_ring_tids"] = ring
            p["ba_ring_present"] = present
            p["ba_next"] = np.asarray(self.associator._next, np.int64)
            p["ba_rejected"] = np.asarray(w.n_rejected, np.int64)
            for j, (res, kf_idxs) in enumerate(w._pending):
                p[f"ba_pend{j}_T"] = np.asarray(res.T_c2w)
                p[f"ba_pend{j}_cost"] = np.asarray(res.cost)
                p[f"ba_pend{j}_cost0"] = np.asarray(res.cost0)
                p[f"ba_pend{j}_idxs"] = np.asarray(kf_idxs, np.int64)
        return p

    @staticmethod
    def _kf_host_arrays(kf) -> tuple:
        """(l_px, r_px, l_desc, mask) of an archived keyframe as host arrays
        (reading back from the device refs where no host copy exists)."""
        l_px = kf.l_px if kf.l_px is not None else np.asarray(kf.dev[0], np.float32)
        r_px = kf.r_px if kf.r_px is not None else np.asarray(kf.dev[1], np.float32)
        desc = kf.l_desc if kf.l_desc is not None else np.asarray(kf.dev[2], np.float32)
        mask = kf.mask if kf.mask is not None else np.asarray(kf.dev[3], bool)
        return np.asarray(l_px, np.float32), np.asarray(r_px, np.float32), desc, np.asarray(mask, bool)

    def restore_state(self, p: dict) -> None:
        """Inverse of checkpoint_state. Call before any submit()."""
        import jax.numpy as jnp

        order = [int(i) for i in p["ref_kf_order"]]
        with self._lock:
            self._kf_order = order
            self._kf_corrected = {i: p["ref_kf_corrected"][k].copy() for k, i in enumerate(order)}
            self._kf_chain = {i: p["ref_kf_chain"][k].copy() for k, i in enumerate(order)}
        self._D = np.asarray(p["ref_D"], np.float64)
        self._loops_closed, self._ba_solves = (int(x) for x in p["ref_counters"])
        if self.lclo is not None and "lc_kf_frame_idx" in p:
            from ..slam.loop_closure import ArchivedKeyframe

            lc = self.lclo
            lc.keyframes = [
                ArchivedKeyframe(
                    frame_idx=int(p["lc_kf_frame_idx"][k]),
                    pose_c2w=p["lc_kf_pose"][k].copy(),
                    l_px=p["lc_kf_lpx"][k],
                    r_px=p["lc_kf_rpx"][k],
                    l_desc=p["lc_kf_desc"][k],
                    mask=p["lc_kf_mask"][k],
                    global_desc=p["lc_kf_gdesc"][k],
                    path_m=float(p["lc_kf_path"][k]),
                    dev=None,  # re-uploaded on demand (_dev_of)
                )
                for k in range(p["lc_kf_frame_idx"].shape[0])
            ]
            lc.loop_edges = [
                (int(a), int(b), Z.copy())
                for a, b, Z in zip(p["lc_edges_a"], p["lc_edges_b"], p["lc_edges_Z"])
            ]
            lc.decimations, lc.skipped_small, lc.n_verified, lc._cooldown_left = (
                int(x) for x in p["lc_scalars"]
            )
            lc._path_m = float(p["lc_path_m"])
            lt = np.asarray(p["lc_last_t"])
            lc._last_t = None if np.isnan(lt).any() else lt
            lc._key = jnp.asarray(p["lc_key"])
            if "lc_pend_ver" in p:
                lc._pending = (
                    int(p["lc_pend_ver"]),
                    [int(x) for x in p["lc_pend_cands"]],
                    (p["lc_pend_ok"], p["lc_pend_ninl"], p["lc_pend_poses"], p["lc_pend_nm"]),
                )
        if self.wba is not None and "ba_win_frame_idx" in p:
            from .ba_runner import Keyframe

            slots: list = [None] * self.associator.n_slots
            for s in range(len(slots)):
                if p["ba_ring_present"][s]:
                    slots[s] = p["ba_ring_tids"][s].copy()
            self.associator._slot_tids = slots
            self.associator._next = int(p["ba_next"])
            live = set()
            for st in slots:
                if st is not None:
                    live.update(int(t) for t in st[st >= 0])
            self.associator._parent = {t: t for t in live}  # canonicalized invariant
            self.wba.window.clear()
            for k in range(p["ba_win_frame_idx"].shape[0]):
                s = int(p["ba_win_slot"][k])
                ids = slots[s] if s >= 0 and slots[s] is not None else p["ba_win_ids"][k].copy()
                self.wba.window.append(
                    Keyframe(
                        frame_idx=int(p["ba_win_frame_idx"][k]),
                        pose_c2w=p["ba_win_pose"][k].copy(),
                        ids=ids,
                        l_px=p["ba_win_lpx"][k],
                        r_px=p["ba_win_rpx"][k],
                        mask=p["ba_win_mask"][k],
                    )
                )
            self.wba.n_rejected = int(p["ba_rejected"])
            from ..ba.window import BAResult

            self.wba._pending.clear()
            j = 0
            while f"ba_pend{j}_T" in p:
                res = BAResult(
                    T_c2w=p[f"ba_pend{j}_T"], X=np.zeros((0, 3), np.float32),
                    cost0=p[f"ba_pend{j}_cost0"], cost=p[f"ba_pend{j}_cost"],
                    n_obs=np.asarray(0),
                )
                self.wba._pending.append((res, [int(x) for x in p[f"ba_pend{j}_idxs"]]))
                j += 1

    # -- worker thread --------------------------------------------------------

    def _finalize(self) -> None:
        """Collect the final in-flight work (the pipelined dispatches at the
        last keyframe have no successor to collect them): the last window
        solve, then the LoopCloser's last verification round, folding an
        end-of-run closure into the ledger."""
        if self.wba is not None:
            for kf_idxs, T_new in self.wba.collect(drain=True):
                self._ba_solves += 1
                with self._lock:
                    for k, fi in enumerate(kf_idxs):
                        self._kf_corrected[fi] = T_new[k].copy()
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
        # Jobs are processed TWO KEYFRAMES LATE: job k's host reads (pose /
        # gdesc / feature payloads) block until the device's dispatch-ahead
        # queue reaches the ops that produced them, and at submit time those
        # ops sit deep in a multi-frame backlog — reading immediately
        # measured ~50 ms of pure queue wait per keyframe (worker_copy_s
        # 43.7 s + lc_collect_s 21.4 s over 899 keyframes, BIGRUN_r04 vo_lc;
        # VERDICT r5 item 4), and one keyframe of depth still left ~35 ms
        # (the main thread dispatches frames well ahead of execution). By
        # the time job k+2 arrives the device has advanced two keyframe
        # periods and the async copies started at submit have landed.
        # Deterministic: processing order is unchanged, only shifted.
        from collections import deque

        staged: deque = deque()

        def drain():
            while staged:
                self._process(staged.popleft())

        while True:
            job = self._q.get()
            if job is _FLUSH:
                try:
                    drain()
                except BaseException as e:
                    self._error = e
                finally:
                    staged.clear()
                    self._q.task_done()
                continue
            if job is None:
                try:
                    drain()
                    self._finalize()
                except BaseException as e:  # surfaced on the main thread
                    self._error = e
                self._q.task_done()
                return
            try:
                if len(staged) >= 2:
                    self._process(staged.popleft())
            except BaseException as e:  # surfaced on the main thread
                self._error = e
            finally:
                staged.append(job)
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
                ),
                query_dev=job.query,
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
                    # An in-flight solve was computed from PRE-closure poses;
                    # collecting it would overwrite the closure correction
                    # with stale absolute poses. Closures are rare — drop it.
                    self.wba.drop_pending()
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

            # Collect the solve dispatched at the PREVIOUS keyframe first
            # (its device result has had a full keyframe period to land —
            # reading at dispatch measured ~120 ms of queue wait per solve,
            # ba_runner.dispatch docstring).
            t0 = time.perf_counter()
            for kf_idxs, T_new in self.wba.collect():
                self._ba_solves += 1
                with self._lock:
                    for k, fi in enumerate(kf_idxs):
                        self._kf_corrected[fi] = T_new[k].copy()
            self._phase_s["ba_collect"] += time.perf_counter() - t0

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
            # NB deliberately NO queue-depth-based solve skipping: that would
            # make which windows get refined depend on thread timing,
            # breaking the worker's determinism guarantee (module docstring).
            # The dispatch is async and the result is collected one keyframe
            # later, so the solve costs the worker only the host-side
            # assemble (~ms), not the ~120 ms device round trip it used to.
            t0 = time.perf_counter()
            self.wba.dispatch()
            self._phase_s["ba_dispatch"] += time.perf_counter() - t0
