"""Vectorized RANSAC-P3P world-pose estimation + Gauss-Newton refinement.

Replaces MATLAB ``estworldpose`` (VO.m:123-127): MSAC over P3P minimal
samples, 1 px reprojection gate, refinement on the consensus set, returning
the CAMERA pose expressed in the 3D points' frame (camera-to-world), exactly
the convention the reference chains at VO.m:130.

TPU-first design: the MATLAB MSAC loop is sequential with early exit; here a
FIXED batch of `n_hypotheses` minimal samples is drawn with a deterministic
PRNG, all P3P quartics are solved at once (pose/p3p.py), and all
(hypothesis x point) reprojection errors are scored as one batched reduction
feeding an argmin — the classic hypothesis-parallel formulation that maps
onto the MXU/VPU instead of a data-dependent loop. Refinement is a fixed
`refine_iters` Gauss-Newton/IRLS on the masked inlier set (6x6 solve).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RansacConfig
from ..geom import se3
from ..geom.camera import StereoCalib
from .p3p import p3p_grunert


class PoseEstimate(NamedTuple):
    pose_c2w: jnp.ndarray  # [4, 4] camera pose in the 3D points' frame
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray  # scalar bool — False => caller should fall back
    mean_err: jnp.ndarray  # scalar, mean inlier reprojection error (px)


def _project_w2c(R, t, pts, calib: StereoCalib):
    """Project world points through [R|t] (world->cam) with left intrinsics."""
    Xc = jnp.einsum("...ij,nj->...ni", R, pts) + t[..., None, :]
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = calib.fu * Xc[..., 0] / zs + calib.cu
    v = calib.fv * Xc[..., 1] / zs + calib.cv
    return jnp.stack([u, v], axis=-1), z


def _bearings(px: jnp.ndarray, calib: StereoCalib) -> jnp.ndarray:
    x = (px[..., 0] - calib.cu) / calib.fu
    y = (px[..., 1] - calib.cv) / calib.fv
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _sample_triples(key, mask, n_hyp):
    """Draw [H, 3] indices of valid correspondences (Gumbel top-3 per hypothesis,
    so the three indices within a hypothesis are distinct)."""
    logits = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hyp, mask.shape[0]))
    _, idx = jax.lax.top_k(logits[None, :] + g, 3)
    return idx


def refine_pose(
    R0, t0, px2d, pts3d, weights, calib: StereoCalib, iters: int, huber_px: float = 2.0
):
    """Masked IRLS Gauss-Newton on the world->cam pose. Returns refined (R, t)."""

    def step(carry, _):
        R, t = carry
        pred, z = _project_w2c(R, t, pts3d, calib)
        r = pred - px2d  # [N, 2]
        err = jnp.linalg.norm(r, axis=-1)
        w_huber = jnp.where(err <= huber_px, 1.0, huber_px / jnp.maximum(err, 1e-9))
        w = weights * w_huber
        Xc = jnp.einsum("ij,nj->ni", R, pts3d) + t
        x, y, zc = Xc[:, 0], Xc[:, 1], jnp.where(jnp.abs(Xc[:, 2]) < 1e-6, 1e-6, Xc[:, 2])
        inv_z = 1.0 / zc
        fu, fv = calib.fu, calib.fv
        # d(pred)/d(Xc): [N, 2, 3]
        zr = jnp.zeros_like(x)
        Jp = jnp.stack(
            [
                jnp.stack([fu * inv_z, zr, -fu * x * inv_z * inv_z], axis=-1),
                jnp.stack([zr, fv * inv_z, -fv * y * inv_z * inv_z], axis=-1),
            ],
            axis=-2,
        )
        # d(Xc)/d(xi) with left-multiplicative update exp(xi) on (R, t):
        # [I | -[Xc]x] -> [N, 3, 6]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), (Xc.shape[0], 3, 3))
        Jx = jnp.concatenate([eye, -se3.hat(Xc)], axis=-1)
        J = jnp.einsum("nij,njk->nik", Jp, Jx)  # [N, 2, 6]
        H = jnp.einsum("n,nik,nil->kl", w, J, J) + 1e-6 * jnp.eye(6, dtype=J.dtype)
        g = jnp.einsum("n,nik,ni->k", w, J, r)
        delta = jnp.linalg.solve(H, g[:, None])[:, 0]
        T = se3.from_rt(R, t)
        T_new = se3.compose(se3.exp(-delta), T)
        return (se3.rotation(T_new), se3.translation(T_new)), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t


def best_hypothesis(
    px2d: jnp.ndarray,
    pts3d: jnp.ndarray,
    mask: jnp.ndarray,
    calib: StereoCalib,
    cfg: RansacConfig,
    key: jax.Array,
    n_hypotheses: int | None = None,
):
    """Hypothesize + MSAC-score a batch; return the local winner.

    Split out so dist.ransac_sharded can run it per mesh shard (each shard
    draws its own hypothesis batch) and reduce the winners with one
    all_gather/argmin — the TPU analogue of distributing the MSAC loop.

    Returns (R_w2c, t_w2c, msac_score, any_valid).
    """
    # Full f32 matmul precision throughout: the geometry matmuls here are
    # [*, 3, 3]-sized (negligible FLOPs), but at the TPU default bf16 passes
    # the world-point coordinates (tens of meters) lose ~0.4% per contraction
    # — tens of centimeters of reprojection noise that dominates the ATE.
    with jax.default_matmul_precision("float32"):
        n_hyp = cfg.n_hypotheses if n_hypotheses is None else n_hypotheses
        bear = _bearings(px2d, calib)
        idx = _sample_triples(key, mask, n_hyp)  # [H, 3]
        tri_bear = jnp.take(bear, idx, axis=0)  # [H, 3, 3]
        tri_pts = jnp.take(pts3d, idx, axis=0)  # [H, 3, 3]
        sols = p3p_grunert(tri_bear, tri_pts)  # [H, 4, ...]
        H_total = n_hyp * 4
        R_all = sols.R_w2c.reshape(H_total, 3, 3)
        t_all = sols.t_w2c.reshape(H_total, 3)
        valid_h = sols.valid.reshape(H_total)

        # --- score: one [H*4, N] reprojection reduction (MSAC) ---
        pred, z = _project_w2c(R_all, t_all, pts3d, calib)  # [H, N, 2]
        err2 = jnp.sum((pred - px2d) ** 2, axis=-1)  # [H, N]
        thr2 = cfg.max_reproj_err_px**2
        point_ok = mask[None, :] & (z > 0.0)
        msac = jnp.sum(jnp.where(point_ok, jnp.minimum(err2, thr2), thr2), axis=-1)
        msac = jnp.where(valid_h, msac, jnp.inf)
        best = jnp.argmin(msac)
        return R_all[best], t_all[best], msac[best], jnp.any(valid_h)


def finalize_pose(
    R_best,
    t_best,
    any_valid,
    px2d,
    pts3d,
    mask,
    calib: StereoCalib,
    cfg: RansacConfig,
) -> PoseEstimate:
    """Refine the winning hypothesis on its consensus set and package the result."""
    return _finalize_f32(R_best, t_best, any_valid, px2d, pts3d, mask, calib, cfg)


def _f32_matmul(fn):
    """Trace the wrapped function under full f32 matmul precision (see
    best_hypothesis: the geometry contractions are tiny but bf16-sensitive)."""

    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


@_f32_matmul
def _finalize_f32(R_best, t_best, any_valid, px2d, pts3d, mask, calib, cfg) -> PoseEstimate:
    n_valid = jnp.sum(mask)
    thr2 = cfg.max_reproj_err_px**2
    pred0, z0 = _project_w2c(R_best, t_best, pts3d, calib)
    err2_0 = jnp.sum((pred0 - px2d) ** 2, axis=-1)
    point_ok = mask & (z0 > 0.0)
    inliers0 = point_ok & (err2_0 < thr2)

    # --- refine on the consensus set (IRLS-GN, fixed iterations) ---
    w = inliers0.astype(px2d.dtype)
    R_ref, t_ref = refine_pose(R_best, t_best, px2d, pts3d, w, calib, cfg.refine_iters)
    # Re-gate inliers with the refined pose.
    pred_r, z_r = _project_w2c(R_ref, t_ref, pts3d, calib)
    err2_r = jnp.sum((pred_r - px2d) ** 2, axis=-1)
    inliers = mask & (z_r > 0) & (err2_r < thr2)
    # Keep the refined pose only if it didn't lose the consensus.
    better = jnp.sum(inliers) >= jnp.sum(inliers0)
    R_fin = jnp.where(better, R_ref, R_best)
    t_fin = jnp.where(better, t_ref, t_best)
    inliers = jnp.where(better, inliers, inliers0)

    n_in = jnp.sum(inliers)
    ok = (n_valid >= cfg.min_points) & any_valid & (n_in >= 3)
    err_fin = jnp.sqrt(jnp.where(better, err2_r, err2_0))
    mean_err = jnp.sum(jnp.where(inliers, err_fin, 0.0)) / jnp.maximum(n_in, 1)
    # estworldpose convention: camera pose in the world (= prev-camera) frame.
    T_w2c = se3.from_rt(R_fin, t_fin)
    return PoseEstimate(
        pose_c2w=se3.inv(T_w2c),
        inliers=inliers,
        n_inliers=n_in,
        ok=ok,
        mean_err=mean_err,
    )


def estimate_world_pose(
    px2d: jnp.ndarray,  # [N, 2] current-frame LEFT pixels (VO.m:124)
    pts3d: jnp.ndarray,  # [N, 3] 3D points in the reference (prev-camera) frame (VO.m:125)
    mask: jnp.ndarray,  # [N] validity
    calib: StereoCalib,
    cfg: RansacConfig,
    key: jax.Array,
) -> PoseEstimate:
    """Single-device RANSAC-P3P (hypothesize/score + refine). Fully jittable."""
    R_best, t_best, _, any_valid = best_hypothesis(px2d, pts3d, mask, calib, cfg, key)
    return finalize_pose(R_best, t_best, any_valid, px2d, pts3d, mask, calib, cfg)
