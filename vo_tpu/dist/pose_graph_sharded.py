"""Distributed pose-graph optimization: edges sharded over the mesh.

SURVEY §2.3 "Pose-graph optimization across keyframes — multi-chip solve
over keyframe partitions": keyframe poses are small (K x 4 x 4, replicated);
the O(E) work — edge residuals, 6x6 Jacobian blocks, scatter-assembly of the
6K x 6K system — is sharded over the "model" axis and reduced with one psum
per GN iteration. The dense solve of the reduced system is replicated
(cheap, keeps poses bit-identical across devices).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ba import pose_graph as pg


def optimize_sharded(
    g: pg.PoseGraph,
    mesh: Mesh,
    iters: int = 10,
    damping: float = 1e-6,
    axis: str = "model",
) -> pg.PoseGraphResult:
    """Same contract as ba.pose_graph.optimize; E must divide mesh.shape[axis]."""
    with jax.default_matmul_precision("float32"):
        return _optimize_sharded_impl(g, mesh, iters, damping, axis)


def _optimize_sharded_impl(g, mesh, iters, damping, axis) -> pg.PoseGraphResult:
    # (full f32 precision context set by optimize_sharded, matching the
    # single-device solver so sharded == single stays bit-comparable)
    E = g.edge_i.shape[0]
    n = mesh.shape[axis]
    if E % n != 0:
        raise ValueError(f"edge count {E} not divisible by {n} shards")
    K = g.T_c2w.shape[0]

    def local(T_c2w, ei, ej, eT, em, ew):
        shard = pg.PoseGraph(
            T_c2w=T_c2w, edge_i=ei, edge_j=ej, edge_T=eT, edge_mask=em, edge_weight=ew
        )
        w = jnp.where(em, ew, 0.0)

        def cost_of(T):
            Ti = jnp.take(T, ei, axis=0)
            Tj = jnp.take(T, ej, axis=0)
            z6 = jnp.zeros((ei.shape[0], 6), T.dtype)
            r = jax.vmap(pg._edge_residual)(z6, z6, Ti, Tj, eT)
            return jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), axis)

        def gn_step(carry, _):
            T, lam = carry
            r, Ji, Jj = pg._residuals_and_jac(T, shard)
            H = jnp.zeros((K, 6, K, 6), T.dtype)
            b = jnp.zeros((K, 6), T.dtype)
            Jiw = Ji * w[:, None, None]
            Jjw = Jj * w[:, None, None]
            H = H.at[ei, :, ei, :].add(jnp.einsum("eab,eac->ebc", Jiw, Ji))
            H = H.at[ej, :, ej, :].add(jnp.einsum("eab,eac->ebc", Jjw, Jj))
            Hij = jnp.einsum("eab,eac->ebc", Jiw, Jj)
            H = H.at[ei, :, ej, :].add(Hij)
            H = H.at[ej, :, ei, :].add(jnp.swapaxes(Hij, -1, -2))
            b = b.at[ei].add(-jnp.einsum("eab,ea->eb", Jiw, r))
            b = b.at[ej].add(-jnp.einsum("eab,ea->eb", Jjw, r))
            # The one collective per iteration: reduce the edge-sharded system.
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            eye6 = jnp.eye(6, dtype=T.dtype)
            # Anchor node 0 + edge-less nodes (see ba.pose_graph.optimize).
            deg = (
                jnp.zeros((K,), T.dtype)
                .at[ei]
                .add(jnp.where(em, 1.0, 0.0))
                .at[ej]
                .add(jnp.where(em, 1.0, 0.0))
            )
            deg = jax.lax.psum(deg, axis)
            anchor = jnp.where(
                (jnp.arange(K) == 0) | (deg == 0), jnp.asarray(1e6, T.dtype), 0.0
            )
            # Adaptive LM damping (see ba.pose_graph.optimize).
            Hd = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
                (anchor + lam)[:, None, None] * eye6
            )
            dxi = jnp.linalg.solve(Hd.reshape(6 * K, 6 * K), b.reshape(6 * K)).reshape(K, 6)
            from ..geom import se3

            T_try = jnp.einsum("kij,kjl->kil", jax.vmap(se3.exp)(dxi), T)
            better = cost_of(T_try) < cost_of(T)
            T_new = jnp.where(better, T_try, T)
            lam_new = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8), lam * 10.0)
            return (T_new, lam_new), None

        cost0 = cost_of(T_c2w)
        (T, _), _ = jax.lax.scan(
            # Start lambda AT the caller's damping — same rationale as
            # ba.pose_graph._optimize_impl (the 1e-4 floor suppressed the
            # O(1/n^2) chain-bend modes a loop correction must ride).
            gn_step, (T_c2w, jnp.asarray(damping, T_c2w.dtype)), None, length=iters
        )
        return T, cost0, cost_of(T)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    T, c0, c = fn(g.T_c2w, g.edge_i, g.edge_j, g.edge_T, g.edge_mask, g.edge_weight)
    return pg.PoseGraphResult(T_c2w=T, cost0=c0, cost=c)
