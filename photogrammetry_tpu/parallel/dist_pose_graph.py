"""Distributed pose-graph optimization: edges sharded over the mesh.

The pose-graph analogue of parallel/dist_ba.py — each device owns an edge
shard (in a SLAM deployment, the edges of its submaps), builds its partial
Gauss-Newton system, and one `psum` over the mesh axis assembles the global
(6N, 6N) system; the solve is replicated and updates are identical on every
device.  Per-iteration traffic is the psum of H and b only — O(N^2 * 36)
floats independent of edge count, riding ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from photogrammetry_tpu.core.lie import se3_exp
from photogrammetry_tpu.sfm.pose_graph import (
    PoseGraph, PoseGraphResult, _edge_terms,
)


def pad_graph(graph: PoseGraph, multiple: int) -> PoseGraph:
    """Pad the edge set to a multiple of the mesh size with zero-weight
    self-edges (i=j=0, identity measurement — no gradient contribution)."""
    e = graph.edges.shape[0]
    pad = (-e) % multiple
    if pad == 0:
        return graph
    return PoseGraph(
        edges=jnp.concatenate([graph.edges,
                               jnp.zeros((pad, 2), jnp.int32)]),
        z_rs=jnp.concatenate([graph.z_rs,
                              jnp.tile(jnp.eye(3)[None], (pad, 1, 1))]),
        z_ts=jnp.concatenate([graph.z_ts, jnp.zeros((pad, 3))]),
        weights=jnp.concatenate([graph.weights, jnp.zeros((pad,))]),
    )


def distributed_optimize_pose_graph(rs, ts, graph: PoseGraph, mesh: Mesh,
                                    num_iterations: int = 20,
                                    init_lambda: float = 1e-4,
                                    fixed_nodes=None,
                                    axis: str = "tracks",
                                    solver: str = "auto",
                                    cg_iterations: int = 100
                                    ) -> PoseGraphResult:
    """Same semantics as sfm.pose_graph.optimize_pose_graph with the edge
    dimension sharded over ``axis`` (edge count must divide the axis size —
    use pad_graph).

    solver:
      'dense' — assemble and psum the full (N, N, 6, 6) system, direct
        solve.  Exact, but O(N^2) memory and collective traffic; right for
        windows of tens of nodes.
      'cg'    — never materialize H: block-Jacobi-preconditioned conjugate
        gradient whose matvec is computed from the local edge shard, so the
        only collective per CG step is a psum of an (N, 6) vector —
        memory and traffic scale with edges/nodes, not N^2.  This is the
        SLAM-scale path (hundreds+ of submap nodes).
      'auto'  — 'dense' for N <= 64 else 'cg'.
    """
    n = rs.shape[0]
    if solver == "auto":
        solver = "dense" if n <= 64 else "cg"
    if solver == "cg":
        return _optimize_pose_graph_cg(rs, ts, graph, mesh, num_iterations,
                                       init_lambda, fixed_nodes, axis,
                                       cg_iterations)
    if fixed_nodes is None:
        fixed_nodes = jnp.ones((n,)).at[0].set(0.0)

    pspec_graph = PoseGraph(edges=P(axis), z_rs=P(axis), z_ts=P(axis),
                            weights=P(axis))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), pspec_graph, P()),
             out_specs=(P(), P(), P()),
             check_rep=False)
    def run(rs, ts, g, fn):
        ii = g.edges[:, 0]
        jj = g.edges[:, 1]
        w = g.weights

        def cost_of(rs, ts):
            r, _, _ = _edge_terms(rs, ts, g)
            return lax.psum(0.5 * jnp.sum(w[:, None] * r * r), axis)

        def solve(rs, ts, lam):
            r, j_i, j_j = _edge_terms(rs, ts, g)
            sw = jnp.sqrt(w)[:, None]
            r = r * sw
            j_i = j_i * sw[..., None]
            j_j = j_j * sw[..., None]

            h = jnp.zeros((n, n, 6, 6))
            h = h.at[ii, ii].add(jnp.einsum("eri,erj->eij", j_i, j_i))
            h = h.at[jj, jj].add(jnp.einsum("eri,erj->eij", j_j, j_j))
            h = h.at[ii, jj].add(jnp.einsum("eri,erj->eij", j_i, j_j))
            h = h.at[jj, ii].add(jnp.einsum("eri,erj->eij", j_j, j_i))
            b = jnp.zeros((n, 6))
            b = b.at[ii].add(-jnp.einsum("eri,er->ei", j_i, r))
            b = b.at[jj].add(-jnp.einsum("eri,er->ei", j_j, r))
            # one collective closes the reduction over edge shards
            h = lax.psum(h, axis)
            b = lax.psum(b, axis)

            diag = jnp.einsum("nnii->ni", h)
            h = h.at[jnp.arange(n), jnp.arange(n)].add(
                lam * jnp.maximum(diag, 1e-6)[:, None, :] * jnp.eye(6))
            h = h * (fn[:, None, None, None] * fn[None, :, None, None])
            h = h.at[jnp.arange(n), jnp.arange(n)].add(
                (1.0 - fn)[:, None, None] * jnp.eye(6))
            b = b * fn[:, None]

            hm = h.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
            delta = jnp.linalg.solve(hm, b.reshape(-1)).reshape(n, 6)
            delta = delta * fn[:, None]
            dr, dt = se3_exp(delta)
            return (jnp.einsum("nij,njk->nik", dr, rs),
                    jnp.einsum("nij,nj->ni", dr, ts) + dt)

        cost0 = cost_of(rs, ts)

        def body(carry, _):
            rs, ts, lam, cost = carry
            rs2, ts2 = solve(rs, ts, lam)
            new_cost = cost_of(rs2, ts2)
            accept = new_cost < cost
            rs = jnp.where(accept, rs2, rs)
            ts = jnp.where(accept, ts2, ts)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e8))
            return (rs, ts, lam, cost), cost

        (rs, ts, _, cost), _ = lax.scan(
            body, (rs, ts, jnp.float32(init_lambda), cost0), None,
            length=num_iterations)
        return rs, ts, jnp.stack([cost0, cost])

    rs2, ts2, costs = run(rs, ts, graph, fixed_nodes.astype(jnp.float32))
    return PoseGraphResult(rs=rs2, ts=ts2, cost=costs[1],
                           initial_cost=costs[0])


def _optimize_pose_graph_cg(rs, ts, graph: PoseGraph, mesh: Mesh,
                            num_iterations: int, init_lambda: float,
                            fixed_nodes, axis: str,
                            cg_iterations: int) -> PoseGraphResult:
    """Edge-sharded Gauss-Newton with a matrix-free PCG inner solve.

    Each device keeps only its edge shard's residuals/Jacobians.  The
    normal-equation matvec H v is evaluated edge-wise:
        u_e   = J_i v_i + J_j v_j                (local, per edge)
        (Hv)  = psum( scatter-add of J^T u )     one (N, 6) collective
    plus the LM damping term and a gauge projection.  Block-Jacobi
    preconditioning uses the psummed (N, 6, 6) diagonal blocks.
    """
    n = rs.shape[0]
    if fixed_nodes is None:
        fixed_nodes = jnp.ones((n,)).at[0].set(0.0)

    pspec_graph = PoseGraph(edges=P(axis), z_rs=P(axis), z_ts=P(axis),
                            weights=P(axis))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), pspec_graph, P()),
             out_specs=(P(), P(), P()),
             check_rep=False)
    def run(rs, ts, g, fn):
        ii = g.edges[:, 0]
        jj = g.edges[:, 1]
        w = g.weights
        fmask = fn[:, None]  # (N, 1): 1 free, 0 gauge-fixed

        def cost_of(rs, ts):
            r, _, _ = _edge_terms(rs, ts, g)
            return lax.psum(0.5 * jnp.sum(w[:, None] * r * r), axis)

        def solve(rs, ts, lam):
            r, j_i, j_j = _edge_terms(rs, ts, g)
            sw = jnp.sqrt(w)[:, None]
            r = r * sw
            j_i = j_i * sw[..., None]
            j_j = j_j * sw[..., None]

            b = jnp.zeros((n, 6))
            b = b.at[ii].add(-jnp.einsum("eri,er->ei", j_i, r))
            b = b.at[jj].add(-jnp.einsum("eri,er->ei", j_j, r))
            b = lax.psum(b, axis) * fmask

            hdiag = jnp.zeros((n, 6, 6))
            hdiag = hdiag.at[ii].add(jnp.einsum("eri,erj->eij", j_i, j_i))
            hdiag = hdiag.at[jj].add(jnp.einsum("eri,erj->eij", j_j, j_j))
            hdiag = lax.psum(hdiag, axis)
            dd = jnp.einsum("nii->ni", hdiag)          # (N, 6)
            damp = lam * jnp.maximum(dd, 1e-6)
            hdiag = hdiag + damp[:, :, None] * jnp.eye(6)
            # gauge-fixed nodes act as identity rows
            hdiag = (hdiag * fn[:, None, None]
                     + (1.0 - fn)[:, None, None] * jnp.eye(6))
            minv = jnp.linalg.inv(hdiag)               # block-Jacobi

            def matvec(v):
                v = v * fmask
                u = (jnp.einsum("erc,ec->er", j_i, v[ii])
                     + jnp.einsum("erc,ec->er", j_j, v[jj]))
                hv = jnp.zeros((n, 6))
                hv = hv.at[ii].add(jnp.einsum("erc,er->ec", j_i, u))
                hv = hv.at[jj].add(jnp.einsum("erc,er->ec", j_j, u))
                hv = lax.psum(hv, axis)
                return (hv + damp * v) * fmask

            def precond(v):
                return jnp.einsum("nij,nj->ni", minv, v) * fmask

            # PCG with static trip count; converged states are held fixed
            # by guarding the step size (docs/tpu_notes.md §2: static trip
            # counts, no data-dependent while_loops).
            x = jnp.zeros((n, 6))
            res = b  # b - H @ 0
            z = precond(res)
            p = z
            rz = jnp.sum(res * z)

            def cg_step(carry, _):
                x, res, p, rz = carry
                hp = matvec(p)
                php = jnp.sum(p * hp)
                ok = (php > 1e-20) & (rz > 1e-20)
                alpha = jnp.where(ok, rz / jnp.where(ok, php, 1.0), 0.0)
                x = x + alpha * p
                res2 = res - alpha * hp
                z2 = precond(res2)
                rz2 = jnp.sum(res2 * z2)
                beta = jnp.where(ok, rz2 / jnp.where(rz > 1e-20, rz, 1.0),
                                 0.0)
                p = z2 + beta * p
                return (x, res2, p, rz2), None

            (delta, _, _, _), _ = lax.scan(cg_step, (x, res, p, rz), None,
                                           length=cg_iterations)
            delta = delta * fmask
            dr, dt = se3_exp(delta)
            return (jnp.einsum("nij,njk->nik", dr, rs),
                    jnp.einsum("nij,nj->ni", dr, ts) + dt)

        cost0 = cost_of(rs, ts)

        def body(carry, _):
            rs, ts, lam, cost = carry
            rs2, ts2 = solve(rs, ts, lam)
            new_cost = cost_of(rs2, ts2)
            accept = new_cost < cost
            rs = jnp.where(accept, rs2, rs)
            ts = jnp.where(accept, ts2, ts)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e8))
            return (rs, ts, lam, cost), cost

        (rs, ts, _, cost), _ = lax.scan(
            body, (rs, ts, jnp.float32(init_lambda), cost0), None,
            length=num_iterations)
        return rs, ts, jnp.stack([cost0, cost])

    rs2, ts2, costs = run(rs, ts, graph, fixed_nodes.astype(jnp.float32))
    return PoseGraphResult(rs=rs2, ts=ts2, cost=costs[1],
                           initial_cost=costs[0])
