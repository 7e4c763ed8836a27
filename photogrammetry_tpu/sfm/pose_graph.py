"""Pose-graph optimization (SLAM backend).

North-star component (BASELINE.json; absent from the reference).  Nodes are
world→camera SE(3) poses; an edge (i, j) carries a measured relative
transform Z_ij with the convention T_j ≈ Z_ij ∘ T_i, and residual
r_ij = log_SE3(T_j ∘ (Z_ij T_i)^-1) ∈ R^6.

TPU-native design: per-edge residual Jacobians (w.r.t. the left-increment
twists of both endpoint poses) come from vmapped autodiff at zero increment
— batched 6x6 blocks, no scalar loops — and the Gauss-Newton system is
scatter-assembled into a dense (6N, 6N) matrix (keyframe graphs are small;
for submap-sharded graphs the edge set shards over a mesh axis and the same
assembly psums, mirroring parallel/dist_ba.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from photogrammetry_tpu.core.lie import se3_exp, se3_log


class PoseGraph(NamedTuple):
    edges: jnp.ndarray      # (E, 2) int32 node indices (i, j)
    z_rs: jnp.ndarray       # (E, 3, 3) measured relative rotations
    z_ts: jnp.ndarray       # (E, 3) measured relative translations
    weights: jnp.ndarray    # (E,) float32 edge information weights


def relative_pose(r_i, t_i, r_j, t_j):
    """Z such that T_j = Z ∘ T_i for world→cam poses."""
    r = r_j @ r_i.T
    t = t_j - r @ t_i
    return r, t


def _edge_residual(r_i, t_i, r_j, t_j, z_r, z_t):
    """log_SE3(T_j ∘ (Z T_i)^-1) as a 6-vector."""
    pr = z_r @ r_i                 # predicted R_j
    pt = z_r @ t_i + z_t           # predicted t_j
    er = r_j @ pr.T
    et = t_j - er @ pt
    return se3_log(er, et)


def _edge_residual_perturbed(xi_i, xi_j, r_i, t_i, r_j, t_j, z_r, z_t):
    dri, dti = se3_exp(xi_i)
    drj, dtj = se3_exp(xi_j)
    return _edge_residual(dri @ r_i, dri @ t_i + dti,
                          drj @ r_j, drj @ t_j + dtj, z_r, z_t)


def _edge_terms(rs, ts, graph: PoseGraph):
    """Residuals (E, 6) and Jacobians (E, 6, 6) x2 via vmapped autodiff."""
    ii = graph.edges[:, 0]
    jj = graph.edges[:, 1]
    zero = jnp.zeros(6)

    def one(r_i, t_i, r_j, t_j, z_r, z_t):
        f = lambda xi_i, xi_j: _edge_residual_perturbed(
            xi_i, xi_j, r_i, t_i, r_j, t_j, z_r, z_t)
        r = f(zero, zero)
        j_i = jax.jacfwd(f, argnums=0)(zero, zero)
        j_j = jax.jacfwd(f, argnums=1)(zero, zero)
        return r, j_i, j_j

    return jax.vmap(one)(rs[ii], ts[ii], rs[jj], ts[jj],
                         graph.z_rs, graph.z_ts)


class PoseGraphResult(NamedTuple):
    rs: jnp.ndarray
    ts: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray


@partial(jax.jit, static_argnames=("num_iterations",))
def optimize_pose_graph(rs: jnp.ndarray, ts: jnp.ndarray, graph: PoseGraph,
                        num_iterations: int = 20,
                        init_lambda: float = 1e-4,
                        fixed_nodes: jnp.ndarray | None = None
                        ) -> PoseGraphResult:
    """LM pose-graph optimization; node 0 frozen by default (gauge)."""
    n = rs.shape[0]
    if fixed_nodes is None:
        fixed_nodes = jnp.ones((n,)).at[0].set(0.0)
    fn = fixed_nodes.astype(jnp.float32)
    ii = graph.edges[:, 0]
    jj = graph.edges[:, 1]
    w = graph.weights

    def cost_of(rs, ts):
        r, _, _ = _edge_terms(rs, ts, graph)
        return 0.5 * jnp.sum(w[:, None] * r * r)

    def solve(rs, ts, lam):
        r, j_i, j_j = _edge_terms(rs, ts, graph)
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

        # damping + gauge freeze
        diag = jnp.einsum("nnii->ni", h)
        h = h.at[jnp.arange(n), jnp.arange(n)].add(
            lam * jnp.eye(6) * jnp.maximum(diag, 1e-6)[:, None, :]
            * jnp.eye(6))
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
    return PoseGraphResult(rs=rs, ts=ts, cost=cost, initial_cost=cost0)


# --------------------------------------------------------------- Sim(3)

class PoseGraphSim3(NamedTuple):
    """Similarity pose graph: nodes are world->cam Sim(3) transforms
    x_cam = s R x_w + t; an edge carries (z_r, z_t, z_s) with the
    convention S_j ~= Z o S_i, i.e. pred R_j = z_r R_i, pred s_j =
    z_s s_i, pred t_j = z_s z_r t_i + z_t.

    The classic monocular-SLAM backend (ORB-SLAM's loop closing): SE(3)
    graphs cannot absorb the per-seam scale drift submap chaining
    accumulates — a scale-drifted orbit keeps its spiral shape under any
    SE(3) correction; the Sim(3) graph distributes the log-scale error
    over the trajectory (measured on the 201-frame out-and-back stress:
    see tests/test_pose_graph.py::test_sim3_recovers_scale_drift)."""
    edges: jnp.ndarray      # (E, 2) int32
    z_rs: jnp.ndarray       # (E, 3, 3)
    z_ts: jnp.ndarray       # (E, 3)
    z_ss: jnp.ndarray       # (E,) measured relative scales
    weights: jnp.ndarray    # (E,)


def _sim3_edge_residual(r_i, t_i, g_i, r_j, t_j, g_j, z_r, z_t, z_s):
    """(7,) residual: log of the relative-similarity error
    E = Z o S_i o S_j^{-1} (identity when the edge is satisfied); g = log s.

    The translation row couples the node scales to the geometry —
    e.g. a zero-baseline revisit edge (z_t = 0, z_s = 1) is satisfied
    exactly when the two camera CENTERS coincide for ANY scales, which is
    what lets the optimizer trade trajectory scale against loop error
    (the whole point of Sim(3) over SE(3) for monocular drift)."""
    s_ratio = jnp.exp(g_i - g_j)                   # s_i / s_j
    rij = r_i @ r_j.T
    er = z_r @ rij
    et = z_s * (z_r @ (t_i - s_ratio * (rij @ t_j))) + z_t
    es = jnp.log(z_s) + g_i - g_j
    return jnp.concatenate([se3_log(er, et), es[None]])


def _sim3_edge_residual_perturbed(xi_i, xi_j, r_i, t_i, g_i,
                                  r_j, t_j, g_j, z_r, z_t, z_s):
    dri, dti = se3_exp(xi_i[:6])
    drj, dtj = se3_exp(xi_j[:6])
    return _sim3_edge_residual(dri @ r_i, dri @ t_i + dti, g_i + xi_i[6],
                               drj @ r_j, drj @ t_j + dtj, g_j + xi_j[6],
                               z_r, z_t, z_s)


def _sim3_edge_terms(rs, ts, gs, graph: PoseGraphSim3):
    ii = graph.edges[:, 0]
    jj = graph.edges[:, 1]
    zero = jnp.zeros(7)

    def one(r_i, t_i, g_i, r_j, t_j, g_j, z_r, z_t, z_s):
        f = lambda a, b: _sim3_edge_residual_perturbed(
            a, b, r_i, t_i, g_i, r_j, t_j, g_j, z_r, z_t, z_s)
        return (f(zero, zero), jax.jacfwd(f, argnums=0)(zero, zero),
                jax.jacfwd(f, argnums=1)(zero, zero))

    return jax.vmap(one)(rs[ii], ts[ii], gs[ii], rs[jj], ts[jj], gs[jj],
                         graph.z_rs, graph.z_ts, graph.z_ss)


class PoseGraphSim3Result(NamedTuple):
    rs: jnp.ndarray
    ts: jnp.ndarray         # SE(3)-folded: t / s, so C = -R^T t directly
    scales: jnp.ndarray     # (N,) optimized per-node scales
    cost: jnp.ndarray
    initial_cost: jnp.ndarray


@partial(jax.jit, static_argnames=("num_iterations",))
def optimize_pose_graph_sim3(rs: jnp.ndarray, ts: jnp.ndarray,
                             graph: PoseGraphSim3,
                             num_iterations: int = 20,
                             init_lambda: float = 1e-4,
                             fixed_nodes: jnp.ndarray | None = None
                             ) -> PoseGraphSim3Result:
    """LM Sim(3) pose-graph optimization; node 0 frozen (gauge: both its
    pose and its unit scale).  Input poses are SE(3) (initial scales 1);
    the returned (rs, ts) have each node's optimized scale folded into
    its translation so downstream SE(3) consumers see the corrected
    geometry (C_i = -R_i^T t_i)."""
    n = rs.shape[0]
    if fixed_nodes is None:
        fixed_nodes = jnp.ones((n,)).at[0].set(0.0)
    fn = fixed_nodes.astype(jnp.float32)
    ii = graph.edges[:, 0]
    jj = graph.edges[:, 1]
    w = graph.weights
    gs0 = jnp.zeros((n,))

    def cost_of(rs, ts, gs):
        r, _, _ = _sim3_edge_terms(rs, ts, gs, graph)
        return 0.5 * jnp.sum(w[:, None] * r * r)

    def solve(rs, ts, gs, lam):
        r, j_i, j_j = _sim3_edge_terms(rs, ts, gs, graph)
        sw = jnp.sqrt(w)[:, None]
        r = r * sw
        j_i = j_i * sw[..., None]
        j_j = j_j * sw[..., None]

        h = jnp.zeros((n, n, 7, 7))
        h = h.at[ii, ii].add(jnp.einsum("eri,erj->eij", j_i, j_i))
        h = h.at[jj, jj].add(jnp.einsum("eri,erj->eij", j_j, j_j))
        h = h.at[ii, jj].add(jnp.einsum("eri,erj->eij", j_i, j_j))
        h = h.at[jj, ii].add(jnp.einsum("eri,erj->eij", j_j, j_i))
        b = jnp.zeros((n, 7))
        b = b.at[ii].add(-jnp.einsum("eri,er->ei", j_i, r))
        b = b.at[jj].add(-jnp.einsum("eri,er->ei", j_j, r))

        diag = jnp.einsum("nnii->ni", h)
        h = h.at[jnp.arange(n), jnp.arange(n)].add(
            lam * jnp.eye(7) * jnp.maximum(diag, 1e-6)[:, None, :]
            * jnp.eye(7))
        h = h * (fn[:, None, None, None] * fn[None, :, None, None])
        h = h.at[jnp.arange(n), jnp.arange(n)].add(
            (1.0 - fn)[:, None, None] * jnp.eye(7))
        b = b * fn[:, None]

        hm = h.transpose(0, 2, 1, 3).reshape(7 * n, 7 * n)
        delta = jnp.linalg.solve(hm, b.reshape(-1)).reshape(n, 7)
        delta = delta * fn[:, None]
        dr, dt = se3_exp(delta[:, :6])
        return (jnp.einsum("nij,njk->nik", dr, rs),
                jnp.einsum("nij,nj->ni", dr, ts) + dt,
                gs + delta[:, 6])

    cost0 = cost_of(rs, ts, gs0)

    def body(carry, _):
        rs, ts, gs, lam, cost = carry
        rs2, ts2, gs2 = solve(rs, ts, gs, lam)
        new_cost = cost_of(rs2, ts2, gs2)
        accept = new_cost < cost
        rs = jnp.where(accept, rs2, rs)
        ts = jnp.where(accept, ts2, ts)
        gs = jnp.where(accept, gs2, gs)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                        jnp.minimum(lam * 4.0, 1e8))
        return (rs, ts, gs, lam, cost), cost

    (rs, ts, gs, _, cost), _ = lax.scan(
        body, (rs, ts, gs0, jnp.float32(init_lambda), cost0), None,
        length=num_iterations)
    scales = jnp.exp(gs)
    # fold scale into the translation: C_i = -R^T t / s  ->  t' = t / s
    return PoseGraphSim3Result(rs=rs, ts=ts / scales[:, None],
                               scales=scales, cost=cost,
                               initial_cost=cost0)
