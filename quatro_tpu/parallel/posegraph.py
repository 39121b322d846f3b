"""Pose-graph loop closing over registered scan pairs.

The reference stops at single-pair registration; loop closing is the
framework's multi-pair/multi-host extension (BASELINE.json configs 2 & 5):
given relative 4-DoF measurements (yaw + 3-D translation, Quatro's output
space) along a trajectory plus loop-closure edges, solve for globally
consistent poses.

TPU-native design: Gauss-Newton where each linearized step is solved by
MATRIX-FREE conjugate gradients on the normal equations J^T W J delta =
-J^T W r. The only primitives are edge-wise gathers, dense per-edge algebra,
and segment-sum scatters back to poses — under `shard_map` the edges shard
across the ('pairs',) mesh axis and the scatter becomes a local segment_sum
followed by one `psum` (the distributed Schur-style reduction; no
sparse-matrix assembly anywhere).

State space: poses (M, 4) = (x, y, z, yaw). Gauge freedom is fixed by
projecting pose 0's update out of the CG solve exactly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoseGraphEdges(NamedTuple):
    i: jax.Array        # (E,) int32 source pose index
    j: jax.Array        # (E,) int32 target pose index
    t_meas: jax.Array   # (E, 3) measured translation: t_ij = R(-yaw_i)(t_j - t_i)
    yaw_meas: jax.Array  # (E,) measured relative yaw
    weight: jax.Array   # (E,) edge confidence (e.g. final inlier count)
    mask: jax.Array     # (E,) bool


def wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def solution_to_edge(sol_translation, sol_rotation):
    """Convert a RegistrationSolution (tgt = R src + t, solving src->tgt in
    the *target* frame) into the edge measurement convention used here."""
    yaw = jnp.arctan2(sol_rotation[..., 1, 0], sol_rotation[..., 0, 0])
    return sol_translation, yaw


def _edge_residuals(poses, edges: PoseGraphEdges):
    """r_t (E,3), r_yaw (E,) for current pose estimates."""
    pi = poses[edges.i]
    pj = poses[edges.j]
    yaw_i = pi[:, 3]
    c, s = jnp.cos(yaw_i), jnp.sin(yaw_i)
    dt = pj[:, :3] - pi[:, :3]
    # R(-yaw_i) @ dt
    local = jnp.stack([c * dt[:, 0] + s * dt[:, 1],
                       -s * dt[:, 0] + c * dt[:, 1],
                       dt[:, 2]], axis=-1)
    r_t = local - edges.t_meas
    r_yaw = wrap_angle(pj[:, 3] - pi[:, 3] - edges.yaw_meas)
    return r_t, r_yaw


def _edge_jacobian_apply(poses, edges: PoseGraphEdges, v):
    """J @ v for a pose-space vector v (M, 4) -> per-edge (E, 4)."""
    pi = poses[edges.i]
    yaw_i = pi[:, 3]
    c, s = jnp.cos(yaw_i), jnp.sin(yaw_i)
    dt = poses[edges.j][:, :3] - pi[:, :3]
    vi = v[edges.i]
    vj = v[edges.j]
    dvt = vj[:, :3] - vi[:, :3]
    # d/dyaw_i [R(-yaw_i) dt] = R'(-yaw_i)*(-1) dt
    dyaw_term = jnp.stack([-s * dt[:, 0] + c * dt[:, 1],
                           -c * dt[:, 0] - s * dt[:, 1],
                           jnp.zeros_like(s)], axis=-1)
    jt = jnp.stack([c * dvt[:, 0] + s * dvt[:, 1],
                    -s * dvt[:, 0] + c * dvt[:, 1],
                    dvt[:, 2]], axis=-1) + dyaw_term * vi[:, 3:4]
    jyaw = vj[:, 3] - vi[:, 3]
    return jnp.concatenate([jt, jyaw[:, None]], axis=-1)


def _edge_jacobian_transpose_apply(poses, edges: PoseGraphEdges, u,
                                   num_poses: int, psum_axis=None):
    """J^T @ u for per-edge residual-space u (E, 4) -> pose space (M, 4).

    The scatter-accumulate; under shard_map this is where the cross-device
    `psum` reduction happens.
    """
    pi = poses[edges.i]
    yaw_i = pi[:, 3]
    c, s = jnp.cos(yaw_i), jnp.sin(yaw_i)
    dt = poses[edges.j][:, :3] - pi[:, :3]
    ut, uy = u[:, :3], u[:, 3]

    # translation block: R(-yaw_i)^T ut with signs for i (-) and j (+)
    rt_ut = jnp.stack([c * ut[:, 0] - s * ut[:, 1],
                       s * ut[:, 0] + c * ut[:, 1],
                       ut[:, 2]], axis=-1)
    dyaw_term = jnp.stack([-s * dt[:, 0] + c * dt[:, 1],
                           -c * dt[:, 0] - s * dt[:, 1],
                           jnp.zeros_like(s)], axis=-1)
    gi_yaw = jnp.sum(dyaw_term * ut, axis=-1) - uy
    gj_yaw = uy

    gi = jnp.concatenate([-rt_ut, gi_yaw[:, None]], axis=-1)
    gj = jnp.concatenate([rt_ut, gj_yaw[:, None]], axis=-1)

    out = jax.ops.segment_sum(gi, edges.i, num_segments=num_poses)
    out = out + jax.ops.segment_sum(gj, edges.j, num_segments=num_poses)
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    return out


@partial(jax.jit, static_argnames=("num_poses", "gn_iters", "cg_iters",
                                   "psum_axis"))
def optimize_pose_graph(poses0: jnp.ndarray, edges: PoseGraphEdges,
                        num_poses: int, gn_iters: int = 8,
                        cg_iters: int = 32, damping: float = 1e-3,
                        psum_axis=None) -> jnp.ndarray:
    """Gauss-Newton + matrix-free CG pose-graph solve.

    poses0: (M, 4) initial guesses. edges: measurements (maskable). Pose 0
    fixes the gauge: its delta is exactly projected out of the CG solve
    (cleaner conditioning than a large anchor weight). Pass psum_axis
    inside shard_map to all-reduce the J^T terms across edge shards.

    `damping` is a Levenberg term on the normal equations,
    (J^T W J + damping I) delta = -J^T W r. Rejected registrations
    (mask=False) can disconnect the graph — e.g. a failed odometry edge
    splits the trajectory into a component with no path to the anchor —
    leaving J^T W J singular along that component's rigid modes. The
    damping keeps CG positive-definite so unconstrained poses simply STAY
    at their initialization instead of the whole solve going NaN (one bad
    edge must not poison the trajectory; cf. the per-pair `valid` masking
    contract in solver/quatro.py).
    """
    w_edge = jnp.where(edges.mask, edges.weight, 0.0)

    def normal_matvec(poses, v):
        vm = v.at[0].set(0.0)  # gauge: pose 0 frozen exactly
        jv = _edge_jacobian_apply(poses, edges, vm)
        jtwjv = _edge_jacobian_transpose_apply(
            poses, edges, jv * w_edge[:, None], num_poses, psum_axis)
        return jtwjv.at[0].set(0.0) + damping * v

    def gn_step(_, poses):
        r_t, r_yaw = _edge_residuals(poses, edges)
        r = jnp.concatenate([r_t, r_yaw[:, None]], axis=-1)
        b = -_edge_jacobian_transpose_apply(
            poses, edges, r * w_edge[:, None], num_poses, psum_axis)
        b = b.at[0].set(0.0)  # delta[0] = 0: b0 = 0 and A row 0 = damping*I

        def cg_body(_, state):
            x, rr, p, rs = state
            ap = normal_matvec(poses, p)
            denom = jnp.sum(p * ap)
            alpha = rs / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * p
            rr = rr - alpha * ap
            rs_new = jnp.sum(rr * rr)
            beta = rs_new / jnp.where(rs == 0, 1.0, rs)
            return x, rr, rr + beta * p, rs_new

        x0 = jnp.zeros_like(poses)
        state = (x0, b, b, jnp.sum(b * b))
        delta, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, state)
        new = poses + delta
        return new.at[:, 3].set(wrap_angle(new[:, 3]))

    return jax.lax.fori_loop(0, gn_iters, gn_step, poses0)
