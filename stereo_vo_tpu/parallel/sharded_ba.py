"""Landmark-sharded distributed bundle adjustment.

The scaling design mandated by BASELINE.json's north star: landmark blocks are
embarrassingly parallel in the Schur complement, so the landmark table (and its
observations, held landmark-major) shard across a device mesh axis ``"lm"``:

    per device:  residuals + Jacobians for its landmark block [L/n, W]
                 partial reduced camera system  S_k = sum_l W_l V_l^-1 W_l^T
    collective:  S = psum(S_k),  rhs = psum(rhs_k)        <- rides ICI
    replicated:  dense (W*6)^2 solve — identical on every device
    per device:  back-substitute its own landmark block

This reproduces the single-device Schur solve exactly (psum is the only
cross-device op and addition is the same reduction the dense solver performs),
which the tests assert on a virtual 8-device CPU mesh (SURVEY.md §4
"Distributed"). The win over the reference's 4-thread Ceres
(``bundle_adjuster.cpp:12``) is that window x landmark capacity scales with
devices at constant wall-clock — the structural analog of scaling sequence
length (SURVEY.md §5 "Long-context" row).

Layout note: observations here are **landmark-major** ``[L, W, ...]`` (each
(pose, landmark) pair has at most one observation, so the dense layout is
exact). ``window_to_landmark_major`` converts the engine's pose-major window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_vo_tpu.core.camera import CameraInfo
from stereo_vo_tpu.core.config import BackendConfig
from stereo_vo_tpu.core.geometry import pose_q, pose_t, pose_retract, quat_lift_jacobian, rot_apply
from stereo_vo_tpu.backend.residuals import reprojection_jacobians
from stereo_vo_tpu.backend.schur import _inv3x3
from stereo_vo_tpu.backend.window import WindowState


class LandmarkMajorProblem(NamedTuple):
    poses: jnp.ndarray      # [W, 7]
    pose_valid: jnp.ndarray  # [W]
    lm_pos: jnp.ndarray     # [L, 3]
    lm_valid: jnp.ndarray   # [L]
    obs_uv: jnp.ndarray     # [L, W, 2]
    obs_valid: jnp.ndarray  # [L, W]


def window_to_landmark_major(window: WindowState) -> LandmarkMajorProblem:
    """Scatter the engine's pose-major observation tensor into landmark-major."""
    lcap = window.landmark_capacity
    w, f = window.obs_valid.shape
    lm_idx = jnp.where(window.obs_valid, window.obs_lm, lcap)
    w_idx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[:, None], (w, f))
    obs_uv = (
        jnp.zeros((lcap + 1, w, 2), window.obs_uv.dtype)
        .at[lm_idx.reshape(-1), w_idx.reshape(-1)]
        .set(window.obs_uv.reshape(-1, 2), mode="drop")[:lcap]
    )
    obs_valid = (
        jnp.zeros((lcap + 1, w), bool)
        .at[lm_idx.reshape(-1), w_idx.reshape(-1)]
        .set(True, mode="drop")[:lcap]
    )
    return LandmarkMajorProblem(
        poses=window.poses,
        pose_valid=window.pose_valid,
        lm_pos=window.lm_pos,
        lm_valid=window.lm_valid,
        obs_uv=obs_uv,
        obs_valid=obs_valid,
    )


def _local_cost(poses, lm_pos, prob: LandmarkMajorProblem, cam, min_depth, axis):
    """Per-shard cost; psum over the landmark axis if inside shard_map."""
    l, w = prob.obs_valid.shape
    pose_b = jnp.broadcast_to(poses[None, :, :], (l, w, 7))
    pts = jnp.broadcast_to(lm_pos[:, None, :], (l, w, 3))
    from stereo_vo_tpu.backend.residuals import reprojection_residual

    r = reprojection_residual(pose_b, pts, prob.obs_uv, cam)
    z = (rot_apply(pose_q(pose_b), pts) + pose_t(pose_b))[..., 2]
    mask = (
        prob.obs_valid
        & prob.pose_valid[None, :]
        & prob.lm_valid[:, None]
        & (z > min_depth)
    )
    r = jnp.where(mask[..., None], r, 0.0)
    cost = 0.5 * jnp.sum(r * r)
    if axis is not None:
        cost = jax.lax.psum(cost, axis)
    return cost


def _shard_lm_step(poses, lm_pos, lam, prob: LandmarkMajorProblem, cam, cfg, axis):
    """One damped Schur step on landmark-major (possibly sharded) arrays."""
    l, w = prob.obs_valid.shape
    dtype = poses.dtype

    pose_b = jnp.broadcast_to(poses[None, :, :], (l, w, 7))
    pts = jnp.broadcast_to(lm_pos[:, None, :], (l, w, 3))
    r, jp7, jl = reprojection_jacobians(pose_b, pts, prob.obs_uv, cam)
    z = (rot_apply(pose_q(pose_b), pts) + pose_t(pose_b))[..., 2]
    mask = (
        prob.obs_valid
        & prob.pose_valid[None, :]
        & prob.lm_valid[:, None]
        & (z > cfg.min_depth)
    )
    r = jnp.where(mask[..., None], r, 0.0)
    lift = quat_lift_jacobian(poses[:, 0:4])            # [W, 4, 3]
    jq = jnp.einsum("lwij,wjk->lwik", jp7[..., 0:4], lift)
    jp6 = jnp.concatenate([jq, jp7[..., 4:7]], axis=-1)
    jp6 = jnp.where(mask[..., None, None], jp6, 0.0)
    jl = jnp.where(mask[..., None, None], jl, 0.0)

    # landmark-local blocks (no scatter needed in this layout)
    v = jnp.einsum("lwri,lwrj->lij", jl, jl)            # [L, 3, 3]
    g_l = -jnp.einsum("lwri,lwr->li", jl, r)            # [L, 3]
    wl = jnp.einsum("lwri,lwrj->lwij", jp6, jl)         # [L, W, 6, 3]
    u_part = jnp.einsum("lwri,lwrj->wij", jp6, jp6)     # [W, 6, 6] partial
    g_p_part = -jnp.einsum("lwri,lwr->wi", jp6, r)      # [W, 6] partial

    def damp(m):
        dd = lam * jnp.clip(jnp.diagonal(m, axis1=-2, axis2=-1), 1e-8, 1e32)
        return m + jnp.eye(m.shape[-1], dtype=dtype) * dd[..., None, :]

    lm_active = prob.lm_valid & (jnp.einsum("lii->l", v) > 0)
    v_inv = _inv3x3(damp(v), eps=1e-6)
    v_inv = jnp.where(lm_active[:, None, None], v_inv, 0.0)

    wv = jnp.einsum("lwab,lbc->lwac", wl, v_inv)
    s_part = -jnp.einsum("lwac,lvdc->wavd", wv, wl)
    rhs_part = g_p_part - jnp.einsum("lwac,lc->wa", wv, g_l)

    # ---- the only collectives: reduce the camera system over the lm axis
    if axis is not None:
        u_blocks = jax.lax.psum(u_part, axis)
        s = jax.lax.psum(s_part, axis)
        rhs = jax.lax.psum(rhs_part, axis)
    else:
        u_blocks, s, rhs = u_part, s_part, rhs_part

    # damping of U uses the reduced (global) diagonal — matches single-device
    s = s + jnp.einsum("wv,wab->wavb", jnp.eye(w, dtype=dtype), damp(u_blocks))

    free = prob.pose_valid & (jnp.arange(w) > 0)
    fm = free.astype(dtype)
    s = s * fm[:, None, None, None] * fm[None, None, :, None]
    s = s + jnp.einsum("wv,ab->wavb", jnp.diag(1.0 - fm), jnp.eye(6, dtype=dtype))
    rhs = rhs * fm[:, None]

    n = w * 6
    delta_p = jnp.linalg.solve(
        s.reshape(n, n) + 1e-10 * jnp.eye(n, dtype=dtype), rhs.reshape(n)
    ).reshape(w, 6)
    delta_p = delta_p * fm[:, None]

    # local landmark back-substitution
    wtdp = jnp.einsum("lwab,wa->lb", wl, delta_p)
    delta_l = jnp.einsum("lbc,lc->lb", v_inv, g_l - wtdp)
    delta_l = jnp.where(lm_active[:, None], delta_l, 0.0)

    new_poses = pose_retract(poses, delta_p)
    new_poses = jnp.where(free[:, None], new_poses, poses)
    return new_poses, lm_pos + delta_l


def _lm_loop(prob: LandmarkMajorProblem, cam, cfg, axis):
    """Full LM accept/reject loop; shard-safe (all branches replicated)."""
    poses0, lm0 = prob.poses, prob.lm_pos
    cost0 = _local_cost(poses0, lm0, prob, cam, cfg.min_depth, axis)

    def body(carry, _):
        poses, lm_pos, lam, cost = carry
        cand_p, cand_l = _shard_lm_step(poses, lm_pos, lam, prob, cam, cfg, axis)
        cand_cost = _local_cost(cand_p, cand_l, prob, cam, cfg.min_depth, axis)
        ok = (cand_cost < cost) & jnp.isfinite(cand_cost)
        poses = jnp.where(ok, cand_p, poses)
        lm_pos = jnp.where(ok, cand_l, lm_pos)
        cost = jnp.where(ok, cand_cost, cost)
        lam = jnp.clip(
            jnp.where(ok, lam / 3.0, lam * 4.0), cfg.min_damping, cfg.max_damping
        )
        return (poses, lm_pos, lam, cost), None

    init = (poses0, lm0, jnp.asarray(cfg.init_damping, poses0.dtype), cost0)
    (poses, lm_pos, _, cost), _ = jax.lax.scan(body, init, None, length=cfg.max_lm_iters)
    return poses, lm_pos, cost0, cost


def sharded_bundle_adjust(
    window: WindowState,
    cam: CameraInfo,
    cfg: BackendConfig,
    mesh: Mesh,
    lm_axis: str = "lm",
) -> Tuple[WindowState, jnp.ndarray, jnp.ndarray]:
    """Distributed BA over ``mesh``; landmark table sharded along ``lm_axis``.

    Returns ``(window', initial_cost, final_cost)``. Result equals the
    single-device ``backend.schur.bundle_adjust`` (same damping schedule, same
    reduced system — only the summation order differs).
    """
    n_shards = mesh.shape[lm_axis]
    lcap = window.landmark_capacity
    if lcap % n_shards != 0:
        raise ValueError(f"landmark capacity {lcap} not divisible by {n_shards} shards")

    prob = window_to_landmark_major(window)

    lm_sharded = P(lm_axis)
    repl = P()
    in_specs = LandmarkMajorProblem(
        poses=repl, pose_valid=repl,
        lm_pos=lm_sharded, lm_valid=lm_sharded,
        obs_uv=lm_sharded, obs_valid=lm_sharded,
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(repl, lm_sharded, repl, repl),
    )
    def solve(p):
        poses, lm_pos, c0, c1 = _lm_loop(p, cam, cfg, lm_axis)
        return poses, lm_pos, c0, c1

    poses, lm_pos, cost0, cost1 = solve(prob)
    return window._replace(poses=poses, lm_pos=lm_pos), cost0, cost1
