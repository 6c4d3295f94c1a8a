"""Schur-complement Levenberg-Marquardt bundle adjustment.

TPU-native replacement for the reference's Ceres solve
(``bundle_adjuster.cpp:8-12,137-157``: DENSE_SCHUR, LM trust region, SE(3) as
Quaternion ⊗ Identity(3) product manifold, oldest pose held constant as gauge).

Design (SURVEY.md §2 C5 "TPU plan"):
- Fixed-shape residual tensor ``[W, F, 2]`` with validity masks — one fused XLA
  evaluation of every residual + analytic Jacobian per iteration (the reference
  evaluates per-block C++ callbacks inside Ceres).
- Landmarks eliminated by the Schur complement in closed form: per-landmark
  3x3 blocks inverted analytically, the reduced camera system is a dense
  ``[W*6, W*6]`` solve (W=5 -> 30x30 — tiny; the scaling axis for large windows
  is landmark-block parallelism, see ``stereo_vo_tpu/parallel``).
- The wall-clock budget of the reference (0.1 s, ``bundle_adjuster.cpp:11``)
  becomes a fixed LM iteration count (``cfg.max_lm_iters``) so the whole solve
  is one compiled ``lax.scan`` with accept/reject damping logic inside.

The pose tangent is ``[δθ(3), δt(3)]`` via the quaternion exponential chart —
the same product manifold as the reference — and the ambient 2x7 Jacobian is
folded to 2x6 through the lift matrix.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stereo_vo_tpu.core.camera import CameraInfo
from stereo_vo_tpu.core.config import BackendConfig
from stereo_vo_tpu.core.geometry import pose_retract, quat_lift_jacobian
from stereo_vo_tpu.backend.residuals import reprojection_jacobians, reprojection_residual
from stereo_vo_tpu.backend.window import WindowState


class BASolveStats(NamedTuple):
    initial_cost: jnp.ndarray   # [] sum of squared residuals before the solve
    final_cost: jnp.ndarray     # [] after
    iterations: jnp.ndarray     # [] accepted LM steps
    converged: jnp.ndarray      # [] bool — relative cost decrease below tol


def _inv3x3(m: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Batched closed-form (adjugate) inverse of ``[..., 3, 3]`` SPD blocks."""
    m = m + eps * jnp.eye(3, dtype=m.dtype)
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            co_a, -(b * i - c * h), b * f - c * e,
            co_b, a * i - c * g, -(a * f - c * d),
            co_c, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(m.shape)
    return adj * inv_det[..., None, None]


def _huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight ω per observation for the Huber loss on ``‖r‖`` (r [..., 2]).

    ω = 1 inside the quadratic zone, δ/‖r‖ outside; multiplying residual AND
    Jacobians by √ω makes the Gauss-Newton system that of the robustified
    objective (first-order / Triggs approximation). δ <= 0 disables (exact
    reference behavior: plain squared loss)."""
    if delta <= 0:
        return jnp.ones(r.shape[:-1], r.dtype)
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return jnp.minimum(1.0, delta / norm)


def _huber_rho(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Per-observation Huber cost (matches ``_huber_weight``'s objective)."""
    sq = jnp.sum(r * r, axis=-1)
    if delta <= 0:
        return 0.5 * sq
    norm = jnp.sqrt(sq + 1e-12)
    return jnp.where(norm <= delta, 0.5 * sq, delta * (norm - 0.5 * delta))


def _masked_system(poses, lm_pos, window: WindowState, cam: CameraInfo, min_depth,
                   huber_delta=0.0):
    """Residuals, tangent Jacobians and the observation mask for the window.

    A residual is active iff its observation is valid, its pose is valid, its
    landmark is live, and the point is in front of the camera (cheirality —
    Ceres would happily evaluate z<=0 blocks; masking them is a deliberate
    robustness fix, flagged in BackendConfig.min_depth).
    """
    w, f = window.obs_valid.shape
    pose_b = jnp.broadcast_to(poses[:, None, :], (w, f, 7))
    pts = lm_pos[window.obs_lm]                       # [W, F, 3]
    r, jp7, jl = reprojection_jacobians(pose_b, pts, window.obs_uv, cam)

    # depth of each point in its camera (recompute cheaply from the residual
    # internals would need plumbing; one fused extra op is fine)
    from stereo_vo_tpu.core.geometry import pose_q, pose_t, rot_apply

    z = (rot_apply(pose_q(pose_b), pts) + pose_t(pose_b))[..., 2]
    mask = (
        window.obs_valid
        & window.pose_valid[:, None]
        & window.lm_valid[window.obs_lm]
        & (z > min_depth)
    )
    # NaN-safe masking: invalid/degenerate observations can produce inf/nan
    # residuals (z ~ 0), so select rather than multiply.
    r = jnp.where(mask[..., None], r, 0.0)
    sw = jnp.sqrt(_huber_weight(r, huber_delta))[..., None]

    # Fold 2x7 ambient pose Jacobian to 2x6 tangent via the lift matrix.
    lift = quat_lift_jacobian(poses[:, 0:4])          # [W, 4, 3]
    jq = jnp.einsum("wfij,wjk->wfik", jp7[..., 0:4], lift)
    jp6 = jnp.concatenate([jq, jp7[..., 4:7]], axis=-1)
    jp6 = jnp.where(mask[..., None, None], jp6 * sw[..., None], 0.0)
    jl = jnp.where(mask[..., None, None], jl * sw[..., None], 0.0)
    return r * sw, jp6, jl, mask


def _cost(poses, lm_pos, window: WindowState, cam: CameraInfo, min_depth,
          huber_delta=0.0):
    w, f = window.obs_valid.shape
    pose_b = jnp.broadcast_to(poses[:, None, :], (w, f, 7))
    pts = lm_pos[window.obs_lm]
    r = reprojection_residual(pose_b, pts, window.obs_uv, cam)
    from stereo_vo_tpu.core.geometry import pose_q, pose_t, rot_apply

    z = (rot_apply(pose_q(pose_b), pts) + pose_t(pose_b))[..., 2]
    mask = (
        window.obs_valid
        & window.pose_valid[:, None]
        & window.lm_valid[window.obs_lm]
        & (z > min_depth)
    )
    r = jnp.where(mask[..., None], r, 0.0)
    cost = jnp.sum(_huber_rho(r, huber_delta))
    # stereo prior term (matches _lm_major_cost)
    dp = lm_pos - window.lm_prior
    pw = jnp.where(window.lm_valid, window.lm_prior_w, 0.0)
    return cost + 0.5 * jnp.sum(pw[:, None] * dp * dp)


def lm_step(
    poses, lm_pos, lam, window: WindowState, cam: CameraInfo, cfg: BackendConfig
):
    """One damped Gauss-Newton step with landmark Schur elimination.

    Returns candidate ``(poses', lm_pos')`` — accept/reject happens in the LM
    outer loop.
    """
    wsz = window.window_size
    lcap = window.landmark_capacity
    dtype = poses.dtype

    r, jp, jl, mask = _masked_system(poses, lm_pos, window, cam, cfg.min_depth,
                                     cfg.huber_delta_px)

    # Per-pose blocks: U [W,6,6], g_p [W,6]
    u_blocks = jnp.einsum("wfri,wfrj->wij", jp, jp)
    g_p = -jnp.einsum("wfri,wfr->wi", jp, r)

    # Per-landmark blocks scattered by obs_lm: V [L,3,3], g_l [L,3],
    # and pose-landmark coupling Wl [L,W,6,3] (each (pose, landmark) pair has
    # at most one observation, so per-observation scatter is exact).
    v_obs = jnp.einsum("wfri,wfrj->wfij", jl, jl)
    g_l_obs = -jnp.einsum("wfri,wfr->wfi", jl, r)
    w_obs = jnp.einsum("wfri,wfrj->wfij", jp, jl)   # [W,F,6,3]

    lm_idx = jnp.where(mask, window.obs_lm, lcap)   # dump masked obs past the end
    v = jnp.zeros((lcap + 1, 3, 3), dtype).at[lm_idx.reshape(-1)].add(
        v_obs.reshape(-1, 3, 3)
    )[:lcap]
    g_l = jnp.zeros((lcap + 1, 3), dtype).at[lm_idx.reshape(-1)].add(
        g_l_obs.reshape(-1, 3)
    )[:lcap]
    # stereo prior term — keeps this pose-major path equivalent to the
    # production landmark-major one (lm_major_step) when lm_prior_w > 0
    pw = jnp.where(window.lm_valid, window.lm_prior_w, 0.0)
    v = v + pw[:, None, None] * jnp.eye(3, dtype=dtype)
    g_l = g_l + pw[:, None] * (window.lm_prior - lm_pos)

    w_idx = jnp.broadcast_to(
        jnp.arange(wsz, dtype=jnp.int32)[:, None], lm_idx.shape
    )
    wl = jnp.zeros((lcap + 1, wsz, 6, 3), dtype).at[
        lm_idx.reshape(-1), w_idx.reshape(-1)
    ].add(w_obs.reshape(-1, 6, 3))[:lcap]

    # LM damping: augment diagonals (diag-scaled, Ceres-style trust region).
    def damp(m):
        dd = lam * jnp.clip(jnp.diagonal(m, axis1=-2, axis2=-1), 1e-8, 1e32)
        return m + jnp.eye(m.shape[-1], dtype=dtype) * dd[..., None, :]

    u_d = damp(u_blocks)
    v_d = damp(v)

    lm_active = window.lm_valid & (jnp.einsum("lii->l", v) > 0)
    v_inv = _inv3x3(v_d, eps=1e-6)
    v_inv = jnp.where(lm_active[:, None, None], v_inv, 0.0)

    # Reduced camera system S [W,6,W,6] and rhs [W,6].
    wv = jnp.einsum("lwab,lbc->lwac", wl, v_inv)            # [L,W,6,3]
    s = -jnp.einsum("lwac,lvdc->wavd", wv, wl)              # - W V^-1 W^T
    s = s + jnp.einsum("wv,wab->wavb", jnp.eye(wsz, dtype=dtype), u_d)
    rhs = g_p - jnp.einsum("lwac,lc->wa", wv, g_l)

    # Gauge fixing: hold the oldest valid pose (chronological index 0) constant
    # (bundle_adjuster.cpp:130); invalid poses are fixed too.
    free = window.pose_valid & (jnp.arange(wsz) > 0)
    fm = free.astype(dtype)
    s = s * fm[:, None, None, None] * fm[None, None, :, None]
    s = s + jnp.einsum(
        "wv,ab->wavb", jnp.diag(1.0 - fm), jnp.eye(6, dtype=dtype)
    )
    rhs = rhs * fm[:, None]

    n = wsz * 6
    delta_p = jnp.linalg.solve(
        s.reshape(n, n) + 1e-10 * jnp.eye(n, dtype=dtype), rhs.reshape(n)
    ).reshape(wsz, 6)
    delta_p = delta_p * fm[:, None]

    # Landmark back-substitution: δl = V^-1 (g_l - W^T δp).
    wtdp = jnp.einsum("lwab,wa->lb", wl, delta_p)
    delta_l = jnp.einsum("lbc,lc->lb", v_inv, g_l - wtdp)
    delta_l = jnp.where(lm_active[:, None], delta_l, 0.0)

    new_poses = pose_retract(poses, delta_p)
    new_poses = jnp.where(free[:, None], new_poses, poses)
    new_lm = lm_pos + delta_l
    return new_poses, new_lm


def bundle_adjust(
    window: WindowState,
    cam: CameraInfo,
    cfg: BackendConfig,
    rel_tol: float = 1e-6,
) -> Tuple[WindowState, BASolveStats]:
    """Solve the sliding-window BA problem (``BundleAdjuster::bundle_adjust``).

    Runs ``cfg.max_lm_iters`` LM iterations as one ``lax.scan`` with
    accept/reject damping (reject keeps the previous iterate and raises λ).
    Writes optimized poses *and* landmarks back into the window state — like
    Ceres, which optimizes parameter blocks in place (the reference then
    re-publishes only the newest pose; see ``engine``).

    Live-landmark compaction (``cfg.ba_compact_landmarks``): every build and
    iteration cost is linear in the landmark axis, while the live count sits
    far below capacity. Gather the valid landmarks (stable valid-first) into
    a problem of exactly that size, remap ``obs_lm`` through the inverse
    permutation, solve, and scatter positions back — the same solve up to
    f32 summation order (dead rows contribute exact zeros either way). A
    window with more live landmarks takes the full-capacity branch.
    """
    lcap = window.landmark_capacity
    l_small = getattr(cfg, "ba_compact_landmarks", 0)
    if 0 < l_small < lcap:
        def compact(_):
            order = jnp.argsort(
                jnp.logical_not(window.lm_valid), stable=True
            )[:l_small]
            inv = jnp.zeros((lcap,), jnp.int32).at[order].set(
                jnp.arange(l_small, dtype=jnp.int32)
            )
            # every VALID observation's landmark is live (window refcounts
            # guarantee it), hence in the gathered set when live <= l_small;
            # invalid observations are masked before their obs_lm is used
            take = lambda a: jnp.take(a, order, axis=0)
            wsmall = window._replace(
                obs_lm=inv[window.obs_lm],
                lm_pos=take(window.lm_pos),
                lm_refcount=take(window.lm_refcount),
                lm_valid=take(window.lm_valid),
                lm_prior=take(window.lm_prior),
                lm_prior_w=take(window.lm_prior_w),
            )
            wout, stats = _bundle_adjust_uncompacted(wsmall, cam, cfg, rel_tol)
            merged = window._replace(
                poses=wout.poses,
                lm_pos=window.lm_pos.at[order].set(wout.lm_pos),
            )
            if window.ba_lam is not None:
                merged = merged._replace(ba_lam=wout.ba_lam)
            return merged, stats

        def full(_):
            return _bundle_adjust_uncompacted(window, cam, cfg, rel_tol)

        live = jnp.sum(window.lm_valid.astype(jnp.int32))
        return jax.lax.cond(live <= l_small, compact, full, None)
    return _bundle_adjust_uncompacted(window, cam, cfg, rel_tol)


def _bundle_adjust_uncompacted(
    window: WindowState,
    cam: CameraInfo,
    cfg: BackendConfig,
    rel_tol: float = 1e-6,
) -> Tuple[WindowState, BASolveStats]:
    """The solve at the window's full landmark capacity (see bundle_adjust)."""
    prob = window_to_landmark_major(window)
    init_lam = (
        window.ba_lam
        if window.ba_lam is not None and getattr(cfg, "lam_warm_start", True)
        else None
    )
    poses, lm_pos, cost0, cost, accepted, last_rel, lam = lm_loop(
        prob, cam, cfg, axis=None, init_lam=init_lam
    )
    new_window = window._replace(poses=poses, lm_pos=lm_pos)
    if window.ba_lam is not None:
        new_window = new_window._replace(ba_lam=lam.astype(window.ba_lam.dtype))
    stats = BASolveStats(
        initial_cost=cost0,
        final_cost=cost,
        iterations=accepted,
        converged=last_rel < rel_tol,
    )
    return new_window, stats


# ---------------------------------------------------------------------------
# Landmark-major formulation — the production solve path.
#
# Each (pose, landmark) pair has at most one observation, so observations pack
# densely as [L, W, ...]. All per-landmark blocks (V, g_l, the W coupling) are
# then plain einsums over the local W axis — no scatters, which serialize on
# TPU. The same code runs single-device (axis=None) and landmark-sharded under
# shard_map (axis="lm", see stereo_vo_tpu/parallel/sharded_ba.py): the only
# cross-shard ops are psums of the reduced camera system.
# ---------------------------------------------------------------------------


class LandmarkMajorProblem(NamedTuple):
    poses: jnp.ndarray       # [W, 7]
    pose_valid: jnp.ndarray  # [W]
    lm_pos: jnp.ndarray      # [L, 3]
    lm_valid: jnp.ndarray    # [L]
    obs_uv: jnp.ndarray      # [L, W, 2]
    obs_valid: jnp.ndarray   # [L, W]
    lm_prior: jnp.ndarray    # [L, 3] stereo-triangulation prior position
    lm_prior_w: jnp.ndarray  # [L] prior inverse variance (0 = none)


def window_to_landmark_major(window: WindowState) -> LandmarkMajorProblem:
    """Scatter the engine's pose-major observation tensor into landmark-major
    (the one scatter per solve; everything downstream is dense)."""
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
        lm_prior=window.lm_prior,
        lm_prior_w=window.lm_prior_w,
    )


def _lm_major_cost(poses, lm_pos, prob: LandmarkMajorProblem, cam, min_depth, axis,
                   huber_delta=0.0):
    """Cost on landmark-major arrays; psum over ``axis`` if inside shard_map."""
    from stereo_vo_tpu.core.geometry import pose_q, pose_t, rot_apply

    l, w = prob.obs_valid.shape
    pose_b = jnp.broadcast_to(poses[None, :, :], (l, w, 7))
    pts = jnp.broadcast_to(lm_pos[:, None, :], (l, w, 3))
    r = reprojection_residual(pose_b, pts, prob.obs_uv, cam)
    z = (rot_apply(pose_q(pose_b), pts) + pose_t(pose_b))[..., 2]
    mask = (
        prob.obs_valid
        & prob.pose_valid[None, :]
        & prob.lm_valid[:, None]
        & (z > min_depth)
    )
    r = jnp.where(mask[..., None], r, 0.0)
    cost = jnp.sum(_huber_rho(r, huber_delta))
    # stereo prior term (anchors the monocular BA's free scale mode)
    dp = lm_pos - prob.lm_prior
    pw = jnp.where(prob.lm_valid, prob.lm_prior_w, 0.0)
    cost = cost + 0.5 * jnp.sum(pw[:, None] * dp * dp)
    if axis is not None:
        cost = jax.lax.psum(cost, axis)
    return cost


# Observation-count (L*W) ceiling for the fused-Gram normal-equation build.
# Below: one [L, W, 10, 10] Gram contraction (fewest kernels — dispatch-bound
# regime, wins at the production W=5 x L=2048 = 10k obs). Above: narrow
# per-block einsums (HBM-bound regime; the Gram would materialize L*W*400
# bytes). 10240 obs = 4 MB Gram, comfortably cached; the next bench shape
# (32 x 16384 = 524k obs = 210 MB) measured 28% slower fused.
_FUSED_GRAM_MAX_OBS = 65536


class BASystem(NamedTuple):
    """λ-free normal-equation blocks at one iterate.

    Built once per accepted LM iterate (``_build_system``); re-damping and
    re-solving at a new λ after a rejected step reuses it (``_damp_reduce``) —
    the Ceres pattern: residual/Jacobian evaluation happens per *accepted*
    step, trust-region retries only redo the (cheap) damped reduction. The
    pose-side blocks are already psummed (λ-free), so a re-damp touches only
    landmark-local math plus the s/rhs psums."""

    v: jnp.ndarray          # [L, 3, 3] undamped landmark blocks (incl. prior)
    g_l: jnp.ndarray        # [L, 3]
    wl: jnp.ndarray         # [L, W, 6, 3] pose-landmark coupling
    u_blocks: jnp.ndarray   # [W, 6, 6] reduced (psummed) pose blocks, undamped
    g_p: jnp.ndarray        # [W, 6] reduced (psummed) pose gradient
    lm_active: jnp.ndarray  # [L]
    free: jnp.ndarray       # [W]


def _build_system(poses, lm_pos, prob: LandmarkMajorProblem, cam, cfg, axis):
    """Evaluate residuals/Jacobians and accumulate the λ-free blocks."""
    from stereo_vo_tpu.core.geometry import pose_q, pose_t, rot_apply

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
    sw = jnp.sqrt(_huber_weight(r, getattr(cfg, "huber_delta_px", 0.0)))[..., None]
    r = r * sw
    lift = quat_lift_jacobian(poses[:, 0:4])            # [W, 4, 3]
    # 2x4 @ 4x3 per observation: broadcast-sum (elementwise, fuses) instead
    # of a padded batched MXU dot
    jq = jnp.sum(
        jp7[..., 0:4, None] * lift[None, :, None, :, :], axis=-2
    )                                                   # [L, W, 2, 3]
    jp6 = jnp.concatenate([jq, jp7[..., 4:7]], axis=-1)
    jp6 = jnp.where(mask[..., None, None], jp6 * sw[..., None], 0.0)
    jl = jnp.where(mask[..., None, None], jl * sw[..., None], 0.0)

    if l * w <= _FUSED_GRAM_MAX_OBS:
        # One fused Gram: stack [jp6 | jl | r] into a [L, W, 2, 10] tensor and
        # form its per-observation normal-equation Gram in ONE contraction —
        # every block the solver needs (U, V, W, g_p, g_l, and even the
        # weighted squared residual at [9, 9]) is a slice/reduction of it.
        # Replaces five separate einsums; the LM iteration at production size
        # (W=5, L=2048) is op-dispatch-bound, not FLOPs-bound, so kernel count
        # is the cost model.
        jall = jnp.concatenate([jp6, jl, r[..., None]], axis=-1)  # [L, W, 2, 10]
        # contraction over the 2 residual rows written as two broadcast outer
        # products: a batched dot with 10x10 free dims lowers to a padded MXU
        # matmul (measured slower); this form stays elementwise on the VPU and
        # fuses with the slice-reductions below
        gram = (
            jall[..., 0, :, None] * jall[..., 0, None, :]
            + jall[..., 1, :, None] * jall[..., 1, None, :]
        )                                                         # [L, W, 10, 10]
        v = jnp.sum(gram[..., 6:9, 6:9], axis=1)                  # [L, 3, 3]
        g_l = -jnp.sum(gram[..., 6:9, 9], axis=1)                 # [L, 3]
        wl = gram[..., :6, 6:9]                                   # [L, W, 6, 3]
        u_part = jnp.sum(gram[..., :6, :6], axis=0)               # [W, 6, 6]
        g_p_part = -jnp.sum(gram[..., :6, 9], axis=0)             # [W, 6]
    else:
        # Large-shape path (ADVICE r4 / VERDICT r4 weak #2): at 32x16384 the
        # [L, W, 10, 10] Gram is ~210 MB f32 and XLA materializes it (the wl
        # slice forces the whole buffer live), turning a compute-bound build
        # into an HBM-bound one — measured 96.5 -> 69.6 LM it/s. Narrow
        # einsums keep only the [L, W, 6, 3] coupling live (~an eighth of the
        # Gram); every other block reduces over W or L during the contraction.
        v = jnp.einsum("lwri,lwrj->lij", jl, jl)
        g_l = -jnp.einsum("lwri,lwr->li", jl, r)
        wl = jnp.einsum("lwri,lwrj->lwij", jp6, jl)               # [L, W, 6, 3]
        u_part = jnp.einsum("lwri,lwrj->wij", jp6, jp6)
        g_p_part = -jnp.einsum("lwri,lwr->wi", jp6, r)
    # stereo prior contributes only to the landmark block and gradient
    pw = jnp.where(prob.lm_valid, prob.lm_prior_w, 0.0)
    v = v + pw[:, None, None] * jnp.eye(3, dtype=dtype)
    g_l = g_l + pw[:, None] * (prob.lm_prior - lm_pos)

    if axis is not None:
        u_blocks = jax.lax.psum(u_part, axis)
        g_p = jax.lax.psum(g_p_part, axis)
    else:
        u_blocks, g_p = u_part, g_p_part

    lm_active = prob.lm_valid & (jnp.einsum("lii->l", v) > 0)
    free = prob.pose_valid & (jnp.arange(w) > 0)
    return BASystem(v=v, g_l=g_l, wl=wl, u_blocks=u_blocks, g_p=g_p,
                    lm_active=lm_active, free=free)


def _damp_reduce(sys: BASystem, lam, axis):
    """λ-dependent half: damp, Schur-eliminate landmarks, gauge-fix.

    Returns ``(s, rhs, v_inv, dp_diag, dl_diag)``."""
    dtype = sys.wl.dtype
    w = sys.u_blocks.shape[0]

    def damp(m):
        dd = lam * jnp.clip(jnp.diagonal(m, axis1=-2, axis2=-1), 1e-8, 1e32)
        return m + jnp.eye(m.shape[-1], dtype=dtype) * dd[..., None, :]

    v_inv = _inv3x3(damp(sys.v), eps=1e-6)
    v_inv = jnp.where(sys.lm_active[:, None, None], v_inv, 0.0)

    # Fused Schur reduction: append g_l as a 31st row of the flattened
    # coupling block, so ONE [31, 31] Gram against V^-1 yields the whole
    # -W V^-1 W^T block ([:30, :30]), the rhs correction W V^-1 g_l
    # ([:30, 30]), and (free, unused) g_l V^-1 g_l — replacing the separate
    # wv/s/rhs einsums AND halving the per-λ collectives to one psum.
    l = sys.wl.shape[0]
    n6 = w * 6
    wlg = jnp.concatenate(
        [sys.wl.reshape(l, n6, 3), sys.g_l[:, None, :]], axis=1
    )                                                   # [L, 31, 3]
    # wlg @ v_inv as a broadcast-sum over the 3-dim (elementwise, fuses);
    # the [31, 31] Gram then contracts over (L*3) — a genuinely MXU-shaped
    # matmul, left as a dot
    a = jnp.sum(wlg[:, :, :, None] * v_inv[:, None, :, :], axis=2)  # [L, 31, 3]
    msum = jnp.einsum("lic,ljc->ij", a, wlg)            # [31, 31], sums over L

    # ---- the only per-λ collective: reduce the [31, 31] block over lm shards
    if axis is not None:
        msum = jax.lax.psum(msum, axis)
    s = -msum[:n6, :n6].reshape(w, 6, w, 6)
    rhs = sys.g_p - msum[:n6, n6].reshape(w, 6)

    # damping of U uses the reduced (global) diagonal — matches single-device
    s = s + jnp.einsum("wv,wab->wavb", jnp.eye(w, dtype=dtype), damp(sys.u_blocks))

    fm = sys.free.astype(dtype)
    s = s * fm[:, None, None, None] * fm[None, None, :, None]
    s = s + jnp.einsum("wv,ab->wavb", jnp.diag(1.0 - fm), jnp.eye(6, dtype=dtype))
    rhs = rhs * fm[:, None]
    dp_diag = jnp.clip(jnp.diagonal(sys.u_blocks, axis1=-2, axis2=-1), 1e-8, 1e32)
    dl_diag = jnp.clip(jnp.diagonal(sys.v, axis1=-2, axis2=-1), 1e-8, 1e32)
    return s, rhs, v_inv, dp_diag, dl_diag


def _reduced_camera_system(poses, lm_pos, lam, prob: LandmarkMajorProblem, cam,
                           cfg, axis):
    """Build the damped, gauge-fixed reduced camera system.

    Returns ``(s [W,6,W,6], rhs [W,6], v_inv, wl, g_l, lm_active, free)`` —
    everything ``lm_major_step`` needs to solve and back-substitute, exposed
    separately so diagnostics (condition probe) see the exact same system."""
    sys = _build_system(poses, lm_pos, prob, cam, cfg, axis)
    s, rhs, v_inv, dp_diag, dl_diag = _damp_reduce(sys, lam, axis)
    return s, rhs, v_inv, sys.wl, sys.g_l, sys.lm_active, sys.free, \
        (sys.g_p, dp_diag, dl_diag)


def reduced_camera_condition(prob: LandmarkMajorProblem, cam, cfg,
                             lam: float = 0.0):
    """2-norm condition number of the (damped, gauge-fixed) reduced camera
    system — the solver-trust probe for large windows: f32 ``solve`` loses
    ~log10(cond) digits, so cond >~ 1e6 warrants ``reduced_solve_refine`` > 0
    or the f64 island (``reduced_solve_f64``)."""
    dtype = prob.poses.dtype
    s, *_ = _reduced_camera_system(
        prob.poses, prob.lm_pos, jnp.asarray(lam, dtype), prob, cam, cfg, None
    )
    w = prob.poses.shape[0]
    n = w * 6
    sv = jnp.linalg.svd(s.reshape(n, n), compute_uv=False)
    return sv[0] / jnp.maximum(sv[-1], jnp.finfo(dtype).tiny)


def _solve_from_system(sys: BASystem, poses, lm_pos, lam, cfg, axis):
    """Damped solve + back-substitution from prebuilt λ-free blocks.

    Returns ``(poses', lm_pos', predicted_decrease)`` — the predicted cost
    decrease of the damped quadratic model, ``0.5 δᵀ(λ D δ + g)`` (Madsen/
    Nielsen eq. 3.14 sign convention with g = -Jᵀr), used by the gain-ratio
    damping update in ``lm_loop``."""
    dtype = poses.dtype
    w = poses.shape[0]
    s, rhs, v_inv, dp_diag, dl_diag = _damp_reduce(sys, lam, axis)
    fm = sys.free.astype(dtype)

    n = w * 6
    s_mat = s.reshape(n, n) + 1e-10 * jnp.eye(n, dtype=dtype)
    rhs_v = rhs.reshape(n)
    if getattr(cfg, "reduced_solve_f64", False) and jax.config.jax_enable_x64:
        # f64 island: the reduced system is tiny ((W*6)^2), so promoting just
        # this solve recovers Ceres' double-precision DENSE_SCHUR behavior
        # (bundle_adjuster.cpp:9) at negligible cost
        delta_flat = jnp.linalg.solve(
            s_mat.astype(jnp.float64), rhs_v.astype(jnp.float64)
        ).astype(dtype)
    else:
        # factor ONCE and reuse the LU for refinement (jnp.linalg.solve is
        # lu_factor + lu_solve internally, so the first solve is bit-identical
        # to before, and each refinement pass saves a full re-factorization)
        lu, piv = jax.scipy.linalg.lu_factor(s_mat)
        delta_flat = jax.scipy.linalg.lu_solve((lu, piv), rhs_v)
        # mixed-precision iterative refinement: one residual-correction pass
        # recovers most of the accuracy f32 loses on ill-conditioned big
        # windows, reusing the already-computed factorization
        for _ in range(int(getattr(cfg, "reduced_solve_refine", 0))):
            resid = rhs_v - s_mat @ delta_flat
            delta_flat = delta_flat + jax.scipy.linalg.lu_solve((lu, piv), resid)
    delta_p = delta_flat.reshape(w, 6) * fm[:, None]

    # local landmark back-substitution (broadcast-sums: tiny contractions
    # lower better on the VPU than padded batched dots)
    wtdp = jnp.sum(sys.wl * delta_p[None, :, :, None], axis=(1, 2))   # [L, 3]
    gw = sys.g_l - wtdp
    delta_l = jnp.sum(v_inv * gw[:, None, :], axis=2)                 # [L, 3]
    delta_l = jnp.where(sys.lm_active[:, None], delta_l, 0.0)

    # predicted decrease 0.5 δᵀ(λDδ + g); the landmark part sums locally per
    # shard and psums (δl is landmark-sharded, δp replicated)
    pred_p = 0.5 * jnp.sum(
        delta_p * (lam * dp_diag * delta_p + sys.g_p * fm[:, None])
    )
    pred_l = 0.5 * jnp.sum(delta_l * (lam * dl_diag * delta_l + sys.g_l))
    if axis is not None:
        pred_l = jax.lax.psum(pred_l, axis)
    pred = pred_p + pred_l

    new_poses = pose_retract(poses, delta_p)
    new_poses = jnp.where(sys.free[:, None], new_poses, poses)
    return new_poses, lm_pos + delta_l, pred


def lm_major_step(poses, lm_pos, lam, prob: LandmarkMajorProblem, cam, cfg, axis):
    """One damped Schur step on landmark-major (possibly sharded) arrays:
    build the system at the iterate, then solve (see ``_solve_from_system``)."""
    sys = _build_system(poses, lm_pos, prob, cam, cfg, axis)
    return _solve_from_system(sys, poses, lm_pos, lam, cfg, axis)


def lm_loop(prob: LandmarkMajorProblem, cam, cfg, axis, init_lam=None):
    """Full LM accept/reject loop; shard-safe (all branches replicated).

    Returns ``(poses, lm_pos, initial_cost, final_cost, accepted, last_rel,
    final_lam)``. ``init_lam`` (traced scalar) overrides ``cfg.init_damping``
    — the λ warm start carried across consecutive window solves.

    The Ceres cost structure: residuals/Jacobians are evaluated once per
    ACCEPTED iterate (``_build_system``, carried across iterations); a
    rejected trust-region step re-damps and re-solves the carried system at
    the raised λ (``_solve_from_system``) without re-evaluating anything —
    measured ~60% of the per-iteration cost is the build, and roughly half of
    executed iterations are rejections, so this cuts the solve ~35% with
    bit-identical single-device iterate sequences.
    """
    poses0, lm0 = prob.poses, prob.lm_pos
    hd = getattr(cfg, "huber_delta_px", 0.0)
    cost0 = _lm_major_cost(poses0, lm0, prob, cam, cfg.min_depth, axis, hd)
    sys0 = _build_system(poses0, lm0, prob, cam, cfg, axis)

    def body(carry):
        poses, lm_pos, sys, lam, nu, cost, accepted, it, rel, done = carry
        cand_p, cand_l, pred = _solve_from_system(sys, poses, lm_pos, lam,
                                                  cfg, axis)
        cand_cost = _lm_major_cost(cand_p, cand_l, prob, cam, cfg.min_depth, axis, hd)
        # `upd` freezes the carry once done: under vmap (batched solves) the
        # loop keeps executing until EVERY batch element is done, and already-
        # converged elements must not keep taking steps (batched results must
        # equal per-problem results bit-for-bit)
        upd = ~done
        ok = (cand_cost < cost) & jnp.isfinite(cand_cost) & upd
        poses = jnp.where(ok, cand_p, poses)
        lm_pos = jnp.where(ok, cand_l, lm_pos)
        cost_new = jnp.where(ok, cand_cost, cost)
        # rebuild the λ-free system only when the iterate moved; a reject
        # keeps the carried system and only retries the damped reduction.
        # (Under vmap the cond degrades to both-branches-execute — batched
        # test solves just lose the saving, results unchanged. Under
        # shard_map the data-dependent cond breaks varying-manual-axes
        # unification of the while carry, so the sharded solver keeps the
        # rebuild-every-iteration form — identical results, and multi-chip
        # solves are collective-bound, not build-bound.)
        if axis is None:
            sys = jax.lax.cond(
                ok,
                lambda a: _build_system(a[0], a[1], prob, cam, cfg, axis),
                lambda a: a[2],
                (poses, lm_pos, sys),
            )
        else:
            sys = _build_system(poses, lm_pos, prob, cam, cfg, axis)
        # Nielsen gain-ratio damping (what Ceres' trust region does): the
        # fixed accept->λ/3 schedule overshot after every accept, so solves
        # oscillated accept/reject and burned the whole iteration budget —
        # measured ~12 executed iterations for ~5 accepted. λ now shrinks by
        # how well the quadratic model predicted the actual decrease.
        rho = (cost - cand_cost) / jnp.maximum(pred, 1e-20)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        new_lam = jnp.where(
            upd,
            jnp.clip(jnp.where(ok, lam * shrink, lam * nu),
                     cfg.min_damping, cfg.max_damping),
            lam,
        )
        nu = jnp.where(upd, jnp.where(ok, jnp.full_like(nu, 2.0), nu * 2.0), nu)
        rel = jnp.where(upd, jnp.abs(cost - cost_new) / jnp.maximum(cost, 1e-20), rel)
        # early exit (the jit analog of Ceres' function_tolerance + the 0.1 s
        # budget, bundle_adjuster.cpp:9-11): an accepted step that improved the
        # cost by under rel_tol, damping saturated after repeated rejects, OR a
        # rejected step whose candidate was within rel_tol of the current cost
        # (a flat region: raising damping only shrinks the step further, so no
        # materially better iterate is reachable) — without the flat-reject
        # exit the accept/reject oscillation near convergence burned the whole
        # iteration budget on steps that changed nothing
        flat_reject = upd & ~ok & (
            jnp.abs(cand_cost - cost) < cfg.lm_rel_tol * jnp.maximum(cost, 1e-20)
        )
        done = done | (ok & (rel < cfg.lm_rel_tol)) | flat_reject \
            | (upd & ~ok & (lam >= cfg.max_damping))
        return poses, lm_pos, sys, new_lam, nu, cost_new, \
            accepted + ok.astype(jnp.int32), \
            it + jnp.where(upd, 1, 0).astype(jnp.int32), rel, done

    def body2(carry):
        # 2x unroll: halves while-step sequencing overhead; the second
        # sub-iteration is a masked no-op once done
        return body(body(carry))

    def cond(carry):
        _, _, _, _, _, _, _, it, _, done = carry
        return (it < cfg.max_lm_iters) & ~done

    # multiply by ones_like(cost0) so scalars carry the same varying-manual-axes
    # metadata as the cost under shard_map (while carry types must match)
    ones = jnp.ones_like(cost0)
    lam0 = (
        jnp.asarray(cfg.init_damping, poses0.dtype)
        if init_lam is None
        else jnp.clip(
            jnp.asarray(init_lam, poses0.dtype), cfg.min_damping, cfg.max_damping
        )
    )
    init = (
        poses0,
        lm0,
        sys0,
        lam0 * ones,
         2.0 * ones,
        cost0,
        jnp.zeros_like(cost0).astype(jnp.int32),
        jnp.zeros_like(cost0).astype(jnp.int32),
        jnp.zeros_like(cost0),
        jnp.zeros_like(cost0).astype(bool),
    )
    poses, lm_pos, _, lam, _, cost, accepted, _, last_rel, _ = jax.lax.while_loop(
        cond, body2, init
    )
    return poses, lm_pos, cost0, cost, accepted, last_rel, lam
