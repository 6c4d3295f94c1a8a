"""Batched pyramidal Lucas-Kanade optical flow.

Replaces ``cv::calcOpticalFlowPyrLK(..., Size(21,21), 3, {30 iters, eps 0.01},
0, 1e-2)`` (reference ``feature_tracker.cpp:23-26``) with a fixed-capacity
batched device op: all N features advance together through the pyramid
(coarse -> fine), each level running a whole-batch Gauss-Newton iteration loop
with per-feature convergence masking and a whole-batch early exit.

Algorithm parity with OpenCV:
- spatial gradients via Scharr/32 on the template (previous) image per level;
- 21x21 window, bilinear sub-pixel sampling of template and target patches;
- per-feature 2x2 normal matrix G; failure if ``min_eig(G)/win_area`` is below
  ``min_eig_threshold`` at level 0 (status false) — higher levels just stop
  refining;
- iteration stops when the update norm drops below ``eps`` (0.01) or after
  ``max_iters`` (30);
- a feature whose tracked position leaves the image is marked lost.

The forward-backward verification the reference performs
(``feature_tracker.cpp:31-47``) is just a second call with images swapped —
see ``frontend.track``.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from stereo_vo_tpu.ops.filters import scharr_x, scharr_y


def _bilinear_patch(img: jnp.ndarray, center: jnp.ndarray, offsets: jnp.ndarray):
    """Sample ``img`` at ``center + offsets`` for one feature.

    center: [2] (x, y); offsets: [P, 2]; returns [P].
    Coordinates follow OpenCV patch convention: sample at integer+fraction with
    bilinear weights from the fractional part.
    """
    pts = center[None, :] + offsets  # [P, 2]
    x = pts[:, 0]
    y = pts[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    h, w = img.shape
    xi = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    i00 = img[yi, xi]
    i01 = img[yi, xi + 1]
    i10 = img[yi + 1, xi]
    i11 = img[yi + 1, xi + 1]
    return (
        i00 * (1 - fy) * (1 - fx)
        + i01 * (1 - fy) * fx
        + i10 * fy * (1 - fx)
        + i11 * fy * fx
    )


def _lk_level(
    prev_img, next_img, gx, gy, pts_prev, guess, active, half: int,
    max_iters: int, eps: float, min_eig_threshold: float, is_level0: bool,
):
    """One pyramid level of LK for all features.

    pts_prev/guess: [N, 2] at this level's scale. Returns (new_guess [N,2],
    ok [N] — min-eig/inside checks at this level).
    """
    n = pts_prev.shape[0]
    h, w = prev_img.shape
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    offs = jnp.stack(
        [jnp.tile(r, half * 2 + 1), jnp.repeat(r, half * 2 + 1)], axis=-1
    )  # [P, 2] (x, y)
    win_area = float((2 * half + 1) ** 2)

    sample = jax.vmap(_bilinear_patch, in_axes=(None, 0, None))
    t_patch = sample(prev_img, pts_prev, offs)   # [N, P] template
    gx_p = sample(gx, pts_prev, offs)
    gy_p = sample(gy, pts_prev, offs)

    g11 = jnp.sum(gx_p * gx_p, axis=1)
    g12 = jnp.sum(gx_p * gy_p, axis=1)
    g22 = jnp.sum(gy_p * gy_p, axis=1)
    tr = g11 + g22
    det = g11 * g22 - g12 * g12
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5
    eig_ok = (min_eig / win_area) >= min_eig_threshold
    det_ok = det > 1e-12
    solvable = eig_ok & det_ok & active

    inv11 = jnp.where(det_ok, g22 / jnp.where(det_ok, det, 1.0), 0.0)
    inv12 = jnp.where(det_ok, -g12 / jnp.where(det_ok, det, 1.0), 0.0)
    inv22 = jnp.where(det_ok, g11 / jnp.where(det_ok, det, 1.0), 0.0)

    def body(state):
        guess, converged, it = state

        def iterate(_):
            j_patch = sample(next_img, guess, offs)  # [N, P]
            di = j_patch - t_patch
            bx = jnp.sum(di * gx_p, axis=1)
            by = jnp.sum(di * gy_p, axis=1)
            dx = -(inv11 * bx + inv12 * by)
            dy = -(inv12 * bx + inv22 * by)
            step = jnp.stack([dx, dy], axis=-1)
            upd = solvable & ~converged
            new_guess = jnp.where(upd[:, None], guess + step, guess)
            small = jnp.sum(step * step, axis=-1) < eps * eps
            return new_guess, converged | small | ~solvable

        new_guess, new_conv = iterate(None)
        return new_guess, new_conv, it + 1

    def cond(state):
        _, converged, it = state
        return (it < max_iters) & ~jnp.all(converged)

    converged0 = jnp.zeros(n, bool) | ~solvable
    guess, _, _ = jax.lax.while_loop(cond, body, (guess, converged0, 0))

    # OpenCV only kills a feature when its point leaves the image (the window
    # may partially hang off the border; sampling clamps there).
    inside = (
        (guess[:, 0] >= 0)
        & (guess[:, 0] <= w - 1)
        & (guess[:, 1] >= 0)
        & (guess[:, 1] <= h - 1)
    )
    if is_level0:
        ok = solvable & inside
    else:
        ok = active  # higher levels don't kill features, they just stop helping
    return guess, ok


def lk_track_pyramid(
    prev_pyr: List[jnp.ndarray],
    next_pyr: List[jnp.ndarray],
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    window: int = 21,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track ``pts [N, 2]`` from ``prev_pyr`` to ``next_pyr``.

    Returns ``(tracked [N, 2], status [N] bool)``. Invalid input slots stay
    invalid. Pyramids are lists level0..levelL of float32 images (level 0 full
    resolution); gradients are computed internally per level.
    """
    half = window // 2
    n_levels = len(prev_pyr)
    scale_top = float(2 ** (n_levels - 1))
    guess = pts / scale_top
    ok = valid
    for lvl in range(n_levels - 1, -1, -1):
        prev_img = prev_pyr[lvl]
        next_img = next_pyr[lvl]
        gx = scharr_x(prev_img)
        gy = scharr_y(prev_img)
        pts_l = pts / float(2 ** lvl)
        guess, ok = _lk_level(
            prev_img, next_img, gx, gy, pts_l, guess, ok, half,
            max_iters, eps, min_eig_threshold, is_level0=(lvl == 0),
        )
        if lvl > 0:
            guess = guess * 2.0
    return guess, ok & valid
