"""Pallas TPU mega-kernel: one full LK Gauss-Newton level pass in VMEM.

Replaces the XLA ``_sample_template`` + ``_gn_iterate`` pair in ``ops/lk.py``
(itself the TPU rewrite of ``cv::calcOpticalFlowPyrLK``'s per-level iteration,
reference ``feature_tracker.cpp:23-26``). The XLA formulation re-reads the
whole ``[N, R, R]`` region set from HBM on *every* Gauss-Newton iteration
(~6-14 MB x ~12 iterations x 8 level passes per frame — the measured LK
bandwidth bound, NOTES.md open thread #1). This kernel blocks features over a
grid and keeps each block's template + iterate regions resident in VMEM for
the entire iteration loop: HBM touches the regions exactly once per level
pass.

Precision design (replaces the XLA path's region centering +
``Precision.HIGH`` einsums): bilinear sampling splits into an **integer**
window selection and a **fractional** blend,

    patch = (1-fy)(1-fx) W[:-1,:-1] + (1-fy)fx W[:-1,1:] + ...
    W[a,b] = region[y0+a, x0+b]

The integer selection is two one-hot batched matmuls whose selector operands
are exactly representable in bf16; the region operand enters as a bf16 hi/lo
split (``hi = bf16(x)``, ``lo = bf16(x - hi)``), and the row-selected
intermediate is re-split before the column matmul. Every MXU product is
therefore exact and the result matches f32 sampling to ~2^-16 relative — at 4
bf16 MXU passes vs the 6 of two ``Precision.HIGH`` einsums. The fractional
blend runs in f32 on the VPU (exact).

Iteration semantics are identical to ``lk._gn_loop``: shared per-block
iteration counter, per-feature convergence masking, OpenCV's oscillation
break, region-bound failure, ``eps`` step-norm termination, ``max_iters``
cap. Blocks early-exit independently when all their features converge, which
subsumes the XLA path's straggler-compaction machinery at a finer grain.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Gauss-Newton sub-iterations per while step (matches lk.LK_UNROLL tuning:
# the loop-carried work per sub-iteration is small relative to while-step
# sequencing overhead).
_UNROLL = 3


def split_hi_lo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bf16 hi/lo split of an f32 array: ``hi + lo == x`` to ~2^-16 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _brow(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Materialize a per-feature scalar ``[BN, 1, 1]`` as a lane row
    ``[BN, 1, w]``. Mosaic cannot lower a broadcast that expands sublanes AND
    lanes in one op ("Not implemented: Broadcast in both sublanes and lanes"),
    and it constant-folds ``jnp.broadcast_to`` / multiply-by-ones back into
    the consumer, recreating the fused broadcast. ``pltpu.repeat`` is a real
    lowering-level op, so the row is genuinely materialized and consumers
    broadcast sublane-only."""
    return pltpu.repeat(x, w, 2)


def _onehot(shift: jnp.ndarray, w: int, r: int, bn: int) -> jnp.ndarray:
    """``[BN, w, r]`` bf16 one-hot: row ``a`` selects region index ``shift+a``.
    ``shift`` is ``[BN, 1, 1]`` int32 — per-feature scalars stay rank-3
    throughout the kernel (Mosaic's layout inference crashes on the rank-1
    vectors and tiny reshapes the natural formulation produces). The shift
    folds into the *lane* iota first ([BN,1,r], lane-only broadcast), then the
    compare against the sublane iota broadcasts sublane-only — one broadcast
    axis per op (see _brow)."""
    a = jax.lax.broadcasted_iota(jnp.int32, (bn, w, r), 1)
    jr = jax.lax.broadcasted_iota(jnp.int32, (bn, 1, r), 2)
    d = jr - shift                       # [BN, 1, r]
    return (d == a).astype(jnp.bfloat16)


_BATCH_MM = (((2,), (1,)), ((0,), (0,)))   # [BN,w,R] @ [BN,R,R] -> [BN,w,R]
_BATCH_MM_T = (((2,), (2,)), ((0,), (0,)))  # [BN,w,R] @ [BN,w2,R] -> [BN,w,w2]


def _isample(reg_hi, reg_lo, x0i, y0i, w: int):
    """Integer window gather ``W[n,a,b] = region[n, y0+a, x0+b]`` via exact
    one-hot matmuls; out-of-range rows/cols select zero (the soft-selector
    semantics the XLA path relies on for its min-eig failure path)."""
    bn, r = reg_hi.shape[0], reg_hi.shape[1]
    rowsel = _onehot(y0i, w, r, bn)
    tmp = (
        jax.lax.dot_general(rowsel, reg_hi, _BATCH_MM,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(rowsel, reg_lo, _BATCH_MM,
                              preferred_element_type=jnp.float32)
    )
    tmp_hi, tmp_lo = split_hi_lo(tmp)
    colsel = _onehot(x0i, w, r, bn)
    return (
        jax.lax.dot_general(tmp_hi, colsel, _BATCH_MM_T,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(tmp_lo, colsel, _BATCH_MM_T,
                              preferred_element_type=jnp.float32)
    )


def _fsample(reg_hi, reg_lo, px, py, w: int):
    """Bilinear sample of a ``w x w`` window at continuous top-left ``(px, py)``
    (``[BN, 1, 1]`` region coords): integer gather of ``w+1`` then f32 blend."""
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    w1 = _isample(reg_hi, reg_lo, x0.astype(jnp.int32), y0.astype(jnp.int32),
                  w + 1)
    # separable blend, one broadcast axis per op (see _brow): the y blend's
    # coefficient row is [BN,1,w+1] broadcasting sublane-only into the
    # (w+1)-lane slices, the x blend's is [BN,1,w]
    fy_r = _brow(fy, w + 1)
    wy = (1.0 - fy_r) * w1[:, :w, :] + fy_r * w1[:, 1:, :]   # [BN, w, w+1]
    fx_r = _brow(fx, w)
    return (1.0 - fx_r) * wy[:, :, :w] + fx_r * wy[:, :, 1:]


def _scharr_patch(p: jnp.ndarray, w: int):
    """Scharr/32 x and y gradients of the interior ``w x w`` of a
    ``(w+2) x (w+2)`` patch (correlation taps, matching ``filters.scharr_*``;
    the XLA path's reflect padding never reaches the cropped interior)."""
    sy = 3.0 * p[:, :-2, :] + 10.0 * p[:, 1:-1, :] + 3.0 * p[:, 2:, :]
    gx = (sy[:, :, 2:] - sy[:, :, :-2]) / 32.0
    dy = p[:, 2:, :] - p[:, :-2, :]
    gy = (3.0 * dy[:, :, :-2] + 10.0 * dy[:, :, 1:-1] + 3.0 * dy[:, :, 2:]) / 32.0
    return gx, gy


def _gn_level_kernel(
    tpl_hi_ref, tpl_lo_ref, it_hi_ref, it_lo_ref, vec_ref, out_ref,
    *, win: int, max_iters: int, eps: float, min_eig_threshold: float,
):
    bn = tpl_hi_ref.shape[0]
    r = tpl_hi_ref.shape[1]
    win_area = float(win * win)

    tpl_hi = tpl_hi_ref[:]
    tpl_lo = tpl_lo_ref[:]
    it_hi = it_hi_ref[:]
    it_lo = it_lo_ref[:]
    # all per-feature scalars stay rank-3 [BN, 1, 1]: Mosaic's layout
    # inference crashes on rank-1 vectors and squeezing reshapes
    tpx = vec_ref[:, 0:1, :]
    tpy = vec_ref[:, 1:2, :]
    gx0 = vec_ref[:, 2:3, :]
    gy0 = vec_ref[:, 3:4, :]
    # guess offset: pos = guess + goff (goff = m - half - region_origin)
    gox = vec_ref[:, 4:5, :]
    goy = vec_ref[:, 5:6, :]
    active = vec_ref[:, 6:7, :] > 0.0

    def rsum(x):  # [BN, w, w] -> [BN, 1, 1]
        # one axis at a time: Mosaic's layout inference crashes
        # (layout.h:320, rank-1 value vs rank-2 layout) on a fused
        # multi-axis keepdims reduction — root cause of the round-2
        # TPU outage, isolated by micro-bisect on hardware
        return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    # ---- template: (win+2) patch sampled at pos-1, in-patch Scharr gradients
    tp = _fsample(tpl_hi, tpl_lo, tpx - 1.0, tpy - 1.0, win + 2)
    gx_p, gy_p = _scharr_patch(tp, win)
    t_patch = tp[:, 1:-1, 1:-1]

    g11 = rsum(gx_p * gx_p)
    g12 = rsum(gx_p * gy_p)
    g22 = rsum(gy_p * gy_p)
    tr = g11 + g22
    det = g11 * g22 - g12 * g12
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) * 0.5
    eig_ok = (min_eig / win_area) >= min_eig_threshold
    det_ok = det > 1e-12
    solvable = eig_ok & det_ok & active

    safe_det = jnp.where(det_ok, det, 1.0)
    inv11 = jnp.where(det_ok, g22 / safe_det, 0.0)
    inv12 = jnp.where(det_ok, -g12 / safe_det, 0.0)
    inv22 = jnp.where(det_ok, g11 / safe_det, 0.0)

    lim = jnp.float32(r - win - 1)

    def in_region(gx, gy):
        px = gx + gox
        py = gy + goy
        return (px >= 0.0) & (px <= lim) & (py >= 0.0) & (py <= lim)

    def body(state):
        # `converged` is loop-carried as f32 0/1: an i1 vector carry fails
        # Mosaic's scf.yield legalization (isolated by bisect on hardware)
        gx, gy, convf, psx, psy, it = state
        converged = convf > 0.5
        px = jnp.clip(gx + gox, 0.0, lim)
        py = jnp.clip(gy + goy, 0.0, lim)
        j_patch = _fsample(it_hi, it_lo, px, py, win)
        di = j_patch - t_patch
        bx = rsum(di * gx_p)
        by = rsum(di * gy_p)
        sx = -(inv11 * bx + inv12 * by)
        sy = -(inv12 * bx + inv22 * by)
        # OpenCV's oscillation break (lkpyramid delta.ddot(prevDelta) < -0.01)
        osc = (it > 0) & (sx * psx + sy * psy < -0.01)
        sx = jnp.where(osc, 0.5 * sx, sx)
        sy = jnp.where(osc, 0.5 * sy, sy)
        upd = solvable & ~converged & (it < max_iters)
        ngx = jnp.where(upd, gx + sx, gx)
        ngy = jnp.where(upd, gy + sy, gy)
        small = sx * sx + sy * sy < eps * eps
        conv = converged | small | osc | ~in_region(ngx, ngy) | ~solvable
        return (ngx, ngy, conv.astype(jnp.float32),
                jnp.where(upd, sx, psx), jnp.where(upd, sy, psy), it + 1)

    def body_unrolled(state):
        for _ in range(_UNROLL):
            state = body(state)
        return state

    def cond(state):
        _, _, convf, _, _, it = state
        # staged single-axis reduction (fused multi-axis reduces crash
        # Mosaic's layout inference, layout.h:320); [BN,1,1] -> [1,1,1]
        nc = jnp.sum(
            jnp.sum(jnp.sum(convf, axis=2, keepdims=True), axis=1,
                    keepdims=True),
            axis=0, keepdims=True)
        return (it < max_iters) & (nc[0, 0, 0] < float(bn))

    gx, gy, convf, _, _, _ = jax.lax.while_loop(
        cond, body_unrolled,
        (gx0, gy0, (~solvable).astype(jnp.float32),
         jnp.zeros((bn, 1, 1), jnp.float32),
         jnp.zeros((bn, 1, 1), jnp.float32), jnp.int32(0)),
    )

    out_ref[:, 0:1, :] = gx
    out_ref[:, 1:2, :] = gy
    out_ref[:, 2:3, :] = solvable.astype(jnp.float32)
    out_ref[:, 3:4, :] = convf


# Kernel VMEM budget. The default scoped-vmem limit is 16 MB; we raise it via
# CompilerParams (v5e has 128 MB VMEM) and budget against that. Measured on
# hardware: bn=64, r=88 allocates 19.2 MB on the stack at grid=1.
_VMEM_LIMIT = 96 * 2**20
_VMEM_BUDGET = 80 * 2**20  # headroom under the limit for compiler spill


def _pick_block(n: int, r: int) -> int:
    """Feature block size: large blocks amortize grid overhead, but VMEM must
    hold 4 region blocks (bf16, lanes padded to 128, double-buffered across
    the grid) plus per-iteration intermediates (one-hot selectors, f32
    windows/patches — roughly another regions-worth, measured)."""
    lanes = (r + 127) // 128 * 128
    sub16 = (r + 15) // 16 * 16   # bf16 tiles are (16, 128): sublanes pad to 16
    sub8 = (r + 7) // 8 * 8       # f32 tiles are (8, 128)
    for bn in (64, 32, 16, 8):
        if n % bn == 0:
            regions = 4 * 2 * bn * sub16 * lanes * 2  # bf16, double-buffered
            inter = 2 * bn * sub8 * lanes * 4         # f32 working set
            if regions + inter <= _VMEM_BUDGET:
                return bn
    return 0


@functools.partial(
    jax.jit, static_argnames=("win", "max_iters", "eps", "min_eig_threshold",
                              "interpret"))
def gn_level_pass(
    tpl_reg: jnp.ndarray,
    it_reg: jnp.ndarray,
    tpl_pos: jnp.ndarray,
    guess: jnp.ndarray,
    goff: jnp.ndarray,
    active: jnp.ndarray,
    win: int = 21,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-2,
    interpret: bool = False,
):
    """One LK level pass for all features.

    ``tpl_reg`` / ``it_reg``: ``[N, R, R]`` f32 template / iterate regions
    (pre-centered). ``tpl_pos [N, 2]``: template window top-left in template
    region coords. ``guess [N, 2]``: start positions in image coords.
    ``goff [N, 2]``: per-feature offset such that ``pos = guess + goff`` is
    the window top-left in iterate region coords. ``active [N]`` bool.

    Returns ``(guess' [N, 2], solvable [N] bool)``.
    """
    n, r, _ = tpl_reg.shape
    bn = _pick_block(n, r)
    if bn == 0:
        raise ValueError(f"no feature block size divides N={n}")

    tpl_hi, tpl_lo = split_hi_lo(tpl_reg)
    it_hi, it_lo = split_hi_lo(it_reg)
    vec = jnp.concatenate(
        [tpl_pos, guess, goff, active.astype(jnp.float32)[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1)[:, :, None]   # [N, 8, 1]

    kern = functools.partial(
        _gn_level_kernel, win=win, max_iters=max_iters, eps=float(eps),
        min_eig_threshold=float(min_eig_threshold))
    reg_spec = pl.BlockSpec((bn, r, r), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[reg_spec, reg_spec, reg_spec, reg_spec,
                  pl.BlockSpec((bn, 8, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, 4, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(tpl_hi, tpl_lo, it_hi, it_lo, vec)
    out = out[:, :, 0]
    return out[:, :2], out[:, 2] > 0.0
