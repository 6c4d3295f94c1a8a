"""Pallas TPU kernels: batched region extraction at dynamic offsets.

``[N]`` features each pull a ``[C, R, R]`` window from a ``[C, Hp, Wp]`` image
stack at per-feature integer origins. XLA lowers the equivalent batched
``dynamic_slice`` to a serialized per-feature update loop (~1.3 us each — ~30%
of VO frame time), so the TPU path implements it with per-feature DMA.

Mosaic constrains HBM slices: sublane (second-minor) offsets must be multiples
of 8, lane (minor) offsets AND sizes multiples of 128 — arbitrary per-feature
x-origins violate the lane rule. The kernel therefore works on a TRANSPOSED
stack ``[C, Wp, Hp]`` where image x is the sublane dim (8-aligned origins are
cheap to guarantee) and image y is the lane dim, DMA'd as a 128-aligned band;
an in-kernel transpose + 8-aligned sublane slice then crops y. Callers must
pass origins pre-aligned down to multiples of 8 in BOTH axes, with regions
sized ``win + 2*slack + 9`` rounded up so the alignment residual stays inside.

Off-TPU (CPU tests) falls back to the vmapped ``dynamic_slice`` formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# features per grid step (DMAs issued concurrently per step)
_FB = 8


def _cdiv(a, b):
    return -(-a // b)


def _extract_kernel_t(origins_ref, stackt_ref, out_ref, scratch, scratch_t,
                      sems, *, r, span, hp_pad, n_ch):
    i = pl.program_id(0)

    def issue(k):
        n = i * _FB + k
        ox = pl.multiple_of(origins_ref[n, 0], 8)
        oy = origins_ref[n, 1]
        band = jnp.minimum((oy // 128) * 128, hp_pad - span)
        band = pl.multiple_of(jnp.maximum(band, 0), 128)
        return band, pltpu.make_async_copy(
            stackt_ref.at[:, pl.ds(ox, r), pl.ds(band, span)],
            scratch.at[k],
            sems.at[k],
        )

    for k in range(_FB):
        issue(k)[1].start()
    for k in range(_FB):
        n = i * _FB + k
        band, dma = issue(k)
        dma.wait()
        # scratch[k]: [C, r(x), span(y)] -> transpose -> [C, span(y), r(x)],
        # staged through a scratch ref so the y crop can be a dynamic sublane
        # ref-read (dynamic_slice on values is not lowered in Mosaic)
        scratch_t[k] = jnp.swapaxes(scratch[k], 1, 2)
        off = pl.multiple_of(origins_ref[n, 1] - band, 8)
        out_ref[k] = scratch_t[k, :, pl.ds(off, r), :]


def _extract_regions_vmap(stack, origins, ry, rx):
    c = stack.shape[0]
    return jax.vmap(
        lambda oy, ox: jax.lax.dynamic_slice(stack, (0, oy, ox), (c, ry, rx))
    )(origins[:, 1], origins[:, 0])


def extract_regions(stack: jnp.ndarray, origins: jnp.ndarray, ry: int, rx: int):
    """``stack [C, Hp, Wp]`` + ``origins [N, 2]`` (x, y) -> ``[N, C, RY, RX]``.

    Origins must be pre-clipped to ``[0, dim - size]`` and pre-aligned down to
    multiples of 8 in both axes (the LK callers do both).
    """
    n = origins.shape[0]
    c, hp, wp = stack.shape
    use_pallas = (
        jax.default_backend() not in ("cpu",)
        and os.environ.get("STEREO_VO_NO_PALLAS", "0") != "1"
        and n % _FB == 0
        and ry == rx
        and ry % 8 == 0
    )
    if not use_pallas:
        return _extract_regions_vmap(stack, origins, ry, rx)

    r = ry
    hp_pad = max(_cdiv(hp, 128) * 128, 128)
    span = min(hp_pad, _cdiv(128 + r, 128) * 128)
    # transpose once per call (XLA, bandwidth-bound) and pad y to the lane grid
    stackt = jnp.swapaxes(stack, 1, 2)                     # [C, Wp, Hp]
    stackt = jnp.pad(stackt, ((0, 0), (0, 0), (0, hp_pad - hp)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _FB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_FB, c, r, r),
            lambda i, origins: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_FB, c, r, span), stack.dtype),
            pltpu.VMEM((_FB, c, span, r), stack.dtype),
            pltpu.SemaphoreType.DMA((_FB,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _extract_kernel_t, r=r, span=span, hp_pad=hp_pad, n_ch=c
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c, r, r), stack.dtype),
    )(origins, stackt)
