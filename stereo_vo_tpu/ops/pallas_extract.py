"""Pallas TPU kernels: batched region extraction at dynamic offsets.

``[N]`` features each pull a ``[C, R, R]`` window from a ``[C, Hp, Wp]`` image
stack at per-feature integer origins. XLA lowers the equivalent batched
``dynamic_slice`` to a serialized per-feature update loop (~1.3 us each — ~30%
of VO frame time), so the TPU path implements it with per-feature DMA.

Mosaic constrains HBM slices: sublane (second-minor) offsets must be multiples
of 8, lane (minor) offsets AND sizes multiples of 128 — arbitrary per-feature
x-origins violate the lane rule. The production paths therefore move an
8-aligned row slice x 128-aligned lane BAND per feature (legal, ~2x data
waste) and crop the lanes afterwards with one exact one-hot permutation
matmul on the MXU (per-feature dynamic crops would serialize again). Callers
must pass origins pre-aligned down to multiples of 8 in both axes, with
regions sized ``win + 2*slack + 9`` rounded up so the residual stays inside.

Two variants, dispatched on image size (both production defaults on TPU):
``_extract_regions_vmem`` keeps the whole image VMEM-resident and copies with
aligned vector moves (no DMA descriptor cost; wins when the image fits), and
``_extract_regions_tiled`` DMAs whole (8, 128) tiles from a retiled copy.
Removed after measurement (NOTES.md): a fully-in-kernel transpose variant (4x
slower than the XLA fallback) and a multi-channel band-DMA variant (round 4:
no remaining caller — LK regions are all 1-channel since the in-patch Scharr
identity landed).

Off-TPU (CPU tests) falls back to the vmapped ``dynamic_slice`` formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# features per grid step (DMAs issued concurrently per step). Extraction is
# DMA-latency-bound (thousands of ~50-100 KB copies), so in-flight depth —
# not bandwidth — sets the rate; 32 concurrent copies per step measured ~2x
# faster than 8 at level-0 region sizes.
_FB = 32


def _cdiv(a, b):
    return -(-a // b)


def _extract_regions_vmap(stack, origins, ry, rx):
    c = stack.shape[0]
    return jax.vmap(
        lambda oy, ox: jax.lax.dynamic_slice(stack, (0, oy, ox), (c, ry, rx))
    )(origins[:, 1], origins[:, 0])


def _tiled_kernel(origins_ref, tiles_ref, out_ref, sems, *, nty, ntx, tx_max):
    """Per-feature DMA of whole (8, 128) tiles from the retiled image.

    The row-band kernel above moves ~R strided 1 KB row slivers per feature —
    descriptor-count-bound. Fetching from a [TY, TX, 8, 128] retiling moves
    nty*ntx contiguous 4 KB tiles per feature instead (~4x fewer, 4x larger
    chunks), which measured ~3x faster at LK region sizes."""
    i = pl.program_id(0)

    def issue(k):
        n = i * _FB + k
        ty = origins_ref[n, 1] // 8
        tx = jnp.clip(origins_ref[n, 0] // 128, 0, tx_max)
        return pltpu.make_async_copy(
            tiles_ref.at[pl.ds(ty, nty), pl.ds(tx, ntx)],
            out_ref.at[k],
            sems.at[k],
        )

    for k in range(_FB):
        issue(k).start()
    for k in range(_FB):
        issue(k).wait()


def _extract_regions_tiled(img, origins, ry, rx, interpret=False):
    """TPU fast path for single-channel stacks: tile DMA + one-hot lane crop.

    ``ry`` rows x ``rx`` lanes per region (both multiples of 8; ``rx`` may
    differ from ``ry`` — e.g. StereoBM's short-and-wide right search bands)."""
    n = origins.shape[0]
    hp, wp = img.shape
    hp_pad = _cdiv(hp, 8) * 8
    wp_pad = max(_cdiv(wp, 128) * 128, 128)
    span = min(wp_pad, _cdiv(128 + rx, 128) * 128)
    nty, ntx = ry // 8, span // 128
    img_p = jnp.pad(img, ((0, hp_pad - hp), (0, wp_pad - wp)))
    tiles = img_p.reshape(hp_pad // 8, 8, wp_pad // 128, 128).transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _FB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_FB, nty, ntx, 8, 128),
            lambda i, origins: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_FB,))],
    )
    bands = pl.pallas_call(
        functools.partial(
            _tiled_kernel, nty=nty, ntx=ntx, tx_max=wp_pad // 128 - ntx
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nty, ntx, 8, 128), img.dtype),
        interpret=interpret,
    )(origins, tiles)
    # [N, nty, ntx, 8, 128] -> [N, ry, span]
    bands = bands.transpose(0, 1, 3, 2, 4).reshape(n, ry, span)

    band_start = jnp.clip((origins[:, 0] // 128), 0, wp_pad // 128 - ntx) * 128
    off = origins[:, 0] - band_start                            # [N]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (span, rx), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (span, rx), 1)
    onehot = (s_idx[None] == off[:, None, None] + j_idx[None]).astype(img.dtype)
    return jnp.einsum("nrs,nsj->nrj", bands, onehot,
                      preferred_element_type=jnp.float32)[:, None]


def _vmem_kernel(origins_ref, img_ref, out_ref, *, ry, span, wp_pad):
    """Whole image resident in VMEM; per-feature region copy as aligned vector
    moves. Row origins are 8-aligned (vreg-row aligned) and the lane band is
    128-aligned (lane-tile aligned), so each copy is pure vreg traffic with no
    DMA descriptor cost — the DMA variants above pay ~2 us *per feature* in
    descriptor issue alone, which dominates extraction at N=512."""
    i = pl.program_id(0)

    for k in range(_FB):
        n = i * _FB + k
        oy = pl.multiple_of(origins_ref[n, 1], 8)
        bx = jnp.minimum((origins_ref[n, 0] // 128) * 128, wp_pad - span)
        bx = pl.multiple_of(jnp.maximum(bx, 0), 128)
        out_ref[k] = img_ref[pl.ds(oy, ry), pl.ds(bx, span)]


def _extract_regions_vmem(img, origins, ry, rx, interpret=False):
    """TPU fast path for single-channel stacks: VMEM-resident image + aligned
    vector-copy extraction + one-hot lane crop. ``ry`` rows x ``rx`` lanes."""
    n = origins.shape[0]
    hp, wp = img.shape
    hp_pad = _cdiv(hp, 8) * 8
    wp_pad = max(_cdiv(wp, 128) * 128, 128)
    span = min(wp_pad, _cdiv(128 + rx, 128) * 128)
    img_p = jnp.pad(img, ((0, hp_pad - hp), (0, wp_pad - wp)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _FB,),
        in_specs=[
            pl.BlockSpec(
                (hp_pad, wp_pad), lambda i, origins: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_FB, ry, span),
            lambda i, origins: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    bands = pl.pallas_call(
        functools.partial(_vmem_kernel, ry=ry, span=span, wp_pad=wp_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ry, span), img.dtype),
        interpret=interpret,
    )(origins, img_p)

    band_start = jnp.clip(origins[:, 0] // 128, 0, wp_pad // 128 - span // 128) * 128
    off = origins[:, 0] - band_start                            # [N]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (span, rx), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (span, rx), 1)
    onehot = (s_idx[None] == off[:, None, None] + j_idx[None]).astype(img.dtype)
    return jnp.einsum("nrs,nsj->nrj", bands, onehot,
                      preferred_element_type=jnp.float32)[:, None]


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
        and ry % 8 == 0
        and rx % 8 == 0
        and c == 1
    )
    if use_pallas:
        # image must fit in VMEM next to double-buffered output blocks
        if (hp + 7) // 8 * 8 * max((wp + 127) // 128 * 128, 128) * 4 <= 6 * 2**20:
            return _extract_regions_vmem(stack[0], origins, ry, rx)
        return _extract_regions_tiled(stack[0], origins, ry, rx)
    return _extract_regions_vmap(stack, origins, ry, rx)
