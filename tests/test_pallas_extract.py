"""Interpret-mode parity of the Pallas region-extraction kernels.

The TPU default path (`extract_regions` dispatches to these on non-CPU
backends) previously had zero CPU-suite coverage — the round-2 failure mode.
Each kernel variant runs with ``interpret=True`` against the vmapped
``dynamic_slice`` reference on the same inputs, including edge-clipped
origins (callers pre-clip + 8-align, so parity is over that contract).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_vo_tpu.ops.pallas_extract import (
    _FB,
    _extract_regions_tiled,
    _extract_regions_vmem,
    _extract_regions_vmap,
)


def _inputs(rng, n, c, hp, wp, r):
    stack = rng.normal(size=(c, hp, wp)).astype(np.float32) * 40 + 128
    ox = (rng.integers(0, wp - r, n) // 8) * 8
    oy = (rng.integers(0, hp - r, n) // 8) * 8
    # include the corners the clip logic has to handle
    ox[0], oy[0] = 0, 0
    ox[1] = (wp - r) // 8 * 8
    oy[1] = (hp - r) // 8 * 8
    origins = np.stack([ox, oy], 1).astype(np.int32)
    return jnp.asarray(stack), jnp.asarray(origins)


@pytest.mark.parametrize("hp,wp,r", [(384, 1256, 88), (96, 320, 48)])
def test_vmem_variant_parity(rng, hp, wp, r):
    stack, origins = _inputs(rng, _FB * 2, 1, hp, wp, r)
    got = _extract_regions_vmem(stack[0], origins, r, r, interpret=True)
    want = _extract_regions_vmap(stack, origins, r, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_tiled_variant_parity(rng):
    hp, wp, r = 384, 1256, 88
    stack, origins = _inputs(rng, _FB, 1, hp, wp, r)
    got = _extract_regions_tiled(stack[0], origins, r, r, interpret=True)
    want = _extract_regions_vmap(stack, origins, r, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_rect_region_parity(rng):
    """ry != rx regions (StereoBM's short-wide search bands) match the
    dynamic-slice reference for both Pallas variants."""
    hp, wp, ry, rx = 384, 1256, 32, 80
    stack, origins = _inputs(rng, _FB, 1, hp, wp, max(ry, rx))
    got_v = _extract_regions_vmem(stack[0], origins, ry, rx, interpret=True)
    got_t = _extract_regions_tiled(stack[0], origins, ry, rx, interpret=True)
    want = _extract_regions_vmap(stack, origins, ry, rx)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want), atol=1e-4)
