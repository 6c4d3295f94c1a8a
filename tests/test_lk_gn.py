"""Interpret-mode parity of the Pallas LK GN mega-kernel vs the XLA path.

The round-2 verdict's root regression: ``ops/lk_gn.py`` shipped with zero
test coverage and only executed on hardware (where it crashed Mosaic). These
tests run the kernel with ``interpret=True`` inside the normal CPU suite and
pin it, feature by feature, to the parity-tested XLA formulation
(``lk._sample_template`` + ``lk._gn_iterate``) it replaces — positions AND
solvable masks — across solvable, min-eig-failing, out-of-region, oscillating
and inactive features (reference semantics: ``feature_tracker.cpp:23-26``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_vo_tpu.ops import lk
from stereo_vo_tpu.ops.lk_gn import gn_level_pass, split_hi_lo

WIN = 21
HALF = WIN // 2


def _textured_region(rng, n, r, contrast=30.0):
    """Smooth random texture (bilinear-upsampled noise) — differentiable
    enough for GN to converge, like real image patches."""
    coarse = rng.normal(size=(n, r // 4 + 2, r // 4 + 2)) * contrast
    out = np.empty((n, r, r), np.float32)
    ys = np.arange(r) / 4.0
    xs = np.arange(r) / 4.0
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = (ys - y0)[None, :, None]
    fx = (xs - x0)[None, None, :]
    c = coarse
    out = (
        (1 - fy) * (1 - fx) * c[:, y0][:, :, x0]
        + (1 - fy) * fx * c[:, y0][:, :, x0 + 1]
        + fy * (1 - fx) * c[:, y0 + 1][:, :, x0]
        + fy * fx * c[:, y0 + 1][:, :, x0 + 1]
    )
    return out.astype(np.float32)


def _shifted(reg, dx, dy):
    """Shift each region's content by a per-feature integer (dy, dx)."""
    out = np.zeros_like(reg)
    for i in range(reg.shape[0]):
        out[i] = np.roll(reg[i], (dy[i], dx[i]), axis=(0, 1))
    return out


def _run_both(tpl_reg, it_reg, tpl_pos, guess, goff, active,
              max_iters=30, eps=0.01, min_eig=1e-2):
    """Run the Pallas kernel (interpret) and the XLA reference on identical
    inputs. Geometry: the XLA path wants image-coord guesses plus (org, m);
    we pick m=HALF so org = -goff exactly (goff = m - half - org)."""
    n = guess.shape[0]
    m = HALF
    org = -(goff)  # [N, 2] float; org = m - half - goff with m = half

    kg, ksolv = gn_level_pass(
        jnp.asarray(tpl_reg), jnp.asarray(it_reg), jnp.asarray(tpl_pos),
        jnp.asarray(guess), jnp.asarray(goff), jnp.asarray(active),
        win=WIN, max_iters=max_iters, eps=eps, min_eig_threshold=min_eig,
        interpret=True,
    )

    tpl = lk._sample_template(jnp.asarray(tpl_reg)[:, None],
                              jnp.asarray(tpl_pos), WIN)
    xg, xsolv, _ = lk._gn_iterate(
        tpl, jnp.asarray(it_reg)[:, None], jnp.asarray(guess),
        jnp.asarray(active), HALF, max_iters, eps, min_eig,
        jnp.asarray(org), m,
    )
    return (np.asarray(kg), np.asarray(ksolv),
            np.asarray(xg), np.asarray(xsolv))


def test_split_hi_lo_reconstructs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 40)).astype(np.float32) * 100)
    hi, lo = split_hi_lo(x)
    rec = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               rtol=2**-15, atol=1e-4)


def test_parity_solvable_features():
    """Well-textured features with known integer shifts: both paths converge
    to the same positions and both mark every feature solvable."""
    rng = np.random.default_rng(1)
    n, r = 16, 88
    tpl = _textured_region(rng, n, r)
    dx = rng.integers(-4, 5, n)
    dy = rng.integers(-4, 5, n)
    it = _shifted(tpl, dx, dy)

    # template window centered in its region; guess starts at the true
    # template center in image coords (offset chosen so pos = guess + goff)
    tpl_pos = np.full((n, 2), (r - WIN) / 2.0, np.float32)
    guess = np.full((n, 2), 200.0, np.float32) + rng.uniform(-0.3, 0.3, (n, 2)).astype(np.float32)
    goff = (tpl_pos - guess).astype(np.float32)
    active = np.ones(n, bool)

    kg, ksolv, xg, xsolv = _run_both(tpl, it, tpl_pos, guess, goff, active)
    assert ksolv.all() and xsolv.all()
    np.testing.assert_allclose(kg, xg, atol=5e-2)
    # and both found the injected shift (roll moves content by (dy,dx), so the
    # window tracking that content moves the same way)
    expect = guess + np.stack([dx, dy], 1)
    err = np.linalg.norm(kg - expect, axis=1)
    assert np.median(err) < 0.25


def test_parity_min_eig_failure():
    """Flat (textureless) regions fail the min-eig gate on both paths."""
    rng = np.random.default_rng(2)
    n, r = 8, 88
    tpl = _textured_region(rng, n, r)
    tpl[::2] = 0.0  # flat -> zero gradients -> min-eig failure
    it = tpl.copy()
    tpl_pos = np.full((n, 2), (r - WIN) / 2.0, np.float32)
    guess = np.full((n, 2), 100.0, np.float32)
    goff = (tpl_pos - guess).astype(np.float32)
    active = np.ones(n, bool)

    kg, ksolv, xg, xsolv = _run_both(tpl, it, tpl_pos, guess, goff, active)
    np.testing.assert_array_equal(ksolv, xsolv)
    assert not ksolv[::2].any() and ksolv[1::2].all()
    # failed features keep their input guess on both paths
    np.testing.assert_allclose(kg[::2], guess[::2], atol=1e-6)
    np.testing.assert_allclose(kg, xg, atol=5e-2)


def test_parity_inactive_features():
    """Inactive slots are not solvable and never move."""
    rng = np.random.default_rng(3)
    n, r = 8, 88
    tpl = _textured_region(rng, n, r)
    it = tpl.copy()
    tpl_pos = np.full((n, 2), (r - WIN) / 2.0, np.float32)
    guess = np.full((n, 2), 150.0, np.float32)
    goff = (tpl_pos - guess).astype(np.float32)
    active = np.zeros(n, bool)
    active[:3] = True

    kg, ksolv, xg, xsolv = _run_both(tpl, it, tpl_pos, guess, goff, active)
    np.testing.assert_array_equal(ksolv, xsolv)
    assert not ksolv[3:].any()
    np.testing.assert_allclose(kg[3:], guess[3:], atol=1e-6)
    np.testing.assert_allclose(kg, xg, atol=5e-2)


def test_parity_out_of_region_start():
    """A guess whose window starts outside the region clamps + converges the
    feature immediately on both paths (the in_region failure branch)."""
    rng = np.random.default_rng(4)
    n, r = 8, 88
    tpl = _textured_region(rng, n, r)
    it = tpl.copy()
    tpl_pos = np.full((n, 2), (r - WIN) / 2.0, np.float32)
    guess = np.full((n, 2), 150.0, np.float32)
    goff = (tpl_pos - guess).astype(np.float32)
    goff[:4] += 300.0  # push the iterate window far outside the region
    active = np.ones(n, bool)

    kg, ksolv, xg, xsolv = _run_both(tpl, it, tpl_pos, guess, goff, active)
    np.testing.assert_array_equal(ksolv, xsolv)
    np.testing.assert_allclose(kg, xg, atol=5e-2)


def test_parity_subpixel_and_oscillation():
    """Sub-pixel shifts with added noise (exercises many GN iterations and
    the oscillation damping); positions agree within MXU-exactness tolerance."""
    rng = np.random.default_rng(5)
    n, r = 32, 88
    tpl = _textured_region(rng, n, r)
    dx = rng.integers(-3, 4, n)
    dy = rng.integers(-3, 4, n)
    it = _shifted(tpl, dx, dy) + rng.normal(size=(n, r, r)).astype(np.float32) * 2.0

    tpl_pos = np.full((n, 2), (r - WIN) / 2.0, np.float32)
    guess = (np.full((n, 2), 300.0)
             + rng.uniform(-0.45, 0.45, (n, 2))).astype(np.float32)
    goff = (tpl_pos - guess).astype(np.float32)
    active = np.ones(n, bool)

    kg, ksolv, xg, xsolv = _run_both(tpl, it, tpl_pos, guess, goff, active,
                                     max_iters=30)
    np.testing.assert_array_equal(ksolv, xsolv)
    moved = np.linalg.norm(xg - guess, axis=1) > 0.5
    assert moved.sum() >= n // 2  # the test exercised real iteration work
    np.testing.assert_allclose(kg, xg, atol=1e-1)


def test_parity_iteration_cap():
    """max_iters=2 stops both paths at the same (unconverged) positions —
    pins the shared-iteration-counter semantics under the unroll."""
    rng = np.random.default_rng(6)
    n, r = 8, 88
    tpl = _textured_region(rng, n, r)
    it = _shifted(tpl, np.full(n, 5), np.full(n, -4))
    tpl_pos = np.full((n, 2), (r - WIN) / 2.0, np.float32)
    guess = np.full((n, 2), 120.0, np.float32)
    goff = (tpl_pos - guess).astype(np.float32)
    active = np.ones(n, bool)

    kg, ksolv, xg, xsolv = _run_both(tpl, it, tpl_pos, guess, goff, active,
                                     max_iters=2)
    np.testing.assert_array_equal(ksolv, xsolv)
    np.testing.assert_allclose(kg, xg, atol=5e-2)
