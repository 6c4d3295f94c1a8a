"""Shi-Tomasi corner detection (goodFeaturesToTrack equivalent).

Replaces ``cv::goodFeaturesToTrack(image, 300, 0.1, 30)``
(reference ``image_processor.cpp:22``, constants ``vo_node.cpp:33-34``) with a
fully vectorized, fixed-output-shape device op:

1. min-eigenvalue corner response: Sobel gradients, 3x3 box-summed structure
   tensor, ``lambda_min = ((a+c) - sqrt((a-c)^2 + 4 b^2)) / 2``;
2. quality gate at ``quality_level * max(response)``;
3. min-distance enforcement as a sliding-window max filter: a corner survives
   iff it is the strongest response within ``min_distance`` — a deliberate,
   TPU-friendly re-design of OpenCV's sequential greedy suppression (the
   surviving set is pairwise >= min_distance apart like the reference's, but
   chains of mutually-suppressed corners resolve slightly more conservatively);
4. top-``max_corners`` by response into a fixed ``[K, 2]`` slot array + mask.

Everything is one jittable function of static shapes — no host round-trips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stereo_vo_tpu.ops.filters import box_filter, max_filter, sobel_x, sobel_y


def min_eig_response(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Per-pixel Shi-Tomasi response (cv::cornerMinEigenVal, relative scale).

    Absolute scaling differs from OpenCV by a constant factor; the detector
    only uses the response relative to its global max, so the constant cancels
    (quality gate is ``quality * max``).
    """
    img = img.astype(jnp.float32)
    ix = sobel_x(img)
    iy = sobel_y(img)
    r = block_size // 2
    a = box_filter(ix * ix, r)
    b = box_filter(ix * iy, r)
    c = box_filter(iy * iy, r)
    return ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b)) * 0.5


def detect_corners(
    img: jnp.ndarray,
    max_corners: int = 300,
    quality_level: float = 0.1,
    min_distance: float = 30.0,
    block_size: int = 3,
    border: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect corners; returns ``(xy [K, 2] float32, response [K], valid [K])``.

    ``border`` pixels at the image edge are excluded, mirroring OpenCV's
    implicit exclusion of the derivative border.
    """
    h, w = img.shape
    resp = min_eig_response(img, block_size)

    # exclude the border band
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    resp = jnp.where(inside, resp, 0.0)

    maxval = jnp.max(resp)
    thresh = maxval * quality_level

    # min-distance NMS: survivor iff local max within radius min_distance.
    # Tie-break plateaus by a tiny index-dependent jitter so two equal maxima
    # within one window can't both survive.
    tie = (
        (ys * w + xs).astype(jnp.float32)
        * (jnp.finfo(jnp.float32).eps * 8.0)
        * jnp.maximum(maxval, 1e-30)
    )
    resp_t = resp - tie
    radius = max(int(min_distance), 1)
    localmax = max_filter(resp_t, radius)
    is_corner = (resp_t >= localmax) & (resp >= thresh) & (resp > 0)

    flat = jnp.where(is_corner, resp, -1.0).reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    valid = vals > 0
    y = (idx // w).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    xy = jnp.stack([x, y], axis=-1)
    return xy, vals, valid
