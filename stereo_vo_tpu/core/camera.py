"""Pinhole stereo camera model.

Mirrors the reference's ``CameraInfo`` POD (``camera_info.hpp:4-18``): focal
length, principal point, four distortion coefficients, and stereo baseline.
The distortion fields are carried for config parity but are **dead** in the
reference too — every call site passes zeros (``image_processor.cpp:79``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraInfo:
    """Static (hashable) camera parameters — safe to close over in jitted code."""

    focal: float
    cx: float
    cy: float
    baseline: float
    # Dead in the reference (camera_info.hpp:10-14, zeros at image_processor.cpp:79);
    # kept for config parity.
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    def intrinsic_matrix(self, dtype=jnp.float32) -> jnp.ndarray:
        """3x3 camera matrix K (reference vo_node.cpp:104-108)."""
        return jnp.array(
            [[self.focal, 0.0, self.cx],
             [0.0, self.focal, self.cy],
             [0.0, 0.0, 1.0]],
            dtype=dtype,
        )

    def projection_2x3(self, dtype=jnp.float32) -> jnp.ndarray:
        """The 2x3 K used by the reprojection residual (reprojection_factor.cpp:5-6)."""
        return jnp.array(
            [[self.focal, 0.0, self.cx],
             [0.0, self.focal, self.cy]],
            dtype=dtype,
        )

    def reprojection_q(self, dtype=jnp.float32) -> jnp.ndarray:
        """4x4 disparity-to-depth matrix Q (reference image_processor.cpp:182-189).

        ``[X Y Z W]^T = Q @ [u v d 1]^T`` with
        ``X=(u-cx)/f, Y=(v-cy)/f, Z=1, W=d/(b f)`` so the dehomogenized point is
        ``(b/d) * [(u-cx), (v-cy), f]``.
        """
        f, cx, cy, b = self.focal, self.cx, self.cy, self.baseline
        return jnp.array(
            [[1.0 / f, 0.0, 0.0, -cx / f],
             [0.0, 1.0 / f, 0.0, -cy / f],
             [0.0, 0.0, 0.0, 1.0],
             [0.0, 0.0, 1.0 / (b * f), 0.0]],
            dtype=dtype,
        )

    def project(self, p_cam: jnp.ndarray) -> jnp.ndarray:
        """Project ``[..., 3]`` camera-frame points to ``[..., 2]`` pixels."""
        z = p_cam[..., 2:3]
        uv = p_cam[..., 0:2] / z
        return uv * self.focal + jnp.array([self.cx, self.cy], dtype=p_cam.dtype)

    def back_project(self, uv: jnp.ndarray, disparity: jnp.ndarray) -> jnp.ndarray:
        """``[..., 2]`` pixels + ``[...]`` disparity -> ``[..., 3]`` camera-frame points.

        Equivalent to dehomogenizing ``Q @ [u, v, d, 1]``
        (reference image_processor.cpp:191-207).
        """
        d = disparity[..., None]
        z = self.focal * self.baseline / d
        x = (uv[..., 0:1] - self.cx) / self.focal * z
        y = (uv[..., 1:2] - self.cy) / self.focal * z
        return jnp.concatenate([x, y, z], axis=-1)
