from stereo_vo_tpu.parallel.mesh import make_mesh
from stereo_vo_tpu.parallel.sharded_ba import (
    sharded_bundle_adjust,
    window_to_landmark_major,
)

__all__ = ["make_mesh", "sharded_bundle_adjust", "window_to_landmark_major"]
