from stereo_vo_tpu.frontend.triangulate import triangulate_features
from stereo_vo_tpu.frontend.pnp import pnp_ransac
from stereo_vo_tpu.frontend.track import TrackerState, tracker_init, track_step
from stereo_vo_tpu.frontend.detect import detect_features, dedup_new_features

__all__ = [
    "triangulate_features",
    "pnp_ransac",
    "TrackerState",
    "tracker_init",
    "track_step",
    "detect_features",
    "dedup_new_features",
]
