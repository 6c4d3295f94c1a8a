from stereo_vo_tpu.data.kitti import KittiSequence, kitti_replay
from stereo_vo_tpu.data.synthetic import SyntheticStereoSequence
from stereo_vo_tpu.data.stream import StereoFrame, StereoStream

__all__ = [
    "KittiSequence",
    "kitti_replay",
    "SyntheticStereoSequence",
    "StereoFrame",
    "StereoStream",
]
