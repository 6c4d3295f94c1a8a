"""Two-phase batched multi-sequence mode == per-sequence replay.

The batched step replaces per-sequence ``lax.cond``s with scalar-predicate
phases + masked selects (``VOEngine._step_batched``); these tests pin the
contract that this is a pure throughput transformation: every sequence's
trajectory, keyframe schedule and stats match a solo replay.
"""

import numpy as np
import pytest


def _worlds(n_seq, n_frames):
    from stereo_vo_tpu.core.camera import CameraInfo
    from stereo_vo_tpu.core.config import PipelineConfig
    from stereo_vo_tpu.data.synthetic import SyntheticStereoSequence

    cam = CameraInfo(focal=120.0, cx=80.0, cy=60.0, baseline=0.3)
    cfg = PipelineConfig(camera=cam)
    worlds = [
        SyntheticStereoSequence(
            cam=cam, n_frames=n_frames, shape=(120, 160), n_points=400,
            seed=10 + i, speed=0.35, yaw_rate=0.004,
        )
        for i in range(n_seq)
    ]
    return cfg, worlds


def test_batched_equals_single():
    from stereo_vo_tpu.engine.driver import run_vo, run_vo_batched

    cfg, worlds = _worlds(3, 17)
    solo = [run_vo(iter(w), cfg, chunk_size=4) for w in worlds]
    batched, agg = run_vo_batched([iter(w) for w in worlds], cfg, chunk_size=4)

    assert len(batched) == 3
    for s, bt in zip(solo, batched):
        assert len(s.poses) == len(bt.poses)
        kf_s = [r["is_keyframe"] for r in s.frame_stats]
        kf_b = [r["is_keyframe"] for r in bt.frame_stats]
        assert kf_s == kf_b, "keyframe schedule diverged in batched mode"
        np.testing.assert_allclose(bt.poses, s.poses, atol=2e-3)
        tr_s = [r["num_tracked"] for r in s.frame_stats]
        tr_b = [r["num_tracked"] for r in bt.frame_stats]
        assert tr_s == tr_b
