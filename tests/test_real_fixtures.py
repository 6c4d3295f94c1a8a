"""Real-imagery readiness: photographic-texture fixtures through the native
decoder and the full device pipeline.

The checked-in fixtures (``tests/fixtures/real``) are KITTI-resolution stereo
pairs rendered with a real photograph as scene texture (see
``make_real_fixtures.py``) — natural image statistics, exact ground truth.
These tests are the dataset-free stand-in for the reference's KITTI replay
validation loop (``/root/reference/README.md:6-8``, ``src/kitti_node.cpp:56-76``).
"""

import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "real")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(FIXDIR, "image_0")),
    reason="real fixtures not generated",
)


def _load(i, side=0):
    from PIL import Image

    p = os.path.join(FIXDIR, f"image_{side}", f"{i:06d}.png")
    return np.asarray(Image.open(p))


def test_native_decoder_matches_pil():
    from stereo_vo_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native IO library unavailable")
    for i in (0, 2):
        for side in (0, 1):
            path = os.path.join(FIXDIR, f"image_{side}", f"{i:06d}.png")
            img = native_loader.read_png_gray(path)
            assert img is not None
            np.testing.assert_array_equal(img, _load(i, side))


def test_detection_on_real_imagery():
    import jax.numpy as jnp

    from stereo_vo_tpu.ops.shi_tomasi import detect_corners

    xy, resp, valid = detect_corners(jnp.asarray(_load(0), jnp.float32),
                                     max_corners=300, quality_level=0.1,
                                     min_distance=30.0)
    n = int(np.sum(np.asarray(valid)))
    assert n >= 100, f"only {n} corners on photographic content"
    # survivors are pairwise >= min_distance apart (greedy NMS contract)
    pts = np.asarray(xy)[np.asarray(valid)]
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 30.0 - 1e-3


def test_lk_parity_on_real_imagery():
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp

    from stereo_vo_tpu.ops.lk import lk_track_fwdbwd
    from stereo_vo_tpu.ops.pyramid import build_pyramid

    prev, cur = _load(0), _load(1)
    corners = cv2.goodFeaturesToTrack(prev, 128, 0.1, 30).reshape(-1, 2)
    n = len(corners)
    pad = 128 - (n % 128) if n % 128 else 0
    pts = np.concatenate([corners, np.tile(corners[:1], (pad, 1))], axis=0)
    valid = np.arange(len(pts)) < n

    pyr1 = build_pyramid(jnp.asarray(prev, jnp.float32), 3)
    pyr2 = build_pyramid(jnp.asarray(cur, jnp.float32), 3)
    tracked, ok, back, bok = lk_track_fwdbwd(
        list(pyr1), list(pyr2), jnp.asarray(pts, jnp.float32),
        jnp.asarray(valid), window=21, max_iters=30,
    )
    tracked, ok = np.asarray(tracked), np.asarray(ok)
    rt = np.linalg.norm(pts - np.asarray(back), axis=1)
    ours_ok = ok & np.asarray(bok) & (rt < 2.0) & valid

    fwd, st, _ = cv2.calcOpticalFlowPyrLK(
        prev, cur, corners.reshape(-1, 1, 2).astype(np.float32), None,
        winSize=(21, 21), maxLevel=3,
    )
    cv_bwd, st2, _ = cv2.calcOpticalFlowPyrLK(
        cur, prev, fwd, None, winSize=(21, 21), maxLevel=3,
    )
    fwd = fwd.reshape(-1, 2)
    # like-for-like: OpenCV with the same forward-backward gate the pipeline
    # applies (the fixtures' tiled photographic texture is genuinely ambiguous
    # for a fraction of corners — OpenCV itself keeps only ~55% here)
    cv_rt = np.linalg.norm(corners - cv_bwd.reshape(-1, 2), axis=1)
    cv_ok = (st.ravel() == 1) & (st2.ravel() == 1) & (cv_rt < 2.0)

    assert ours_ok[:n].sum() >= 0.8 * cv_ok.sum(), (
        f"kept {ours_ok[:n].sum()} vs OpenCV's fb-gated {cv_ok.sum()}"
    )
    both = ours_ok[:n] & cv_ok
    assert both.sum() >= 0.5 * cv_ok.sum()
    err = np.linalg.norm(tracked[:n][both] - fwd[both], axis=1)
    assert np.median(err) < 0.5, f"median LK disagreement {np.median(err):.2f} px"


def test_stereo_bm_on_real_imagery():
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp

    from stereo_vo_tpu.ops.stereo_bm import stereo_bm_disparity

    left, right = _load(1, 0), _load(1, 1)
    ours = np.asarray(
        stereo_bm_disparity(jnp.asarray(left, jnp.float32),
                            jnp.asarray(right, jnp.float32))
    )
    ref = cv2.StereoBM.create(48, 21).compute(left, right).astype(np.float32) / 16.0
    both = (ours > 0) & (ref > 0)
    assert both.mean() > 0.2, "too few commonly-valid disparities on real imagery"
    diff = np.abs(ours[both] - ref[both])
    assert np.median(diff) <= 0.5, f"median disparity gap {np.median(diff):.2f}"


def test_full_pipeline_on_real_fixtures(tmp_path):
    from stereo_vo_tpu.core.config import load_config
    from stereo_vo_tpu.data.kitti import KittiSequence
    from stereo_vo_tpu.engine.driver import run_vo

    cfg = load_config("kitti00")
    seq = KittiSequence(os.path.dirname(FIXDIR), "real")
    run = run_vo(iter(seq), cfg, out_dir=str(tmp_path), save_world_points=True)
    assert len(run.poses) == 5
    kf = [s["is_keyframe"] for s in run.frame_stats]
    assert kf[0], "bootstrap keyframe missing"
    assert all(np.isfinite(run.poses).reshape(-1))
    tracked = [s["num_tracked"] for s in run.frame_stats[1:]]
    # the tiled photographic texture is deliberately ambiguous (repeating
    # patterns), so attrition is high — but the pipeline must keep a usable
    # track set, keep PnP healthy, and stay metrically sane
    assert min(tracked) >= 20, f"tracking collapsed on real imagery: {tracked}"
    assert all(s["pnp_ok"] for s in run.frame_stats)
    assert run.ate is not None and run.ate["rmse"] < 2.5
    # world-points debug dump exists for the bootstrap keyframe
    dumps = os.listdir(os.path.join(str(tmp_path), "world_points"))
    assert dumps, "no world-points dumps written"
    first = np.loadtxt(
        os.path.join(str(tmp_path), "world_points", sorted(dumps)[0])
    )
    assert first.shape[0] >= 50 and first.shape[1] == 5
