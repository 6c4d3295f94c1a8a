#!/usr/bin/env python
"""Multi-seed accuracy A/B sweep on the photo-textured world.

The tool behind default-tuning decisions (NOTES.md round-3/4 ledgers): runs
the full pipeline over N seeds of the 160-frame photo-textured sequence (the
representative regime — natural image statistics, the stand-in for real KITTI,
see tests/test_long_sequence.py) for a baseline config and optionally an
override arm, and prints per-seed + mean ATE for each, plus the OpenCV
full-pipeline twin on the identical frames as the parity anchor.

Single-run ATE is chaotic (keyframe cascades amplify sub-pixel differences —
NOTES.md); defaults change only on multi-seed means.

Usage:
  python benchmarks/accuracy_sweep.py --seeds 10 \
      --ab frontend.lk_hint_pred_err_px=0   # arm B: hint disabled
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures"))

N_FRAMES = 161


def parse_override(spec: str):
    """'frontend.lk_hint_pred_err_px=0' -> nested dict {'frontend': {...: 0.0}}."""
    key, _, val = spec.partition("=")
    parts = key.split(".")
    try:
        v = json.loads(val)
    except json.JSONDecodeError:
        v = val
    d: dict = {parts[-1]: v}
    for p in reversed(parts[:-1]):
        d = {p: d}
    return d


def deep_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        out[k] = deep_merge(out[k], v) if isinstance(out.get(k), dict) and isinstance(v, dict) else v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--frames", type=int, default=N_FRAMES)
    ap.add_argument("--ab", action="append", default=[],
                    help="override spec for arm B (repeatable); omit for baseline-only")
    ap.add_argument("--base", action="append", default=[],
                    help="override spec applied to BOTH arms")
    ap.add_argument("--no-twin", action="store_true")
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    from stereo_vo_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    import numpy as np

    from make_real_fixtures import load_photo
    from stereo_vo_tpu.core.config import load_config
    from stereo_vo_tpu.data.synthetic import SyntheticStereoSequence
    from stereo_vo_tpu.engine.driver import run_vo
    from stereo_vo_tpu.eval.ate import absolute_trajectory_error

    base_over: dict = {}
    for s in args.base:
        base_over = deep_merge(base_over, parse_override(s))
    ab_over = dict(base_over)
    for s in args.ab:
        ab_over = deep_merge(ab_over, parse_override(s))

    cfg_a = load_config("kitti00", overrides=base_over or None)
    cfg_b = load_config("kitti00", overrides=ab_over) if args.ab else None

    tex = load_photo()
    seeds = [11, 23, 5, 7, 13, 17, 19, 29, 31, 37][: args.seeds]

    res = {"A": [], "B": [], "twin": []}
    kfs = {"A": [], "B": []}
    for seed in seeds:
        world = SyntheticStereoSequence(
            cam=cfg_a.camera, n_frames=args.frames, shape=(376, 1241),
            n_points=3000, seed=seed, speed=0.9, yaw_rate=0.004, texture=tex,
        )
        frames = list(world)
        gt = world.gt_poses

        def run_arm(cfg):
            run = run_vo(iter(frames), cfg, chunk_size=args.chunk,
                         preload_device=True)
            g = gt[: len(run.poses)]
            ate = absolute_trajectory_error(run.poses, g)["rmse"]
            kf = sum(1 for s_ in run.frame_stats if s_["is_keyframe"])
            return float(ate), kf

        a, kf_a = run_arm(cfg_a)
        res["A"].append(a)
        kfs["A"].append(kf_a)
        line = f"seed {seed:3d}  A: {a:6.2f} m ({kf_a} kf)"
        if cfg_b is not None:
            b, kf_b = run_arm(cfg_b)
            res["B"].append(b)
            kfs["B"].append(kf_b)
            line += f"   B: {b:6.2f} m ({kf_b} kf)"
        if not args.no_twin:
            try:
                from stereo_vo_tpu.eval.cv_twin import run_cv_twin

                tp, _, _ = run_cv_twin(iter(frames), cfg_a.camera, cfg_a.frontend)
                tw = absolute_trajectory_error(tp[: len(gt)], gt[: len(tp)])["rmse"]
                res["twin"].append(float(tw))
                line += f"   twin: {tw:6.2f} m"
            except ImportError:
                pass
        print(line, flush=True)

    def stats(xs):
        if not xs:
            return None
        return {"mean": round(float(np.mean(xs)), 3),
                "median": round(float(np.median(xs)), 3),
                "worst": round(float(np.max(xs)), 3),
                "per_seed": [round(x, 3) for x in xs]}

    out = {"seeds": seeds, "frames": args.frames,
           "base_overrides": base_over, "ab_overrides": ab_over if args.ab else None,
           "A": stats(res["A"]), "B": stats(res["B"]), "twin": stats(res["twin"])}
    if res["twin"]:
        out["A_vs_twin_mean_ratio"] = round(
            float(np.mean([a / t for a, t in zip(res["A"], res["twin"])])), 3)
        if res["B"]:
            out["B_vs_twin_mean_ratio"] = round(
                float(np.mean([b / t for b, t in zip(res["B"], res["twin"])])), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
