"""60-second device smoke gate: ``python -m stereo_vo_tpu.smoke``.

The mandatory pre-snapshot check (NOTES.md "snapshot gate"): compiles and runs
the REAL hot paths on whatever backend JAX selected (TPU when attached) —
bootstrap, three streamed steps, and one chunked-replay chunk — then prints
one PASS/FAIL line. This exists because a green CPU test suite does not
execute the compiled TPU kernels (the round-2 regression: a default-on Pallas
kernel that crashed Mosaic shipped with every CPU test green).

Exit code 0 on pass, 1 on fail. ~15 s with a warm compile cache.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    t0 = time.time()
    import jax
    import numpy as np

    from stereo_vo_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    backend = jax.default_backend()

    from stereo_vo_tpu.core.config import load_config
    from stereo_vo_tpu.data.synthetic import SyntheticStereoSequence
    from stereo_vo_tpu.engine.driver import run_vo
    from stereo_vo_tpu.engine.step import VOEngine

    cfg = load_config("kitti00")
    world = SyntheticStereoSequence(
        cam=cfg.camera, n_frames=20, shape=(376, 1241), n_points=3000,
        seed=0, speed=0.8, yaw_rate=0.003,
    )
    frames = list(world)

    # 1) streamed path: bootstrap + 3 steps (vo_node.cpp:139-227 analog)
    engine = VOEngine(cfg, frames[0].left.shape)
    state = engine.init_state()
    state, _ = engine.bootstrap(
        state, jax.numpy.asarray(frames[0].left), jax.numpy.asarray(frames[0].right)
    )
    for f in frames[1:4]:
        state, out = engine.step(
            state, jax.numpy.asarray(f.left), jax.numpy.asarray(f.right)
        )
        np.asarray(out.summary)

    # 2) chunked replay: one 16-frame chunk (the bench path)
    run = run_vo(iter(frames[:17]), cfg, chunk_size=16)
    n = len(run.poses)
    finite = bool(np.isfinite(run.poses).all())
    kf = sum(1 for s in run.frame_stats if s["is_keyframe"])
    ok = n == 17 and finite and kf >= 1

    dt = time.time() - t0
    status = "PASS" if ok else "FAIL"
    print(
        f"[smoke] {status} backend={backend} frames={n} keyframes={kf} "
        f"finite={finite} wall={dt:.1f}s"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
