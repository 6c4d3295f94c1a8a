"""Host driver loop.

The replacement for ``vo_node``'s main loop (``vo_node.cpp:139-227``): drains a
frame stream through the drop gate, runs the compiled bootstrap/step, and
collects poses + per-frame metrics. No ROS: outputs are in-memory arrays plus
optional trajectory files / JSONL metrics / feature-track debug images.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional

import numpy as np

from stereo_vo_tpu.core.config import PipelineConfig
from stereo_vo_tpu.data.stream import drop_gate
from stereo_vo_tpu.engine.metrics import MetricsLogger
from stereo_vo_tpu.engine.step import VOEngine


@dataclasses.dataclass
class VORun:
    poses: np.ndarray                 # [N, 7] published T_cw per processed frame
    gt_poses: Optional[np.ndarray]    # [N, 7] if the stream provides it
    frame_stats: List[dict]
    frames_per_sec: float
    ate: Optional[dict]
    engine: VOEngine
    state: object                     # final VOState


def run_vo(
    stream,
    config: PipelineConfig,
    out_dir: Optional[str] = None,
    max_frames: Optional[int] = None,
    apply_drop_gate: bool = False,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
    chunk_size: int = 0,
    progress: bool = False,
) -> VORun:
    """Run the full VO pipeline over a stereo stream.

    ``apply_drop_gate`` reproduces the reference's 0.05 s minimum inter-frame
    interval (``vo_node.cpp:124``); dataset replay at 11 Hz never triggers it.

    ``chunk_size > 1`` enables offline-replay mode: frames are batched and the
    whole chunk runs as one device program (``lax.scan``), amortizing per-call
    dispatch latency. Online/streaming use keeps ``chunk_size = 0`` (one call
    per frame, pose available immediately).
    """
    import jax

    it = iter(drop_gate(stream, config.runtime.drop_time) if apply_drop_gate else stream)

    first = next(it)
    engine = VOEngine(config, first.left.shape)

    if resume_from:
        from stereo_vo_tpu.engine.checkpoint import load_state

        state, start_idx = load_state(resume_from, engine)
    else:
        state = engine.init_state()
        start_idx = 0

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl")) if out_dir else None

    poses: List[np.ndarray] = []
    gts: List[Optional[np.ndarray]] = []
    stats: List[dict] = []

    from stereo_vo_tpu.engine.step import parse_summary

    n_done = 0
    t_start = None
    n_timed_from = 0
    frame = first

    def record(frame_index, pose, row, gt):
        nonlocal n_done
        row = {"frame": int(frame_index), **row}
        poses.append(np.asarray(pose))
        gts.append(gt)
        stats.append(row)
        if logger:
            logger.log(row)
        if progress and n_done % 20 == 0:
            print(
                f"[vo] frame {frame_index}: kf={row['is_keyframe']} "
                f"tracked={row['num_tracked']} inliers={row['num_inliers']}"
            )
        n_done += 1
        if checkpoint_every and out_dir and n_done % checkpoint_every == 0:
            from stereo_vo_tpu.engine.checkpoint import save_state

            save_state(os.path.join(out_dir, "checkpoint.npz"), state, frame_index + 1)

    pending_chunk: List = []

    def flush_chunk():
        nonlocal state, t_start, n_timed_from
        if not pending_chunk:
            return
        lefts = jax.numpy.asarray(np.stack([f.left for f in pending_chunk]))
        rights = jax.numpy.asarray(np.stack([f.right for f in pending_chunk]))
        state, ch_poses, ch_summaries = engine.replay_chunk(state, lefts, rights)
        first_flush = t_start is None
        ch_poses = np.asarray(ch_poses)
        ch_summaries = np.asarray(ch_summaries)
        if first_flush:
            # first chunk call compiled replay_chunk; time from here
            t_start = time.perf_counter()
            n_timed_from = n_done + len(pending_chunk)
        for f, pose, summ in zip(pending_chunk, ch_poses, ch_summaries):
            _, row = parse_summary(summ)
            record(f.index, pose, row, f.gt_pose)
        pending_chunk.clear()

    while True:
        if max_frames is not None and n_done + len(pending_chunk) >= max_frames:
            break
        if frame.index >= start_idx:
            initialized = bool(state.initialized)
            if chunk_size > 1 and initialized:
                pending_chunk.append(frame)
                if len(pending_chunk) >= chunk_size:
                    flush_chunk()
            else:
                left = jax.numpy.asarray(frame.left)
                right = jax.numpy.asarray(frame.right)
                fn = engine.step if initialized else engine.bootstrap
                state, out = fn(state, left, right)
                if t_start is None and initialized:
                    # this call compiled engine.step; start the clock after it
                    # so steady-state frames/s excludes compilation
                    out.pose_cw.block_until_ready()
                    t_start = time.perf_counter()
                    n_timed_from = n_done + 1
                pose, row = parse_summary(out.summary)
                record(frame.index, pose, row, frame.gt_pose)
        try:
            frame = next(it)
        except StopIteration:
            break
    flush_chunk()

    elapsed = time.perf_counter() - t_start if t_start else 0.0
    n_timed = max(n_done - (n_timed_from if t_start else 0), 0)
    fps = n_timed / elapsed if elapsed > 0 and n_timed > 0 else 0.0

    poses_arr = np.stack(poses) if poses else np.zeros((0, 7), np.float32)
    gt_arr = (
        np.stack([g for g in gts]) if gts and all(g is not None for g in gts) else None
    )

    ate = None
    if gt_arr is not None and len(poses_arr) >= 3:
        from stereo_vo_tpu.eval.ate import absolute_trajectory_error

        ate = absolute_trajectory_error(poses_arr, gt_arr, align=True)

    if out_dir:
        from stereo_vo_tpu.eval.trajectory import write_kitti_trajectory, write_tum_trajectory

        write_kitti_trajectory(os.path.join(out_dir, "trajectory_kitti.txt"), poses_arr)
        write_tum_trajectory(os.path.join(out_dir, "trajectory_tum.txt"), poses_arr)
        if logger:
            logger.close()

    return VORun(
        poses=poses_arr,
        gt_poses=gt_arr,
        frame_stats=stats,
        frames_per_sec=fps,
        ate=ate,
        engine=engine,
        state=state,
    )
