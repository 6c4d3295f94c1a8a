"""Feature-tracker state machine.

The TPU re-design of ``FeatureTracker`` (``feature_tracker.cpp:3-91``): the
dynamic feature vectors and the id->initial-position map become fixed-capacity
masked arrays in a pytree, and both LK passes (forward + backward verification)
are batched device calls.

Semantics parity (``feature_tracker.cpp:18-67``):
- tracks from the *last* image to the current one every call, accumulating
  positions; parallax is measured against the feature's position at ``init``
  (the keyframe image);
- forward-backward gate: round trip must land within ``fb_thresh`` (2 px);
- tracks with parallax > ``max_parallax`` (200 px) are dropped;
- ``percent_lost = 1 - kept / init_count``.

Deliberate fix of reference quirk #2 (SURVEY.md §2): average parallax divides
by the number of *kept* features, not attempted ones (the reference divides by
attempted, biasing its keyframe gate low as features drop). Quirk #1 (the
out-of-bounds ``feature_ids`` read) has no analog here — ids ride along in the
same masked array.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stereo_vo_tpu.core.config import FrontendConfig
from stereo_vo_tpu.ops.lk import LK_SLACK, lk_track_fwdbwd, lk_track_pyramid

# sentinel for "no flow estimate yet" — always takes the full pyramid
_NO_FLOW = 1e9


class TrackerState(NamedTuple):
    pyramid: Tuple[jnp.ndarray, ...]  # last image pyramid (level 0..L)
    feat_xy: jnp.ndarray              # [F, 2] current positions
    feat_ids: jnp.ndarray             # [F] landmark ids
    feat_valid: jnp.ndarray           # [F]
    init_xy: jnp.ndarray              # [F, 2] positions at keyframe init
    init_count: jnp.ndarray           # [] int32 — feature count at init
    # [] float32 — largest kept per-feature displacement of the previous
    # step (px, level 0): the cruise-detector for the coarse-level skip
    # (config.lk_skip_top_flow_px). _NO_FLOW forces a full-pyramid pass.
    last_flow: jnp.ndarray


class TrackStats(NamedTuple):
    av_parallax: jnp.ndarray   # [] float
    percent_lost: jnp.ndarray  # [] float
    num_tracked: jnp.ndarray   # [] int32


def tracker_init(
    pyramid: Tuple[jnp.ndarray, ...],
    xy: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    last_flow: Optional[jnp.ndarray] = None,
) -> TrackerState:
    """Snapshot the feature set on a new keyframe (``FeatureTracker::init``).

    ``last_flow`` carries the previous step's flow estimate across the
    re-init (flow is a property of the frame pair, not the feature set);
    None means no estimate — the next step runs the full pyramid."""
    if last_flow is None:
        last_flow = jnp.array(_NO_FLOW, jnp.float32)
    return TrackerState(
        pyramid=tuple(pyramid),
        feat_xy=xy,
        feat_ids=ids,
        feat_valid=valid,
        init_xy=xy,
        init_count=jnp.sum(valid.astype(jnp.int32)),
        last_flow=last_flow,
    )


def track_step(
    state: TrackerState,
    new_pyramid: Tuple[jnp.ndarray, ...],
    cfg: FrontendConfig,
    flow_back: bool = True,
) -> Tuple[TrackerState, TrackStats]:
    """One tracking update (``FeatureTracker::track_features``)."""
    prev_pyr = list(state.pyramid)
    new_pyr = list(new_pyramid)
    kwargs = dict(
        window=cfg.lk_window, max_iters=cfg.lk_iters, eps=cfg.lk_eps,
        min_eig_threshold=cfg.lk_min_eig,
    )
    if flow_back:
        kwargs["bwd_levels"] = getattr(cfg, "lk_bwd_levels", 0)
        skip_thresh = getattr(cfg, "lk_skip_top_flow_px", 0.0)
        if skip_thresh > 0 and len(prev_pyr) > 2:
            # cruise-frame coarse-level skip (see config.lk_skip_top_flow_px):
            # small measured flow -> drop the coarsest level and run slack-10
            # regions on the new top. lax.cond executes ONE branch per frame.
            def full(_):
                return lk_track_fwdbwd(
                    prev_pyr, new_pyr, state.feat_xy, state.feat_valid, **kwargs
                )

            def skip(_):
                return lk_track_fwdbwd(
                    prev_pyr[:-1], new_pyr[:-1], state.feat_xy,
                    state.feat_valid, slack_top=LK_SLACK, **kwargs
                )

            fwd_xy, fwd_ok, bwd_xy, bwd_ok = jax.lax.cond(
                state.last_flow < skip_thresh, skip, full, None
            )
        else:
            fwd_xy, fwd_ok, bwd_xy, bwd_ok = lk_track_fwdbwd(
                prev_pyr, new_pyr, state.feat_xy, state.feat_valid, **kwargs
            )
        roundtrip = jnp.linalg.norm(state.feat_xy - bwd_xy, axis=1)
        ok = fwd_ok & bwd_ok & (roundtrip < cfg.fb_thresh)
    else:
        fwd_xy, fwd_ok = lk_track_pyramid(
            prev_pyr, new_pyr, state.feat_xy, state.feat_valid, **kwargs
        )
        ok = fwd_ok

    parallax = jnp.linalg.norm(fwd_xy - state.init_xy, axis=1)
    ok = ok & (parallax <= cfg.max_parallax)

    kept = jnp.sum(ok.astype(jnp.int32))
    av_parallax = jnp.sum(jnp.where(ok, parallax, 0.0)) / jnp.maximum(kept, 1)
    percent_lost = 1.0 - kept.astype(jnp.float32) / jnp.maximum(
        state.init_count, 1
    ).astype(jnp.float32)

    # flow estimate for the next step's skip decision: largest KEPT
    # displacement. Distrust it (force full pyramid next frame) when this
    # step kept nothing or killed >15% of its features — either could mean
    # motion out-ran a skipped pass rather than genuine occlusion/drift.
    step_disp = jnp.linalg.norm(fwd_xy - state.feat_xy, axis=1)
    max_flow = jnp.max(jnp.where(ok, step_disp, 0.0))
    n_prev = jnp.sum(state.feat_valid.astype(jnp.int32))
    step_loss = 1.0 - kept.astype(jnp.float32) / jnp.maximum(n_prev, 1)
    last_flow = jnp.where(
        (kept == 0) | (step_loss > 0.15), jnp.float32(_NO_FLOW), max_flow
    )

    new_state = state._replace(
        pyramid=tuple(new_pyramid),
        feat_xy=jnp.where(ok[:, None], fwd_xy, state.feat_xy),
        feat_valid=ok,
        last_flow=last_flow,
    )
    return new_state, TrackStats(
        av_parallax=av_parallax, percent_lost=percent_lost, num_tracked=kept
    )
