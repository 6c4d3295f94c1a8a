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

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from stereo_vo_tpu.core.config import FrontendConfig
from stereo_vo_tpu.ops.lk import lk_track_fwdbwd, lk_track_pyramid


class TrackerState(NamedTuple):
    pyramid: Tuple[jnp.ndarray, ...]  # last image pyramid (level 0..L)
    feat_xy: jnp.ndarray              # [F, 2] current positions
    feat_ids: jnp.ndarray             # [F] landmark ids
    feat_valid: jnp.ndarray           # [F]
    init_xy: jnp.ndarray              # [F, 2] positions at keyframe init
    init_count: jnp.ndarray           # [] int32 — feature count at init


class TrackStats(NamedTuple):
    av_parallax: jnp.ndarray   # [] float
    percent_lost: jnp.ndarray  # [] float
    num_tracked: jnp.ndarray   # [] int32


def tracker_init(
    pyramid: Tuple[jnp.ndarray, ...],
    xy: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
) -> TrackerState:
    """Snapshot the feature set on a new keyframe (``FeatureTracker::init``)."""
    return TrackerState(
        pyramid=tuple(pyramid),
        feat_xy=xy,
        feat_ids=ids,
        feat_valid=valid,
        init_xy=xy,
        init_count=jnp.sum(valid.astype(jnp.int32)),
    )


def track_step(
    state: TrackerState,
    new_pyramid: Tuple[jnp.ndarray, ...],
    cfg: FrontendConfig,
    flow_back: bool = True,
) -> Tuple[TrackerState, TrackStats]:
    """One tracking update (``FeatureTracker::track_features``)."""
    if flow_back:
        fwd_xy, fwd_ok, bwd_xy, bwd_ok = lk_track_fwdbwd(
            list(state.pyramid), list(new_pyramid), state.feat_xy,
            state.feat_valid, window=cfg.lk_window, max_iters=cfg.lk_iters,
            eps=cfg.lk_eps, min_eig_threshold=cfg.lk_min_eig,
            bwd_levels=getattr(cfg, "lk_bwd_levels", 0),
        )
        roundtrip = jnp.linalg.norm(state.feat_xy - bwd_xy, axis=1)
        ok = fwd_ok & bwd_ok & (roundtrip < cfg.fb_thresh)
    else:
        fwd_xy, fwd_ok = lk_track_pyramid(
            list(state.pyramid), list(new_pyramid), state.feat_xy,
            state.feat_valid, window=cfg.lk_window, max_iters=cfg.lk_iters,
            eps=cfg.lk_eps, min_eig_threshold=cfg.lk_min_eig,
        )
        ok = fwd_ok

    parallax = jnp.linalg.norm(fwd_xy - state.init_xy, axis=1)
    ok = ok & (parallax <= cfg.max_parallax)

    kept = jnp.sum(ok.astype(jnp.int32))
    av_parallax = jnp.sum(jnp.where(ok, parallax, 0.0)) / jnp.maximum(kept, 1)
    percent_lost = 1.0 - kept.astype(jnp.float32) / jnp.maximum(
        state.init_count, 1
    ).astype(jnp.float32)

    new_state = state._replace(
        pyramid=tuple(new_pyramid),
        feat_xy=jnp.where(ok[:, None], fwd_xy, state.feat_xy),
        feat_valid=ok,
    )
    return new_state, TrackStats(
        av_parallax=av_parallax, percent_lost=percent_lost, num_tracked=kept
    )
