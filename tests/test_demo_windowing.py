"""Sliding-window plan semantics for expert-demo generation.

Mirrors the reference's clip -> iteration -> window loops
(envs/rllib_env_imitation.py:72-138): window k of a clip starts at
max(0, (k+1)*stride - window_size), a clip of length L gets
max(1, floor(L/stride)) windows, and the per-window step budget respects
both the window size and the clip end minus the last sensor lookahead.
"""
import numpy as np

from physicsvae_tpu.train.demo_gen import DemoGenConfig, plan_lanes

FPS = 30.0
LOOKAHEAD = 0.15


def _plan(lengths, clips, **kw):
    cfg = DemoGenConfig(**kw)
    return plan_lanes(np.asarray(lengths, np.float64), clips, cfg, FPS,
                      LOOKAHEAD)


def test_short_clip_single_window():
    # 60 s clip under the 1000 s default window: exactly one window per
    # iteration, starting at t=0 (the loco regime).
    clip, start, budget = _plan([60.0], [0], iter_per_episode=3)
    assert len(clip) == 3
    assert np.all(start == 0.0)
    assert np.all(budget == int(np.floor((60.0 - LOOKAHEAD) * FPS)))


def test_long_clip_window_count_and_starts():
    # 250 s clip, window = stride = 60 s: floor(250/60) = 4 windows at
    # 0, 60, 120, 180 s (reference breaks when L < time_start + stride).
    clip, start, budget = _plan([250.0], [0], iter_per_episode=1,
                                window_size=60.0, stride=60.0)
    assert len(clip) == 4
    np.testing.assert_allclose(start, [0.0, 60.0, 120.0, 180.0])
    # interior windows are budget-limited by the window size...
    assert budget[0] == int(np.ceil(60.0 * FPS))
    # ...and the last window still fits inside the clip
    assert budget[-1] == int(np.ceil(60.0 * FPS))


def test_clip_end_cutoff_limits_last_window():
    # 100 s clip, 60 s windows: window 1 starts at 60 s and only has
    # ~40 s of clip (minus lookahead) left.
    clip, start, budget = _plan([100.0], [0], iter_per_episode=1,
                                window_size=60.0, stride=60.0)
    assert len(clip) == 1  # floor(100/60) = 1 window
    assert start[0] == 0.0

    # 120 s clip: window 1 has 60 s of clip left but loses the lookahead
    # slack, so the clip-end cutoff (not the window size) limits it.
    clip, start, budget = _plan([120.0], [0], iter_per_episode=1,
                                window_size=60.0, stride=60.0)
    assert len(clip) == 2
    assert start[1] == 60.0
    assert budget[1] == int(np.floor((120.0 - LOOKAHEAD) * FPS)) - int(
        60.0 * FPS)
    assert budget[1] < int(np.ceil(60.0 * FPS))


def test_overlapping_windows_when_stride_lt_window():
    # window 100 s, stride 50 s: time_start starts at -50 s so window 0 is
    # effectively 50 s at t=0; window 1 starts at 0 with the full budget;
    # window 2 starts at 50 s.
    clip, start, budget = _plan([200.0], [0], iter_per_episode=1,
                                window_size=100.0, stride=50.0)
    assert len(clip) == 4  # floor(200/50)
    np.testing.assert_allclose(start, [0.0, 0.0, 50.0, 100.0])
    assert budget[0] == int(np.ceil(50.0 * FPS))
    assert budget[1] == int(np.ceil(100.0 * FPS))


def test_knobs_change_output():
    # The r2 VERDICT flagged window_size/stride as dead knobs: assert the
    # plan actually responds to them.
    a = _plan([300.0], [0], iter_per_episode=1, window_size=60.0,
              stride=60.0)
    b = _plan([300.0], [0], iter_per_episode=1, window_size=30.0,
              stride=30.0)
    assert len(a[0]) == 5 and len(b[0]) == 10


def test_lane_order_is_clip_iter_window():
    clip, start, _ = _plan([130.0, 130.0], [0, 1], iter_per_episode=2,
                           window_size=60.0, stride=60.0)
    # clip-major, then iteration, then window
    np.testing.assert_array_equal(clip, [0, 0, 0, 0, 1, 1, 1, 1])
    np.testing.assert_allclose(start, [0, 60, 0, 60, 0, 60, 0, 60])


def test_fallen_windows_dropped_entirely():
    """Reference parity (rllib_env_imitation.py:124-138): a window still
    fallen after max_retries contributes NO episode, even if it has a
    long pre-fall prefix."""
    import numpy as np
    from physicsvae_tpu.train.demo_gen import collect_episodes, _EP_KEYS

    T, B = 30, 3
    traj = {k: np.arange(T * B, dtype=np.float32).reshape(T, B)
            for k in _EP_KEYS}
    valid = np.asarray([25, 30, 0])
    fell = np.asarray([True, False, False])  # lane 0: long prefix, fell
    eps = collect_episodes(traj, valid, fell)
    assert len(eps) == 1           # lane 0 dropped (fell), lane 2 empty
    assert len(eps[0]["time"]) == 30
