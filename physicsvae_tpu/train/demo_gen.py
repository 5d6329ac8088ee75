"""Expert-demonstration generation — the dataset factory.

Re-build of gen_state_action_pairs (envs/rllib_env_imitation.py:38-145) with
the same sliding-window semantics — window k of a clip starts at
max(0, (k+1)*stride - window_size); a clip of length L gets
max(1, floor(L/stride)) windows; each window rolls until its window budget,
the clip end minus the last sensor lookahead, or a falldown; falldown windows
are regenerated with fresh RNG up to max_retries then dropped — but vmapped:
every (clip, iteration, window) lane rolls out simultaneously on device, and
retries re-roll ONLY the failed lanes (padded to a small power-of-two batch),
not the whole grid.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.imitation import ImitationEnv
from .dataset import save_demo_dataset


@dataclasses.dataclass
class DemoGenConfig:
    iter_per_episode: int = 10
    window_size: float = 1000.0
    stride: float = 1000.0
    state_type: str = "facing_R6_h"
    exp_std: float = 0.05
    max_retries: int = 10


def plan_lanes(lengths, clips, cfg: DemoGenConfig, fps_con: float,
               lookahead_slack: float):
    """Flatten the reference's clip -> iteration -> sliding-window loops
    (envs/rllib_env_imitation.py:72-90) into lane arrays.

    Returns (clip_id, start_time, budget_steps) numpy arrays, one entry per
    lane, ordered clip-major then iteration then window (the reference's
    episode order in the output pickle).

    Window starts: time_start begins at -window_size + stride and advances
    by stride per successful window; the env resets at max(0, time_start)
    and the elapsed-time budget is window_size minus the clamped offset,
    i.e. min(window_size, (k+1)*stride) for window k.  A clip of length L
    yields max(1, floor(L/stride)) windows (the reference breaks when
    L < time_start + stride).
    """
    W, S = cfg.window_size, cfg.stride
    clip_ids, starts, budgets = [], [], []
    for c in clips:
        L = float(lengths[c])
        n_win = max(1, int(np.floor(L / S)))
        for _ in range(cfg.iter_per_episode):
            for k in range(n_win):
                ts = (k + 1) * S - W
                start = max(0.0, ts)
                budget_s = min(W, (k + 1) * S)
                # clip-end cutoff: policy output is unreliable once no
                # future lookahead remains (reference :113-116)
                clip_budget = int(np.floor(
                    (L - lookahead_slack) * fps_con)) - int(
                        round(start * fps_con))
                budget = min(int(np.ceil(budget_s * fps_con)), clip_budget)
                clip_ids.append(c)
                starts.append(start)
                budgets.append(max(budget, 0))
    return (np.asarray(clip_ids, np.int32), np.asarray(starts, np.float32),
            np.asarray(budgets, np.int64))


_EP_KEYS = ("time", "state", "state_body", "state_task", "action",
            "action_gt", "reward")


def collect_episodes(traj, valid, fell):
    """Lane trajectories -> episode list.  "Include only successful (not
    falling) episodes": a lane still fallen after max_retries is SKIPPED
    entirely (reference rllib_env_imitation.py:124-138) — keeping a
    pre-fall prefix would contaminate the cVAE dataset with pre-fall
    dynamics."""
    episodes = []
    for b in range(len(valid)):
        if fell[b]:
            continue
        n = int(valid[b])
        if n <= 0:
            continue
        episodes.append({k: list(traj[k][:n, b]) for k in _EP_KEYS})
    return episodes


def generate_demos(env: ImitationEnv, policy_fn, rng,
                   cfg: DemoGenConfig = DemoGenConfig(),
                   output_path: Optional[str] = None,
                   clip_ids=None):
    """policy_fn(obs, rng, explore) -> action.

    Returns the dataset dict (and writes the reference pickle schema when
    output_path is given).
    """
    clips = list(range(env.db.num_clips)) if clip_ids is None else clip_ids
    lengths = np.asarray(env.db.lengths())
    lookahead_slack = env.lookahead[-1]

    lane_clip, lane_start, lane_budget = plan_lanes(
        lengths, clips, cfg, env.cfg.fps_con, lookahead_slack)
    B = len(lane_clip)
    n_steps = int(lane_budget.max())

    def make_rollout(nb):
        """Jitted rollout over nb lanes (one compile per distinct nb; the
        retry path uses small power-of-two batches of failed lanes only)."""

        @jax.jit
        def rollout(rng, clip_arr, start_arr):
            rngs = jax.random.split(rng, nb)
            st = jax.vmap(lambda r, c, s: env.reset(
                r, ref_motion_id=c, start_time=s))(rngs, clip_arr, start_arr)

            def body(carry, _):
                st, rng = carry
                rng, k1, k2 = jax.random.split(rng, 3)
                obs = jax.vmap(env.observe)(st)
                # state_body is recorded with the CONFIGURED body type
                # (reference state_body_custom(state_type),
                # rllib_env_imitation.py:57-66,97), not the spec's
                obs_body = jax.vmap(
                    lambda s: env.observe_body(s, cfg.state_type))(st)
                obs_task = jax.vmap(env.observe_task)(st)
                a = policy_fn(obs, k1, True)
                a_gt = policy_fn(obs, k2, False)
                t = jax.vmap(env.ref_time)(st)
                st2, _, rew, done, _ = jax.vmap(env.step)(st, a)
                out = dict(time=t, state=obs, state_body=obs_body,
                           state_task=obs_task, action=a, action_gt=a_gt,
                           reward=rew, done=done,
                           eoe_inter=st2.eoe_intermediate)
                return (st2, rng), out

            (st, rng), traj = jax.lax.scan(body, (st, rng), None,
                                           length=n_steps)
            return traj

        return rollout

    rollout_full = make_rollout(B)
    rng, k = jax.random.split(rng)
    traj = rollout_full(k, jnp.asarray(lane_clip), jnp.asarray(lane_start))
    traj = jax.tree.map(lambda x: np.array(x), traj)  # writable copies

    def lane_valid_len(tr, col, lane):
        """Steps until falldown or the lane's budget (window / clip end)."""
        max_t = int(lane_budget[lane])
        inter = tr["eoe_inter"][:, col]
        if inter.any():
            first = int(np.argmax(inter))
            if first < max_t - 1:
                return first, True   # fell before the window end
            return min(max_t, first), False
        return max_t, False

    fell = np.zeros(B, dtype=bool)
    valid = np.zeros(B, dtype=np.int64)
    for b in range(B):
        valid[b], fell[b] = lane_valid_len(traj, b, b)

    # Retry ONLY the failed lanes: compact them into a power-of-two batch
    # (padding repeats lane 0) so each retry costs ~the failed fraction,
    # not a full re-roll of the grid.
    rollouts = {B: rollout_full}
    retries = 0
    while fell.any() and retries < cfg.max_retries:
        failed = np.where(fell)[0]
        nb = 1 << int(np.ceil(np.log2(max(len(failed), 1))))
        nb = min(nb, B)
        pad = np.zeros(nb, dtype=np.int64)
        pad[:len(failed)] = failed
        if nb not in rollouts:
            rollouts[nb] = make_rollout(nb)
        rng, k = jax.random.split(rng)
        traj2 = jax.tree.map(np.asarray, rollouts[nb](
            k, jnp.asarray(lane_clip[pad]), jnp.asarray(lane_start[pad])))
        for col, b in enumerate(failed):
            v2, f2 = lane_valid_len(traj2, col, int(b))
            if not f2 or v2 > valid[b]:
                for key in traj:
                    traj[key][:, b] = traj2[key][:, col]
                valid[b], fell[b] = v2, f2
        retries += 1

    episodes = collect_episodes(traj, valid, fell)

    from ..env import obs as obs_mod
    dims = {"state": env.dim_state,
            "state_body": obs_mod.body_state_dim(env.model, cfg.state_type),
            "state_task": env.dim_state_task, "action": env.dim_action}
    if output_path:
        save_demo_dataset(output_path, episodes, dims, cfg.exp_std,
                          cfg.iter_per_episode)
    return {"episodes": episodes, "dims": dims,
            "exp_std": cfg.exp_std,
            "iter_per_episode": cfg.iter_per_episode}


def policy_from_params(trainer, exp_std=0.05):
    """Wrap a PPOTrainer's policy as policy_fn with a fixed exploration std
    (model.set_exploration_std equivalent, envs/rllib_env_imitation.py:56)."""
    import jax.numpy as jnp

    def policy_fn(obs, rng, explore):
        logits, _ = trainer.policy_forward(trainer.params, obs)
        dim_a = trainer.env.dim_action
        mean = logits[..., :dim_a]
        if not explore:
            return mean
        return mean + jax.random.normal(rng, mean.shape) * exp_std

    return policy_fn
