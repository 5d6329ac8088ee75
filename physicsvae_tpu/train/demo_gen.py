"""Expert-demonstration generation — the dataset factory.

Re-build of gen_state_action_pairs (envs/rllib_env_imitation.py:38-145) with
the same windowing semantics (window 1000 s, stride 1000 s, iter_per_episode
10, exp_std 0.05, state_type facing_R6_h, drop-falldown-windows with <=10
retries) but vmapped: all (clip, iteration) pairs roll out simultaneously on
device; the host only slices valid prefixes and writes the pickle.
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


def generate_demos(env: ImitationEnv, policy_fn, rng,
                   cfg: DemoGenConfig = DemoGenConfig(),
                   output_path: Optional[str] = None,
                   clip_ids=None):
    """policy_fn(obs, rng, explore) -> action.

    Returns the dataset dict (and writes the reference pickle schema when
    output_path is given).  Each (clip, iteration, retry) is an independent
    vmapped rollout; windows containing a falldown are regenerated with a
    fresh RNG up to max_retries times, then dropped
    (envs/rllib_env_imitation.py:124-138).
    """
    clips = list(range(env.db.num_clips)) if clip_ids is None else clip_ids
    lengths = np.asarray(env.db.lengths())
    n_steps = int(np.ceil(lengths.max() * env.cfg.fps_con))
    lookahead_slack = env.lookahead[-1]

    B = len(clips) * cfg.iter_per_episode
    clip_arr = jnp.asarray(np.repeat(clips, cfg.iter_per_episode))

    def reset_batch(rng):
        rngs = jax.random.split(rng, B)
        return jax.vmap(lambda r, c: env.reset(r, ref_motion_id=c,
                                               start_time=0.0))(rngs, clip_arr)

    @jax.jit
    def rollout(rng):
        st = reset_batch(rng)

        def body(carry, _):
            st, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            obs = jax.vmap(env.observe)(st)
            obs_body = jax.vmap(env.observe_body)(st)
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

        (st, rng), traj = jax.lax.scan(body, (st, rng), None, length=n_steps)
        return traj

    rng, k = jax.random.split(rng)
    traj = rollout(k)
    traj = jax.tree.map(lambda x: np.array(x), traj)  # writable copies

    # Retry falldown windows with fresh seeds (host-side control; each retry
    # re-rolls everything but only failed lanes are swapped in).
    def lane_valid_len(traj, b, clip):
        """Steps until EOE-other-than-motion-end or motion end."""
        L = float(lengths[clip])
        max_t = int(np.floor((L - lookahead_slack) * env.cfg.fps_con))
        inter = traj["eoe_inter"][:, b]
        if inter.any():
            first = int(np.argmax(inter))
            if first < max_t - 1:
                return first, True   # fell before the end
            return min(max_t, first), False
        return max_t, False

    fell = np.zeros(B, dtype=bool)
    valid = np.zeros(B, dtype=np.int64)
    for b in range(B):
        valid[b], fell[b] = lane_valid_len(traj, b, int(clip_arr[b]))

    retries = 0
    while fell.any() and retries < cfg.max_retries:
        rng, k = jax.random.split(rng)
        traj2 = jax.tree.map(np.asarray, rollout(k))  # read-only ok (source)
        for b in np.where(fell)[0]:
            v2, f2 = lane_valid_len(traj2, b, int(clip_arr[b]))
            if not f2 or v2 > valid[b]:
                for key in traj:
                    traj[key][:, b] = traj2[key][:, b]
                valid[b], fell[b] = v2, f2
        retries += 1

    episodes = []
    for b in range(B):
        if fell[b] and valid[b] < 10:
            continue  # too many falldowns: skip window
        n = int(valid[b])
        episodes.append({
            "time": list(traj["time"][:n, b]),
            "state": list(traj["state"][:n, b]),
            "state_body": list(traj["state_body"][:n, b]),
            "state_task": list(traj["state_task"][:n, b]),
            "action": list(traj["action"][:n, b]),
            "action_gt": list(traj["action_gt"][:n, b]),
            "reward": list(traj["reward"][:n, b]),
        })

    dims = {"state": env.dim_state, "state_body": env.dim_state_body,
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
