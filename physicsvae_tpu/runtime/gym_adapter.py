"""Single-env host adapter with the gym.Env surface.

Re-build of HumanoidImitation (envs/rllib_env_imitation.py:147-191): the same
reset(info)/step(action) -> (obs, rew, done, info) API and observation /
action space metadata (Box ±1000 obs, action range from the spec), so host
code written against the reference's env drops in.  Internally everything is
one jitted step of the functional ImitationEnv.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.imitation import ImitationEnv


class Box:
    """Minimal gym.spaces.Box stand-in (no gym dependency on TPU hosts)."""

    def __init__(self, low, high, dtype=np.float64):
        self.low = np.asarray(low)
        self.high = np.asarray(high)
        self.shape = self.low.shape
        self.dtype = dtype

    def sample(self, rng=None):
        rng = rng or np.random.default_rng()
        return rng.uniform(self.low, self.high)


class HumanoidImitation:
    OB_SCALE = 1000.0

    def __init__(self, env_or_config, project_dir: Optional[str] = None):
        if isinstance(env_or_config, ImitationEnv):
            self.base_env = env_or_config
        elif isinstance(env_or_config, dict):
            from ..env.config import parse_env_config
            self.base_env = ImitationEnv(
                parse_env_config(env_or_config, project_dir))
        else:
            from ..env import make_env
            self.base_env = make_env(env_or_config, project_dir=project_dir)

        env = self.base_env
        ob = self.OB_SCALE
        self.observation_space = Box(-ob * np.ones(env.dim_state),
                                     ob * np.ones(env.dim_state))
        self.observation_space_body = Box(-ob * np.ones(env.dim_state_body),
                                          ob * np.ones(env.dim_state_body))
        self.observation_space_task = Box(-ob * np.ones(env.dim_state_task),
                                          ob * np.ones(env.dim_state_task))
        lo = env.cfg.action_range_min_pol
        hi = env.cfg.action_range_max_pol
        self.action_space = Box(lo * np.ones(env.dim_action),
                                hi * np.ones(env.dim_action))

        self._rng = jax.random.PRNGKey(0)
        self._step = jax.jit(env.step)
        self._observe = jax.jit(env.observe)
        self._env_state = None

        self._learning_info = {}

    def seed(self, seed: int):
        self._rng = jax.random.PRNGKey(seed)

    def set_learning_info(self, info: dict):
        """Trainer feedback consumed by reward weight schedules
        (envs/env_humanoid_base.py:349-353)."""
        self._learning_info.update(info)

    def state(self):
        return np.asarray(self._observe(self._env_state))

    def reset(self, info={}):
        self._rng, k = jax.random.split(self._rng)
        kwargs = {}
        if "ref_motion_id" in info:
            v = info["ref_motion_id"]
            kwargs["ref_motion_id"] = v[0] if isinstance(v, (list, tuple,
                                                            np.ndarray)) else v
        if "start_time" in info:
            v = info["start_time"]
            kwargs["start_time"] = float(np.asarray(v).reshape(-1)[0])
        self._env_state = self.base_env.reset(k, **kwargs)
        return self.state()

    def step(self, action):
        tt = jnp.asarray(
            self._learning_info.get("timesteps_total", 0.0), jnp.float32)
        self._env_state, obs, rew, done, info = self._step(
            self._env_state, jnp.asarray(action), tt)
        info_np = {
            "eoe_reason": [k for k, v in info["eoe"].items() if bool(v)],
            "rew_info": {k: float(v) for k, v in info["rew_info"].items()},
        }
        return np.asarray(obs), float(rew), bool(done), info_np


env_cls = HumanoidImitation


def config_override(spec: dict, project_dir: Optional[str] = None) -> dict:
    """Inject derived body/task observation spaces into the model config
    (envs/rllib_env_imitation.py:477-493)."""
    import copy

    env = HumanoidImitation(spec["config"]["env_config"],
                            project_dir=project_dir)
    model_config = copy.deepcopy(spec["config"].get("model", {}))
    cmc = model_config.setdefault("custom_model_config", {})
    cmc["observation_space_body"] = env.observation_space_body
    cmc["observation_space_task"] = env.observation_space_task
    return {"model": model_config}
