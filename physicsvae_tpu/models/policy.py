"""FullyConnectedPolicy: PPO baseline policy + value (reference
rllib_model_torch.py:323-457), Flax edition."""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .fc import DEFAULT_FC_64X2, DEFAULT_FC_256X2, FC


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    dim_state: int
    dim_action: int
    log_std_type: str = "constant"
    sample_std: float = 1.0
    policy_fn_layers: tuple = tuple(DEFAULT_FC_256X2)
    log_std_fn_layers: tuple = tuple(DEFAULT_FC_64X2)
    value_fn_layers: tuple = tuple(DEFAULT_FC_256X2)


class FullyConnectedPolicy(nn.Module):
    cfg: PolicyConfig

    def setup(self):
        c = self.cfg
        append = c.log_std_type != "state_dependent"
        self.policy_fn = FC(
            size_out=c.dim_action,
            layers=list(c.policy_fn_layers),
            append_log_std=append,
            log_std_type=c.log_std_type if append else "constant",
            sample_std=c.sample_std,
            name="policy_fn")
        self.value_fn = FC(size_out=1, layers=list(c.value_fn_layers),
                           name="value_fn")
        if c.log_std_type == "state_dependent":
            self.log_std_fn = FC(size_out=c.dim_action,
                                 layers=list(c.log_std_fn_layers),
                                 name="log_std_fn")
        else:
            self.log_std_fn = None

    def __call__(self, obs):
        """Returns (logits=[mean, log_std], value)."""
        logits = self.policy_fn(obs)
        if self.log_std_fn is not None:
            log_std = (np.log(self.cfg.sample_std)
                       + self.log_std_fn(obs))
            logits = jnp.concatenate([logits, log_std], axis=-1)
        value = self.value_fn(obs)[..., 0]
        return logits, value


def init_policy(cfg: PolicyConfig, rng):
    model = FullyConnectedPolicy(cfg)
    obs = jnp.zeros((1, cfg.dim_state))
    variables = model.init({"params": rng}, obs)
    return model, variables


def split_logits(logits, dim_action):
    return logits[..., :dim_action], logits[..., dim_action:]


def sample_action(rng, logits, dim_action, explore=True):
    mean, log_std = split_logits(logits, dim_action)
    if not explore:
        return mean
    return mean + jax.random.normal(rng, mean.shape) * jnp.exp(log_std)


def log_prob(logits, dim_action, action):
    mean, log_std = split_logits(logits, dim_action)
    z = (action - mean) * jnp.exp(-log_std)
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * np.log(2 * np.pi), axis=-1)
