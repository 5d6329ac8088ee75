"""Recurrent (LSTM) policy plumbing.

Zoo parity with the reference's LSTM machinery (rllib_model_torch.py:48-158:
create_layer type "lstm" + process_lstm + rllib add_time_dimension).  In JAX
the hidden state is an explicit carry pytree; sequences are processed with
lax.scan, which replaces rllib's time-dimension reshaping.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fc import FC, DEFAULT_FC_64X2, default_fc_layers


@dataclasses.dataclass(frozen=True)
class LSTMPolicyConfig:
    dim_state: int
    dim_action: int
    hidden_size: int = 128
    num_layers: int = 1
    output_layers: tuple = tuple(DEFAULT_FC_64X2)
    value_fn_layers: tuple = tuple(default_fc_layers(256, 2))
    log_std_type: str = "constant"
    sample_std: float = 0.1


class LSTMPolicy(nn.Module):
    """obs + carry -> (logits=[mean,log_std], value, carry').

    Carry layout: tuple of (c, h) per layer (flax LSTMCell convention),
    equivalent to the reference's per-layer (h, c) state list
    (rllib_model_torch.py:137-155).
    """

    cfg: LSTMPolicyConfig

    def setup(self):
        c = self.cfg
        self.cells = [nn.OptimizedLSTMCell(c.hidden_size,
                                           name=f"lstm_{i}")
                      for i in range(c.num_layers)]
        self.head = FC(size_out=c.dim_action,
                       layers=list(c.output_layers),
                       append_log_std=True,
                       log_std_type=c.log_std_type,
                       sample_std=c.sample_std,
                       name="head")
        self.value_fn = FC(size_out=1, layers=list(c.value_fn_layers),
                           name="value_fn")

    def initial_state(self, batch_shape=()):
        c = self.cfg
        return tuple(
            (jnp.zeros(batch_shape + (c.hidden_size,)),
             jnp.zeros(batch_shape + (c.hidden_size,)))
            for _ in range(c.num_layers))

    def __call__(self, obs, carry):
        x = obs
        new_carry = []
        for i, cell in enumerate(self.cells):
            ci, x = cell(carry[i], x)
            new_carry.append(ci)
        logits = self.head(x)
        value = self.value_fn(obs)[..., 0]
        return logits, value, tuple(new_carry)

def unroll(model: LSTMPolicy, variables, obs_seq, carry):
    """Process a (T, ..., D) observation sequence with lax.scan (replaces
    rllib's add_time_dimension sequence batching).  Returns
    (logits (T,...), values (T,...), final carry)."""

    def step(carry, obs):
        logits, value, carry = model.apply(variables, obs, carry)
        return carry, (logits, value)

    carry, (logits, values) = jax.lax.scan(step, carry, obs_seq)
    return logits, values, carry


def init_lstm_policy(cfg: LSTMPolicyConfig, rng):
    model = LSTMPolicy(cfg)
    obs = jnp.zeros((1, cfg.dim_state))
    carry = model.initial_state((1,))
    variables = model.init({"params": rng}, obs, carry)
    return model, variables
