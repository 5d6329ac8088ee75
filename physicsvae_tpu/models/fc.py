"""Configurable fully-connected stacks, Flax edition.

Parity with the reference model zoo (rllib_model_torch.py:234-320): the same
layer-config schema ({"type": "fc", "hidden_size": ..., "activation": ...,
"init_weight": {"name": "normc", "std": ...}}), normc initialization, and
AppendLogStd semantics (rllib_model_torch.py:160-206) with constant /
state_independent log-std types.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def normc_initializer(std: float = 1.0):
    """Column-normalized gaussian init (rllib normc_initializer): each output
    unit's weight vector is normalized to norm `std`."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.normal(key, shape, dtype)
        # flax Dense kernel shape: (in, out); normalize over inputs per output
        norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
        return w * (std / jnp.maximum(norm, 1e-12))

    return init


def get_initializer(info):
    name = info.get("name", "normc")
    if name == "normc":
        return normc_initializer(info.get("std", 1.0))
    if name == "xavier_normal":
        return nn.initializers.glorot_normal()
    if name == "xavier_uniform":
        return nn.initializers.glorot_uniform()
    raise NotImplementedError(name)


def get_activation(name):
    if name in ("linear", None):
        return None
    return {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "elu": nn.elu,
        "swish": nn.swish,
        "silu": nn.swish,
    }[name]


def default_fc_layers(width: int, depth: int, act: str = "relu",
                      out_act: str = "linear"):
    """gen_layers equivalent (train_physics_vae.py:180-192)."""
    layers = [
        {"type": "fc", "hidden_size": width, "activation": act,
         "init_weight": {"name": "normc", "std": 1.0}}
        for _ in range(depth)
    ]
    layers.append(
        {"type": "fc", "hidden_size": "output", "activation": out_act,
         "init_weight": {"name": "normc", "std": 0.01}})
    return layers


DEFAULT_FC_64X2 = default_fc_layers(64, 2)
DEFAULT_FC_128X2 = default_fc_layers(128, 2)
DEFAULT_FC_256X2 = default_fc_layers(256, 2)
DEFAULT_FC_512X3 = default_fc_layers(512, 3)
DEFAULT_FC_1024X2 = default_fc_layers(1024, 2)


class FC(nn.Module):
    """FC stack following the reference layer-config schema
    (rllib_model_torch.py:234-281).

    If append_log_std, the output is [mean, log_std] with log_std either a
    non-trainable constant or a trainable state-independent vector.
    """

    size_out: int
    layers: Sequence[dict]
    append_log_std: bool = False
    log_std_type: str = "constant"
    sample_std: Any = 1.0

    @nn.compact
    def __call__(self, x):
        for i, l in enumerate(self.layers):
            lt = l["type"]
            if lt == "fc":
                hs = l["hidden_size"]
                hs = self.size_out if hs == "output" else int(hs)
                x = nn.Dense(
                    hs,
                    kernel_init=get_initializer(
                        l.get("init_weight", {"name": "normc", "std": 1.0})),
                    bias_init=nn.initializers.zeros,
                    name=f"fc_{i}")(x)
                act = get_activation(l.get("activation"))
                if act is not None:
                    x = act(x)
            elif lt in ("sm", "softmax"):
                x = nn.softmax(x, axis=-1)
            elif lt in ("hm", "hardmax"):
                # one-hot argmax (rllib_model_torch.py:208-218); straight
                # lookup, non-differentiable like the reference
                x = jax.nn.one_hot(jnp.argmax(x, axis=-1), x.shape[-1],
                                   dtype=x.dtype)
            elif lt in ("bn", "batch_norm"):
                # Inference-mode batch norm (running stats not tracked in the
                # reference's usage either once eval()'d).
                x = nn.LayerNorm(name=f"bn_{i}")(x)
            else:
                raise NotImplementedError(lt)

        if self.append_log_std:
            init_val = float(np.log(self.sample_std))
            if self.log_std_type == "constant":
                log_std = self.variable(
                    "constants", "log_std",
                    lambda: jnp.full((self.size_out,), init_val)).value
            elif self.log_std_type == "state_independent":
                log_std = self.param(
                    "log_std", lambda k: jnp.full((self.size_out,), init_val))
            else:
                raise NotImplementedError(self.log_std_type)
            log_std = jnp.broadcast_to(log_std, x.shape[:-1] + (self.size_out,))
            x = jnp.concatenate([x, log_std], axis=-1)
        return x
