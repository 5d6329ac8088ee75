"""PhysicsVAE model: task encoder + latent prior + motor decoder + world
model + value branch.

Flax re-build of the reference PhysicsVAE (rllib_model_torch.py:461-950):
same component structure, latent-prior variants
(normal_zero_mean_one_std / normal_state_mean_one_std / hypersphere_uniform /
False), decoder-helper residual, and per-component parameter subtrees so
components can be independently saved / loaded / frozen
(rllib_model_torch.py:870-950 — load-bearing for the two-phase cVAE
schedule).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fc import (DEFAULT_FC_256X2, DEFAULT_FC_512X3, DEFAULT_FC_1024X2,
                 DEFAULT_FC_128X2, FC)


@dataclasses.dataclass(frozen=True)
class PhysicsVAEConfig:
    """Mirrors PhysicsVAE.DEFAULT_CONFIG (rllib_model_torch.py:462-510)."""

    dim_state_body: int
    dim_state_task: int
    dim_action: int

    log_std_type: str = "constant"
    sample_std: float = 0.1

    task_encoder_inputs: tuple = ("body", "task")
    task_encoder_layers: tuple = tuple(DEFAULT_FC_256X2)
    task_encoder_output_dim: int = 32

    latent_prior_type: Any = "normal_zero_mean_one_std"
    latent_prior_layers: Optional[tuple] = None

    motor_decoder_inputs: tuple = ("body", "task")
    motor_decoder_layers: tuple = tuple(DEFAULT_FC_512X3)

    motor_decoder_helper_enable: bool = False
    motor_decoder_helper_layers: tuple = tuple(DEFAULT_FC_128X2)
    motor_decoder_helper_range: float = 0.5

    value_fn_layers: tuple = tuple(DEFAULT_FC_256X2)
    world_model_layers: tuple = tuple(DEFAULT_FC_1024X2)

    @property
    def dim_state(self):
        return self.dim_state_body + self.dim_state_task


class PhysicsVAE(nn.Module):
    cfg: PhysicsVAEConfig

    def setup(self):
        c = self.cfg
        if c.latent_prior_type in ("normal_zero_mean_one_std",
                                   "normal_state_mean_one_std"):
            enc_out = 2 * c.task_encoder_output_dim
        else:  # hypersphere_uniform or False
            enc_out = c.task_encoder_output_dim
        self.task_encoder = FC(size_out=enc_out,
                               layers=list(c.task_encoder_layers),
                               name="task_encoder")
        if c.latent_prior_type == "normal_state_mean_one_std":
            layers = list(c.latent_prior_layers or DEFAULT_FC_256X2)
            self.latent_prior = FC(size_out=c.task_encoder_output_dim,
                                   layers=layers, name="latent_prior")
        else:
            self.latent_prior = None

        self.motor_decoder = FC(
            size_out=c.dim_action,
            layers=list(c.motor_decoder_layers),
            append_log_std=True,
            log_std_type=c.log_std_type,
            sample_std=c.sample_std,
            name="motor_decoder")

        if c.motor_decoder_helper_enable:
            self.motor_decoder_helper = FC(
                size_out=c.dim_action,
                layers=list(c.motor_decoder_helper_layers),
                name="motor_decoder_helper")
        else:
            self.motor_decoder_helper = None

        self.world_model = FC(size_out=c.dim_state_body,
                              layers=list(c.world_model_layers),
                              name="world_model")
        self.value_branch = FC(size_out=1, layers=list(c.value_fn_layers),
                               name="value_branch")

    # -- components (mirror forward_encoder / forward_decoder / forward_world
    #    / forward_value_branch, rllib_model_torch.py:773-853) --------------

    def encode(self, obs, rng: Optional[jax.Array] = None,
               sample: bool = True):
        """Returns dict(z_body, z_task, mu, logvar, prior_mu)."""
        c = self.cfg
        obs_body = obs[..., :c.dim_state_body]
        if ("body" in c.task_encoder_inputs
                and "task" in c.task_encoder_inputs):
            obs_task = obs
        elif "body" in c.task_encoder_inputs:
            obs_task = obs_body
        else:
            obs_task = obs[..., c.dim_state_body:]

        out = {"z_body": obs_body, "mu": None, "logvar": None,
               "prior_mu": None}
        z = self.task_encoder(obs_task)
        if c.latent_prior_type in ("normal_zero_mean_one_std",
                                   "normal_state_mean_one_std"):
            mu = z[..., :c.task_encoder_output_dim]
            # Bounded posterior variance: on out-of-distribution states
            # (a degraded RL rollout lane pushes obs to ~1e4) an
            # unbounded logvar head reaches ~+100, sigma ~ e^50, and one
            # reparameterized z sample blows the decoder mean to ~1e20 —
            # which NaN'd the first runtime fine-tune PPO epoch.  The
            # clamp is inert in-distribution (trained logvar lives in
            # [-10, 2]).
            logvar = jnp.clip(z[..., c.task_encoder_output_dim:],
                              -15.0, 4.0)
            if sample:
                assert rng is not None
                eps = jax.random.normal(rng, mu.shape)
                z_task = mu + eps * jnp.exp(0.5 * logvar)
            else:
                z_task = mu
            out.update(mu=mu, logvar=logvar)
            if c.latent_prior_type == "normal_state_mean_one_std":
                out["prior_mu"] = self.latent_prior(obs_body)
        elif c.latent_prior_type == "hypersphere_uniform":
            # Reference (rllib_model_torch.py:810-814): mu is the normalized
            # encoder output, the prior is a fresh random direction on the
            # sphere, and z_task passes through UNnormalized.
            mu = z / jnp.maximum(
                jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
            z_task = z
            out.update(mu=mu)
            if rng is not None:
                zp = jax.random.normal(rng, mu.shape)
                out["prior_mu"] = zp / jnp.maximum(
                    jnp.linalg.norm(zp, axis=-1, keepdims=True), 1e-8)
        else:  # no prior
            z_task = z
        out["z_task"] = z_task
        return out

    def decode(self, z_body, z_task):
        """Motor decoder: (body, z) -> [action mean, log_std]."""
        c = self.cfg
        z = []
        if "body" in c.motor_decoder_inputs:
            z.append(z_body)
        if "task" in c.motor_decoder_inputs:
            z.append(z_task)
        z = jnp.concatenate(z, axis=-1)
        logits = self.motor_decoder(z)
        if self.motor_decoder_helper is not None:
            # helper's last layer is tanh-activated per config; scale by range
            # (rllib_model_torch.py:833-835)
            add = self.motor_decoder_helper(z)
            logits = logits.at[..., :c.dim_action].add(
                c.motor_decoder_helper_range * add)
        return logits

    def world(self, state_body, action):
        x = jnp.concatenate([state_body, action], axis=-1)
        return self.world_model(x)

    def value(self, obs):
        return self.value_branch(obs)[..., 0]

    def __call__(self, obs, rng: Optional[jax.Array] = None,
                 sample: bool = True):
        """Full forward (rllib_model_torch.py:742-771): returns
        (logits, aux-dict)."""
        enc = self.encode(obs, rng, sample)
        logits = self.decode(enc["z_body"], enc["z_task"])
        future = self.world(enc["z_body"], logits[..., :self.cfg.dim_action])
        val = self.value(obs)
        aux = dict(enc)
        aux.update(future_state=future, value=val)
        return logits, aux


COMPONENT_NAMES = ("task_encoder", "motor_decoder", "motor_decoder_helper",
                   "world_model", "value_branch", "latent_prior")


def component_label(path) -> str:
    """Map a param path to its component name (for freezing / per-component
    checkpoints, mirroring set_learnable_* / save_weights_*)."""
    for p in path:
        key = getattr(p, "key", None)
        if key in COMPONENT_NAMES:
            return key
    return "other"


def init_model(cfg: PhysicsVAEConfig, rng):
    model = PhysicsVAE(cfg)
    obs = jnp.zeros((1, cfg.dim_state))
    variables = model.init({"params": rng}, obs, rng=rng, sample=False)
    return model, variables
