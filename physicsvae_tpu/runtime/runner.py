"""Runtime evaluation: EnvRunner with `full` and `pass_through` modes.

Re-build of EnvRunner (envs/rllib_env_imitation.py:193-270): `full` runs the
whole PhysicsVAE (task encoder -> decoder); `pass_through` samples z from the
latent prior and runs the motor decoder only — the runtime product of the
paper (a generative controller driven by latent samples).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.imitation import ImitationEnv
from ..models.physics_vae import PhysicsVAE


class EnvRunner:
    EVAL_METHODS = ("full", "pass_through")

    def __init__(self, env: ImitationEnv, model: PhysicsVAE, variables,
                 rng=None, explore: bool = True):
        self.env = env
        self.model = model
        self.variables = variables
        self.explore = explore
        self.policy_eval_method = "full"
        # When set (np/jnp vector of latent dim), pass_through holds this
        # exact z instead of resampling each step — the z-sweep knob for
        # demonstrating distinct latent-conditioned behaviors (the
        # reference's EnvRunner resamples every step; a fixed z is the
        # natural probe of what one latent encodes).
        self.fixed_z = None
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._step_full = jax.jit(self._full_step)
        self._step_pass = jax.jit(self._pass_through_step)
        self.env_state = None
        self.reset()

    def reset(self, info=None):
        self.rng, k = jax.random.split(self.rng)
        kwargs = dict(info or {})
        self.env_state = self.env.reset(k, **kwargs)

    # -- jitted step fns -------------------------------------------------

    def _sample(self, rng, logits, explore):
        dim_a = self.env.dim_action
        mean = logits[..., :dim_a]
        log_std = logits[..., dim_a:]
        return jnp.where(explore,
                         mean + jax.random.normal(rng, mean.shape)
                         * jnp.exp(log_std),
                         mean)

    def _full_step(self, st, rng, explore):
        obs = self.env.observe(st)
        rng, k1, k2 = jax.random.split(rng, 3)
        logits, aux = self.model.apply(self.variables, obs[None], rng=k1)
        a = self._sample(k2, logits[0], explore)
        st2, obs2, rew, done, info = self.env.step(st, a)
        return st2, rew, done, aux["z_task"][0]

    def _pass_through_step(self, st, rng, explore, z_fixed, use_fixed):
        """z ~ prior -> motor decoder only
        (envs/rllib_env_imitation.py:234-264)."""
        cfg = self.model.cfg
        obs_body = self.env.observe_body(st)
        rng, k1, k2 = jax.random.split(rng, 3)
        prior = cfg.latent_prior_type
        if prior == "normal_zero_mean_one_std":
            z = jax.random.normal(k1, (cfg.task_encoder_output_dim,))
        elif prior == "normal_state_mean_one_std":
            # state-conditioned prior mean + unit std
            mu = self.model.apply(
                self.variables, obs_body[None],
                method=lambda m, x: m.latent_prior(x))[0]
            z = mu + jax.random.normal(k1, mu.shape)
        elif prior == "hypersphere_uniform":
            z = jax.random.normal(k1, (cfg.task_encoder_output_dim,))
            z = z / jnp.maximum(jnp.linalg.norm(z), 1e-8)
        else:
            raise NotImplementedError(prior)
        z = jnp.where(use_fixed, z_fixed, z)
        logits = self.model.apply(
            self.variables, obs_body[None], z[None],
            method=PhysicsVAE.decode)
        a = self._sample(k2, logits[0], explore)
        st2, obs2, rew, done, info = self.env.step(st, a)
        return st2, rew, done, z

    # -- public ----------------------------------------------------------

    def one_step(self, explore: Optional[bool] = None):
        explore = self.explore if explore is None else explore
        self.rng, k = jax.random.split(self.rng)
        if self.policy_eval_method == "full":
            self.env_state, rew, done, z = self._step_full(
                self.env_state, k, jnp.asarray(explore))
        else:
            dim_z = self.model.cfg.task_encoder_output_dim
            if self.fixed_z is not None:
                zf, use = jnp.asarray(self.fixed_z, jnp.float32), True
            else:
                zf, use = jnp.zeros((dim_z,), jnp.float32), False
            self.env_state, rew, done, z = self._step_pass(
                self.env_state, k, jnp.asarray(explore), zf,
                jnp.asarray(use))
        return float(rew), bool(done), np.asarray(z)

    def toggle_eval_method(self):
        i = self.EVAL_METHODS.index(self.policy_eval_method)
        self.policy_eval_method = self.EVAL_METHODS[
            (i + 1) % len(self.EVAL_METHODS)]
        return self.policy_eval_method

    def run_episode(self, max_steps=1000, record: bool = False):
        """Roll one episode.  With record=True also returns the pose
        trajectory [(root_p, root_q, joint_q), ...] for export/rendering
        (the reference records replays the same way,
        envs/rllib_env_imitation.py:421-442)."""
        rews, traj = [], []
        for _ in range(max_steps):
            rew, done, _ = self.one_step()
            rews.append(rew)
            if record:
                sim = self.env_state.sim
                traj.append((np.asarray(sim.root_p), np.asarray(sim.root_q),
                             np.asarray(sim.joint_q)))
            if done:
                break
        if record:
            return rews, traj
        return rews
