"""Batched scanned episode evaluator.

The r4 stage-3/4 eval tables (10 episodes x 900 steps, per eval mode)
were produced by the host-loop EnvRunner — one device dispatch per
control step (r4 VERDICT weak #8).  This evaluator rolls ALL episodes of
ALL requested lanes (full / pass_through / fixed-z) as ONE jitted
scan-over-vmap program: per-lane reward sums, lengths, and survival come
back in a single dispatch.

Semantics parity: EnvRunner.one_step (envs/rllib_env_imitation.py:
215-270) — `full` = task encoder -> motor decoder on the live obs;
`pass_through` = z ~ latent prior (or a held fixed z) -> motor decoder
only.  Episodes terminate by the env's own EOE engine; finished lanes
keep stepping but are masked out of every statistic (no autoreset).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.imitation import ImitationEnv
from ..models.physics_vae import PhysicsVAE


class BatchedEvaluator:
    def __init__(self, env: ImitationEnv, model: PhysicsVAE, variables):
        self.env = env
        self.model = model
        self.variables = variables
        self._rollouts = {}

    # -- single-lane step (vmapped inside the rollout) -------------------

    def _sample(self, rng, logits, explore):
        dim_a = self.env.dim_action
        mean = logits[..., :dim_a]
        log_std = logits[..., dim_a:]
        return jnp.where(explore,
                         mean + jax.random.normal(rng, mean.shape)
                         * jnp.exp(log_std),
                         mean)

    def _one_step(self, method, st, rng, z_fixed, use_fixed, explore):
        rng, k1, k2 = jax.random.split(rng, 3)
        if method == "full":
            obs = self.env.observe(st)
            logits, _ = self.model.apply(self.variables, obs[None], rng=k1)
            a = self._sample(k2, logits[0], explore)
        else:
            cfg = self.model.cfg
            obs_body = self.env.observe_body(st)
            prior = cfg.latent_prior_type
            if prior == "normal_zero_mean_one_std":
                z = jax.random.normal(k1, (cfg.task_encoder_output_dim,))
            elif prior == "normal_state_mean_one_std":
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
        st2, rew, done, _ = self.env.step_core(st, a)
        return st2, rew, done

    # -- batched rollout -------------------------------------------------

    def _make_rollout(self, method, max_steps, n_lanes, rsi, add_noise):
        one = lambda st, rng, zf, uf, ex: self._one_step(
            method, st, rng, zf, uf, ex)

        @jax.jit
        def rollout(rng, ref_ids, start_times, z_fixed, use_fixed, explore):
            rngs = jax.random.split(rng, n_lanes + 1)
            rng = rngs[0]
            if rsi:
                # EnvRunner.reset parity (random clip + uniform start +
                # the spec's noise defaults) — the protocol behind the
                # r4 mode_load eval numbers
                st = jax.vmap(lambda r: self.env.reset(
                    r, add_noise=add_noise))(rngs[1:])
            else:
                st = jax.vmap(lambda r, c, s: self.env.reset(
                    r, ref_motion_id=c, start_time=s,
                    add_noise=add_noise))(rngs[1:], ref_ids, start_times)

            def body(carry, _):
                st, rng, done_l, rew_sum, length = carry
                rng, k = jax.random.split(rng)
                ks = jax.random.split(k, n_lanes)
                st2, rew, done = jax.vmap(one, in_axes=(0, 0, 0, 0, None))(
                    st, ks, z_fixed, use_fixed, explore)
                active = ~done_l
                rew_sum = rew_sum + jnp.where(active, rew, 0.0)
                length = length + active.astype(jnp.int32)
                return (st2, rng, done_l | done, rew_sum, length), None

            init = (st, rng,
                    jnp.zeros(n_lanes, bool),
                    jnp.zeros(n_lanes, jnp.float32),
                    jnp.zeros(n_lanes, jnp.int32))
            (st, rng, done_l, rew_sum, length), _ = jax.lax.scan(
                body, init, None, length=max_steps)
            return rew_sum, length, done_l

        return rollout

    def evaluate(self, rng, n_episodes: int, max_steps: int = 900,
                 method: str = "full", fixed_z=None,
                 ref_motion_ids=None, start_times=None,
                 explore: bool = False, rsi: bool = False,
                 add_noise: Optional[bool] = False):
        """Roll n_episodes lanes in one program.  fixed_z: (dz,) or
        (n_episodes, dz) to pin pass_through's latent.  rsi=True uses
        random clip + uniform start time per lane (EnvRunner.reset
        parity); add_noise=None defers to the spec's default.  Returns a
        dict of numpy per-lane stats + aggregates."""
        assert method in ("full", "pass_through"), method
        dz = self.model.cfg.task_encoder_output_dim
        if fixed_z is None:
            zf = jnp.zeros((n_episodes, dz), jnp.float32)
            uf = jnp.zeros((n_episodes,), bool)
        else:
            zf = jnp.broadcast_to(jnp.asarray(fixed_z, jnp.float32),
                                  (n_episodes, dz))
            uf = jnp.ones((n_episodes,), bool)
        if ref_motion_ids is None:
            nc = self.env.db.num_clips
            ref_motion_ids = jnp.arange(n_episodes, dtype=jnp.int32) % nc
        else:
            ref_motion_ids = jnp.asarray(ref_motion_ids, jnp.int32)
        if start_times is None:
            start_times = jnp.zeros((n_episodes,), jnp.float32)
        else:
            start_times = jnp.asarray(start_times, jnp.float32)

        key = (method, max_steps, n_episodes, rsi, add_noise)
        if key not in self._rollouts:
            self._rollouts[key] = self._make_rollout(method, max_steps,
                                                     n_episodes, rsi,
                                                     add_noise)
        rew_sum, length, ended = self._rollouts[key](
            rng, ref_motion_ids, start_times, zf, uf,
            jnp.asarray(explore))
        rew_sum = np.asarray(rew_sum)
        length = np.asarray(length)
        return {
            "method": method,
            "episode_return": rew_sum,
            "episode_length": length,
            "ended": np.asarray(ended),
            "mean_return": float(rew_sum.mean()),
            "mean_length": float(length.mean()),
            "mean_step_reward": float(
                (rew_sum / np.maximum(length, 1)).mean()),
        }
