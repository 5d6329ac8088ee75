"""Multi-agent ImitationEnv: N characters imitating their own reference
clips in ONE physically coupled world.

The reference task framework is generically multi-agent — agent lists
threaded through the whole base env (envs/env_humanoid_base.py:45-205),
num_agent SimAgents spawned into a single Bullet world
(envs/env_humanoid_tracking.py:181-209).  TPU design: per-agent env
logic (RSI, obs, reward DSL, EOE) is the unchanged single-agent code
vmapped over a leading agent axis; only the physics step is the COUPLED
scene step (physics/multi_agent.scene_step) whose inter-agent contact
rows span both agents' velocity spaces.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..physics import multi_agent as ma_mod
from .imitation import EnvState, ImitationEnv


class MultiAgentImitationEnv:
    """N-agent wrapper over a single ImitationEnv's pure functions.

    States carry a leading agent axis on every EnvState leaf.  Each agent
    tracks its own (clip, start-time) kinematic twin and gets its own
    reward/EOE; agents interact physically through the coupled contact
    solve.  Obstacles and the carried-inverse fast path are not part of
    this slice (scene_step manages its own inverses), so construct the
    inner env with physics_overrides={"carry_minv": False} and no
    obstacle block.
    """

    def __init__(self, env: ImitationEnv, num_agents: int = 2,
                 num_agent_contacts: int = 8):
        assert env._minv_table is None, \
            "build the inner env with physics_overrides={'carry_minv': False}"
        assert env.cfg.obstacle_num_slots == 0, \
            "obstacles are not supported in the multi-agent slice"
        self.env = env
        self.num_agents = num_agents
        self.num_agent_contacts = num_agent_contacts
        self.dim_action = env.dim_action
        self.dim_state = env.dim_state

    # -- reset -----------------------------------------------------------

    def reset(self, rng, ref_motion_ids=None, start_times=None,
              root_offsets=None, add_noise=None) -> EnvState:
        """Per-agent RSI reset (vmapped).  root_offsets: optional (A, 3)
        world offsets applied to the initial root positions so test
        scenes can place agents relative to each other (clips already
        carry distinct world trajectories)."""
        A = self.num_agents
        rngs = jax.random.split(rng, A)
        if ref_motion_ids is None:
            st = jax.vmap(lambda r: self.env.reset(
                r, add_noise=add_noise))(rngs)
        else:
            ids = jnp.asarray(ref_motion_ids, jnp.int32)
            ts = (jnp.zeros(A, jnp.float32) if start_times is None
                  else jnp.asarray(start_times, jnp.float32))
            st = jax.vmap(lambda r, c, t: self.env.reset(
                r, ref_motion_id=c, start_time=t,
                add_noise=add_noise))(rngs, ids, ts)
        if root_offsets is not None:
            off = jnp.asarray(root_offsets, jnp.float32)
            st = dataclasses.replace(
                st, sim=dataclasses.replace(
                    st.sim, root_p=st.sim.root_p + off))
        return st

    def observe(self, st: EnvState):
        return jax.vmap(self.env.observe)(st)

    # -- step ------------------------------------------------------------

    def step(self, st: EnvState, actions, timesteps_total=0.0):
        """One coupled control step.  actions: (A, dim_action).  Returns
        (next_state, obs (A, dim_state), reward (A,), done (A,), info) —
        per-agent everything, scene-coupled physics."""
        env = self.env
        acts = jax.vmap(env.action_to_targets)(st, actions)
        sims = ma_mod.scene_step(
            env.model, st.sim, acts, ground_height=env.ground,
            num_agent_contacts=self.num_agent_contacts)
        st1 = dataclasses.replace(
            st, sim=sims, elapsed=st.elapsed + env.dt_con)
        st2, reward, done, info = jax.vmap(
            env.post_physics, in_axes=(0, 0, None))(
                st, st1, jnp.asarray(timesteps_total, jnp.float32))
        obs = self.observe(st2)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return st2, obs, reward, done, info
