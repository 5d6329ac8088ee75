"""Tracking environment — the scene layer (reference L2).

Functional re-build of envs/env_humanoid_tracking.py's Env: owns the physics
model + ground, steps SPD-tracked characters, exposes falldown /
sim-divergence / out-of-ground checks and obstacle throwing.  The task-env
stack (env/imitation.py) builds on the same physics calls; this module
provides the standalone surface for users of the reference's tracking env
(its __main__ smoke test drove exactly this API,
envs/env_humanoid_tracking.py:598-675).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..kinematics.char_info import load_char_info
from ..kinematics.urdf import load_urdf
from ..physics import fk as fk_mod
from ..physics import model as model_mod
from ..physics import obstacles as obs_mod
from ..physics import state as state_mod
from ..physics import step as step_mod
from .ground import Heightmap, check_out_of_ground, ground_height_at


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrackingState:
    sim: state_mod.SimState
    obstacles: obs_mod.ObstacleState
    elapsed: Any
    episode_len: Any

    def tree_flatten(self):
        return (self.sim, self.obstacles, self.elapsed, self.episode_len), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


class TrackingEnv:
    """Single-character tracking scene (num_agent == 1 — the only
    configuration the reference pipeline exercises)."""

    def __init__(self, char_info_file: str, sim_char_file: str,
                 fps_sim: int = 480, fps_con: int = 30,
                 num_obstacle_slots: int = 4,
                 heightmap: Optional[Heightmap] = None,
                 ground_size=(100.0, 100.0, 10.0),
                 falldown_method: str = "height",
                 falldown_height_min: float = 0.3,
                 num_agent: int = 1):
        ci = load_char_info(char_info_file)
        cm = load_urdf(sim_char_file)
        params = model_mod.SimParams(fps_sim=fps_sim, fps_con=fps_con)
        self.model = model_mod.build_model(cm, ci, params)
        self.char_info = ci
        self.num_obstacle_slots = num_obstacle_slots
        self.heightmap = heightmap
        self.ground_size = ground_size
        self.falldown_method = falldown_method
        self.falldown_height_min = falldown_height_min
        self.dt_con = 1.0 / fps_con
        # num_agent > 1: characters share ONE world and physically interact
        # through the coupled inter-agent contact solve
        # (envs/env_humanoid_tracking.py:181-209; physics/multi_agent.py).
        # reset() then expects agent-stacked (N,...) pose arrays, and
        # obstacles are per-scene (not yet coupled in multi-agent scenes).
        self.num_agent = num_agent

    # -- lifecycle -------------------------------------------------------

    def reset(self, root_p, root_q, joint_q, root_v=None, root_w=None,
              joint_w=None, time: float = 0.0) -> TrackingState:
        """Reset from an explicit pose (reference reset(poses=...),
        envs/env_humanoid_tracking.py:415-438)."""
        sim = state_mod.from_pose(self.model, root_p, root_q, joint_q,
                                  root_v, root_w, joint_w)
        batch = sim.batch_shape
        # multi-agent scenes share ONE obstacle pool (one world, reference
        # envs/env_humanoid_tracking.py:181-209): drop the agent axis
        pool_batch = batch[1:] if self.num_agent > 1 else batch
        return TrackingState(
            sim=sim,
            obstacles=obs_mod.init_pool(self.num_obstacle_slots, pool_batch),
            elapsed=jnp.full(batch, time, jnp.float32),
            episode_len=jnp.zeros(batch, jnp.float32),
        )

    def step(self, st: TrackingState,
             action: Optional[step_mod.Action] = None) -> TrackingState:
        """One control step: num_substeps x {actuate; integrate} + obstacle
        update (envs/env_humanoid_tracking.py:375-413)."""
        action = action if action is not None else step_mod.hold_action(
            self.model, st.sim.batch_shape)
        # Contacts resolve against the configured terrain, not flat 0.0
        # (ImitationEnv threads its ground the same way).
        ground = self.heightmap if self.heightmap is not None else 0.0
        if self.num_agent > 1:
            from ..physics import multi_agent
            sim, obstacles = multi_agent.scene_step(
                self.model, st.sim, action, ground_height=ground,
                obstacles=st.obstacles)
        else:
            sim, obstacles = step_mod.control_step(self.model, st.sim,
                                                   action,
                                                   ground_height=ground,
                                                   obstacles=st.obstacles)
        return TrackingState(
            sim=sim, obstacles=obstacles,
            elapsed=st.elapsed + self.dt_con,
            episode_len=st.episode_len + self.dt_con)

    # -- queries ---------------------------------------------------------

    def ground_height(self, st: TrackingState):
        p = st.sim.root_p
        return ground_height_at(
            jnp.stack([p[..., 0], p[..., 2]], axis=-1), self.heightmap)

    def check_falldown(self, st: TrackingState):
        """By height or by disallowed-link ground collision
        (envs/env_humanoid_tracking.py:268-293)."""
        if self.falldown_method == "height":
            up = jnp.asarray(self.model.v_up_env)
            h = jnp.einsum("...i,i->...", st.sim.root_p, up) \
                - self.ground_height(st)
            return h < self.falldown_height_min
        dis, _ = step_mod.check_ground_contact(self.model, st.sim)
        return dis

    def check_sim_divergence(self, st: TrackingState):
        finite = jnp.isfinite(st.sim.vel).all(axis=-1) & \
            jnp.isfinite(st.sim.root_p).all(axis=-1)
        return ~finite | (jnp.abs(st.sim.vel).max(axis=-1) > 1e4)

    def check_out_of_ground(self, st: TrackingState):
        return check_out_of_ground(st.sim.root_p, self.ground_size)

    def throw_obstacle(self, st: TrackingState, rng,
                       size=None) -> TrackingState:
        pool = obs_mod.throw(st.obstacles, rng, st.sim.root_p,
                             jnp.asarray(self.model.v_up_env))
        return dataclasses.replace(st, obstacles=pool)

    def get_render_data(self, st: TrackingState):
        """World link poses for exporters (get_render_data parity,
        envs/env_humanoid_tracking.py:488-527)."""
        k = fk_mod.fk(self.model, st.sim)
        return k.body_q, k.body_p
