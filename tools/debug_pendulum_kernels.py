#!/usr/bin/env python
"""Isolate which opt-in Pallas kernel breaks pendulum energy conservation.

Runs the test_fidelity.py::test_pendulum_energy_conserved rollout under
four kernel configs and prints max energy drift for each.  Run on TPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics.urdf import load_urdf
from physicsvae_tpu.maths import quaternion as quat
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "assets")


def drift_for(fused, apgd):
    cm = load_urdf(os.path.join(ASSETS, "pendulum.urdf"))
    ci = load_char_info(os.path.join(ASSETS, "pendulum_char_info.py"))
    p = model_mod.SimParams(actuation="none", joint_damping=0.0,
                            self_collision=False,
                            use_fused_dynamics=fused, use_pallas_apgd=apgd)
    model = model_mod.build_model(cm, ci, p)
    theta0 = 0.5
    jq = jnp.zeros((model.num_joints, 4)).at[:, 3].set(1.0).at[0].set(
        quat.from_axis_angle(jnp.asarray([0.0, 0.0, theta0])))
    st = state_mod.from_pose(model, jnp.asarray([0.0, 2.0, 0.0]),
                             jnp.asarray([0.0, 0.0, 0.0, 1.0]), jq)
    hold = step_mod.Action(
        target_q=jnp.zeros((model.num_joints, 4)).at[:, 3].set(1.0),
        target_w=jnp.zeros((model.num_joints, 3)),
        root_force=jnp.asarray([0.0, 9.8 * model.total_mass, 0.0]))
    step = jax.jit(lambda s: step_mod.control_step(model, s, hold))

    def energy(st):
        k = fk_mod.fk(model, st)
        m = jnp.asarray(model.mass)
        ke = 0.5 * jnp.sum(m * jnp.sum(k.body_vcom ** 2, axis=-1))
        R = quat.to_matrix(k.body_q)
        I_w = jnp.einsum("...ij,...jk,...lk->...il", R,
                         jnp.asarray(model.inertia), R)
        ke += 0.5 * jnp.sum(jnp.einsum("...i,...ij,...j->...",
                                       k.body_w, I_w, k.body_w))
        pe = 9.8 * jnp.sum(m * k.body_com[..., 1])
        return float(ke + pe)

    e0 = energy(st)
    drift = 0.0
    for i in range(60):
        st = step(st)
        drift = max(drift, abs(energy(st) - e0))
        if i == 2 and drift > 100:
            break  # already blown; no need to run on
    # also report rod angle and base velocity magnitude for diagnosis
    return drift, float(jnp.abs(st.vel[:3]).max()), \
        float(jnp.abs(st.vel[6:]).max())


for fused, apgd in [(False, False), (True, False), (False, True),
                    (True, True)]:
    d, bv, jw = drift_for(fused, apgd)
    print(f"fused={fused!s:5} apgd={apgd!s:5}  drift={d:12.4f}  "
          f"|base v|max={bv:10.6f}  |joint w|max={jw:10.6f}", flush=True)
