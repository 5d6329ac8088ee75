"""Carried-inverse path (control_step_carry + per-frame reset table) must
reproduce the cold-factorization dynamics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsvae_tpu.env import make_env

SPEC = "/root/reference/data/spec/loco/loco_test.yaml"


@pytest.fixture(scope="module")
def envs():
    # Pin per-substep refinement: this suite validates the carried-inverse
    # SEEDING mechanism (table seed + f32 refinements == cold factorization).
    # Under the default held cadence (ns_refine_every=0) both paths hold
    # slightly different inverses for 15 substeps and the trajectories
    # drift apart at the intrinsic chaos rate instead of the solver
    # tolerance (that cadence is gated by tools/compare_hold_minv.py and
    # the fidelity laws, not by trajectory identity).
    carry = make_env(SPEC, project_dir="/root/reference",
                     physics_overrides={"ns_refine_every": 1})
    cold = make_env(SPEC, project_dir="/root/reference",
                    physics_overrides={"carry_minv": False,
                                       "ns_refine_every": 1})
    return carry, cold


def _roll(env, steps=10, B=4):
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    st = jax.jit(jax.vmap(env.reset))(rngs)
    step = jax.jit(jax.vmap(lambda s, a: env.step_core(s, a)[0]))
    a = jnp.zeros((B, env.dim_action))
    roots, vels = [], []
    for _ in range(steps):
        st = step(st, a)
        roots.append(np.asarray(st.sim.root_p))
        vels.append(np.asarray(st.sim.vel))
    return np.stack(roots), np.stack(vels)


def test_table_built_and_seeded(envs):
    carry, cold = envs
    assert carry._minv_table is not None
    assert cold._minv_table is None
    assert carry._minv_table.dtype == jnp.bfloat16
    st = carry.reset(jax.random.PRNGKey(1))
    assert st.minv is not None and st.minv.shape == (carry.model.nv,
                                                     carry.model.nv)
    st2 = cold.reset(jax.random.PRNGKey(1))
    assert st2.minv is None


def test_carry_matches_cold_trajectory(envs):
    carry, cold = envs
    r1, v1 = _roll(carry)
    r2, v2 = _roll(cold)
    # same RSI seeds -> same resets; dynamics agree to solver tolerance
    # (bf16 carried inverse vs exact factorization)
    np.testing.assert_allclose(r1, r2, atol=5e-3)
    assert np.isfinite(v1).all()
