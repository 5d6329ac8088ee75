"""Pallas FK kernel vs the XLA FK reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.ops.fk_kernel import HAS_PALLAS, fk_pallas
from physicsvae_tpu.maths import quaternion as quat


@pytest.fixture(scope="module")
def model():
    return model_mod.load_loco_model()


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fk_kernel_matches_xla(model):
    rng = np.random.default_rng(0)
    B = 7  # deliberately not a lane multiple (tests padding)
    root_p = jnp.asarray(rng.normal(size=(B, 3)) + np.array([0, 1.5, 0]),
                         jnp.float32)
    root_q = quat.normalize(jnp.asarray(rng.normal(size=(B, 4)), jnp.float32))
    joint_q = quat.normalize(
        jnp.asarray(rng.normal(size=(B, model.num_joints, 4)), jnp.float32))
    fixed = ~np.asarray(model.movable)
    joint_q = joint_q.at[:, fixed].set(jnp.asarray([0.0, 0, 0, 1]))
    vel = jnp.asarray(rng.normal(size=(B, model.nv)) * 0.5, jnp.float32)
    st = state_mod.SimState(root_p, root_q, joint_q, vel)

    k_ref = jax.vmap(lambda s: fk_mod.fk(model, s))(st)
    k_pal = fk_pallas(model, st, interpret=True)

    for name in ["body_q", "body_p", "body_com", "body_w", "body_vcom",
                 "body_vo", "dof_axis", "dof_pos"]:
        a = np.asarray(getattr(k_ref, name))
        b = np.asarray(getattr(k_pal, name))
        assert np.allclose(a, b, atol=2e-4), (name, np.abs(a - b).max())
