"""Fused kinematics+dynamics Pallas kernel vs the XLA path.

The kernel unrolls ~10k statements; Pallas interpret mode on CPU takes
>25 min per invocation, so these tests only run when PHYSVAE_SLOW_KERNEL
is set.  The practical validation is ON-DEVICE: tools/compare_dyn_kernel.py
runs both paths Mosaic-compiled on the chip and diffs the outputs (part of
the A/B protocol before enabling use_fused_dynamics).
"""
import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsvae_tpu.kinematics import motion as motion_mod
from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.physics import dynamics as dyn
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod

CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"
BVH = "/root/reference/data/motion/loco/loco_hierarchy.bvh"


pytestmark = pytest.mark.skipif(
    not os.environ.get("PHYSVAE_SLOW_KERNEL"),
    reason="interpret-mode too slow on CPU; use tools/compare_dyn_kernel.py "
           "on-device")


@pytest.fixture(scope="module")
def setup():
    model = model_mod.load_loco_model()
    char = load_char_info(CHAR_INFO)
    m = motion_mod.from_bvh_file(BVH, char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    rng = np.random.RandomState(0)
    B = 3
    sts = state_mod.from_pose(
        model,
        jnp.asarray(np.tile(root_p, (B, 1)) + rng.randn(B, 3) * 0.1),
        jnp.stack([root_q] * B),
        jnp.stack([joint_q] * B))
    # random velocities make the bias force nontrivial
    sts = state_mod.SimState(
        sts.root_p, sts.root_q, sts.joint_q,
        jnp.asarray(rng.randn(B, model.nv).astype(np.float32)))
    return model, sts


def test_fused_matches_xla(setup):
    from physicsvae_tpu.ops.dyn_kernel import dynamics_terms_fused

    model, sts = setup
    k_ref = jax.vmap(lambda s: fk_mod._fk_xla(model, s))(sts)
    S_ref, I_ref, V_ref, c_ref = jax.vmap(
        lambda s, k: dyn.dynamics_terms_split(model, s, k))(sts, k_ref)
    x_ref = jax.vmap(
        lambda k: fk_mod.contact_point_positions(model, k)[0])(k_ref)

    k, S, I, V, c, x, sc = dynamics_terms_fused(model, sts,
                                             interpret=True)

    np.testing.assert_allclose(np.asarray(k.body_q),
                               np.asarray(k_ref.body_q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k.body_vcom),
                               np.asarray(k_ref.body_vcom), atol=1e-4)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(I), np.asarray(I_ref),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(V), np.asarray(V_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)


def test_lean_matches_xla(setup):
    """Lean (held-inverse warm substep) kernel: q/p/c/x identical to the
    full kernel's corresponding outputs."""
    from physicsvae_tpu.ops.dyn_kernel import (dynamics_terms_fused,
                                               dynamics_terms_fused_lean)

    model, sts = setup
    k_f, _, _, _, c_f, x_f, _ = dynamics_terms_fused(
        model, sts, interpret=True)
    k, c, x, _ = dynamics_terms_fused_lean(model, sts, interpret=True)
    assert k.body_com is None and k.body_w is None
    np.testing.assert_array_equal(np.asarray(k.body_q),
                                  np.asarray(k_f.body_q))
    np.testing.assert_array_equal(np.asarray(k.body_p),
                                  np.asarray(k_f.body_p))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_f))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_f))


def test_substep_with_fused_dynamics_interpret(setup, monkeypatch):
    """Full control step with use_fused_dynamics matches the XLA path."""
    import dataclasses

    import physicsvae_tpu.ops.dyn_kernel as dk
    orig = dk.dynamics_fused_fm
    monkeypatch.setattr(
        dk, "dynamics_fused_fm",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    model, sts = setup
    # zero velocities for a clean trajectory comparison
    sts = state_mod.SimState(sts.root_p + jnp.asarray([0.0, 1.0, 0.0]),
                             sts.root_q, sts.joint_q,
                             jnp.zeros_like(sts.vel))
    act = step_mod.hold_action(model, (sts.root_p.shape[0],))

    outs = {}
    for label, flag in (("xla", False), ("fused", True)):
        m2 = model_mod.load_loco_model(params=model_mod.SimParams(
            use_fused_dynamics=flag, matmul_bf16=False))
        step = jax.jit(jax.vmap(
            lambda s, a: step_mod.control_step(m2, s, a)))
        st = sts
        for _ in range(3):
            st = step(st, act)
        outs[label] = np.asarray(st.root_p)
    assert np.isfinite(outs["fused"]).all()
    np.testing.assert_allclose(outs["fused"], outs["xla"], atol=2e-3)
