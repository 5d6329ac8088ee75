"""Fast interpret-mode checks of the fused dynamics kernel variants on the
tiny pendulum fixture (2 bodies — the loco-model interpret tests in
test_dyn_kernel.py unroll ~10k statements and are PHYSVAE_SLOW_KERNEL-gated;
this one runs in seconds and always gates the kernel-generation code)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from physicsvae_tpu.kinematics.char_info import load_char_info
from physicsvae_tpu.kinematics.urdf import load_urdf
from physicsvae_tpu.physics import dynamics as dyn
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _pendulum():
    cm = load_urdf(os.path.join(ASSETS, "pendulum.urdf"))
    ci = load_char_info(os.path.join(ASSETS, "pendulum_char_info.py"))
    p = model_mod.SimParams(actuation="none", joint_damping=0.0,
                            self_collision=False)
    return model_mod.build_model(cm, ci, p)


def _batched_state(model, B=3):
    rng = np.random.RandomState(0)
    J = model.num_joints
    jq = jnp.zeros((B, J, 4)).at[..., 3].set(1.0)
    st = state_mod.from_pose(
        model, jnp.asarray(rng.randn(B, 3) * 0.1 + np.array([0, 1.5, 0])),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 4)), jq)
    return state_mod.SimState(
        st.root_p, st.root_q, st.joint_q,
        jnp.asarray(rng.randn(B, model.nv).astype(np.float32)))


def test_full_and_lean_match_xla():
    from physicsvae_tpu.ops.dyn_kernel import (dynamics_terms_fused,
                                               dynamics_terms_fused_lean)

    model = _pendulum()
    sts = _batched_state(model)

    k_ref = jax.vmap(lambda s: fk_mod._fk_xla(model, s))(sts)
    S_r, I_r, V_r, c_r = jax.vmap(
        lambda s, k: dyn.dynamics_terms_split(model, s, k))(sts, k_ref)
    x_r = jax.vmap(
        lambda k: fk_mod.contact_point_positions(model, k)[0])(k_ref)

    k_f, S, I, V, c_f, x_f, sc = dynamics_terms_fused(
        model, sts, interpret=True)
    assert sc is None  # pendulum: no self pairs
    np.testing.assert_allclose(np.asarray(k_f.body_q),
                               np.asarray(k_ref.body_q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(I), np.asarray(I_r),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r), atol=1e-5)

    k, c, x, _ = dynamics_terms_fused_lean(model, sts, interpret=True)
    assert k.body_com is None and k.body_w is None and k.body_vcom is None
    np.testing.assert_array_equal(np.asarray(k.body_q),
                                  np.asarray(k_f.body_q))
    np.testing.assert_array_equal(np.asarray(k.body_p),
                                  np.asarray(k_f.body_p))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_f))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_f))


def test_fused_spd_matches_xla():
    """Lean kernel with in-kernel stable-PD torque: the tmc output matches
    spd_torque(...) - c from the XLA path."""
    import dataclasses

    from physicsvae_tpu.physics import step as step_mod
    from physicsvae_tpu.ops.dyn_kernel import dynamics_terms_fused_lean

    base = _pendulum()
    model = dataclasses.replace(
        base,
        params=dataclasses.replace(base.params, actuation="spd"),
        kp=np.full(base.nv, 40.0, np.float32),
        kd=np.full(base.nv, 4.0, np.float32),
        max_force=np.full(base.nv, 25.0, np.float32),
        damping=np.full(base.nv, 0.05, np.float32))
    sts = _batched_state(model)
    rng = np.random.RandomState(1)
    J = model.num_joints
    B = sts.root_p.shape[0]
    tq = rng.randn(B, J, 4).astype(np.float32)
    tq /= np.linalg.norm(tq, axis=-1, keepdims=True)
    tq = jnp.asarray(tq)
    tw = jnp.asarray(rng.randn(B, J, 3).astype(np.float32) * 0.3)

    act = step_mod.Action(target_q=tq, target_w=tw)
    k_ref = jax.vmap(lambda s: fk_mod._fk_xla(model, s))(sts)
    _, _, _, c_ref = jax.vmap(
        lambda s, k: dyn.dynamics_terms_split(model, s, k))(sts, k_ref)
    tau_ref = step_mod.spd_torque(model, sts, act, model.params.dt_sim)
    tmc_ref = tau_ref - c_ref

    _, tmc, _, _ = dynamics_terms_fused_lean(model, sts, tq, tw,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(tmc), np.asarray(tmc_ref),
                               atol=1e-4, rtol=1e-5)


def test_control_step_fused_spd_wiring(monkeypatch):
    """Full vmapped control_step through the lean+SPD kernel branch
    (kernels_on_tpu monkeypatched true, interpret mode) matches the XLA
    path — exercises the custom_vmap dispatch and the held-inverse
    substep wiring end-to-end."""
    import dataclasses

    import physicsvae_tpu.ops.dyn_kernel as dk
    from physicsvae_tpu.physics import step as step_mod

    orig = dk.dynamics_fused_fm
    monkeypatch.setattr(
        dk, "dynamics_fused_fm",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    def build(fused):
        base = _pendulum()
        return dataclasses.replace(
            base,
            params=dataclasses.replace(
                base.params, actuation="spd", use_fused_dynamics=fused,
                use_pallas_fk=False, use_pallas_apgd=False,
                matmul_bf16=False, ns_refine_every=0),
            kp=np.full(base.nv, 40.0, np.float32),
            kd=np.full(base.nv, 4.0, np.float32),
            max_force=np.full(base.nv, 25.0, np.float32))

    outs = {}
    for label, fused in (("xla", False), ("fused", True)):
        model = build(fused)
        if fused:
            monkeypatch.setattr(step_mod, "kernels_on_tpu", lambda: True)
        sts = _batched_state(model)
        sts = type(sts)(sts.root_p, sts.root_q, sts.joint_q,
                        0.1 * sts.vel)
        act = step_mod.hold_action(model, (sts.root_p.shape[0],))
        step = jax.vmap(lambda s, a: step_mod.control_step(model, s, a))
        st = step(sts, act)
        outs[label] = np.asarray(st.root_p)
        if fused:
            monkeypatch.setattr(step_mod, "kernels_on_tpu",
                                lambda: False)
    assert np.isfinite(outs["fused"]).all()
    np.testing.assert_allclose(outs["fused"], outs["xla"], atol=1e-4)


def _chain():
    cm = load_urdf(os.path.join(ASSETS, "chain4.urdf"))
    ci = load_char_info(os.path.join(ASSETS, "chain4_char_info.py"))
    p = model_mod.SimParams(actuation="none", joint_damping=0.0,
                            self_collision=True, num_self_contacts=2)
    return model_mod.build_model(cm, ci, p)


def test_self_narrow_phase_in_kernel():
    """In-kernel capsule-capsule narrow phase (fuse_self_narrow) matches
    self_collision.self_pair_features on a bent 4-link chain whose
    non-adjacent capsules genuinely overlap."""
    from physicsvae_tpu.ops.dyn_kernel import dynamics_terms_fused_lean
    from physicsvae_tpu.physics.self_collision import self_pair_features

    model = _chain()
    assert model.self_pairs.shape[0] == 3, model.self_pairs

    # fold the chain back on itself so seg3 overlaps the base capsule
    rng = np.random.RandomState(0)
    B = 3
    half = 1.0 / np.sqrt(2.0)
    bend = jnp.asarray([half, 0.0, 0.0, half])  # 90 deg about x
    jq = jnp.broadcast_to(bend, (B, model.num_joints, 4))
    st = state_mod.from_pose(
        model,
        jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.05
                    + np.array([0, 1.5, 0], np.float32)),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 4)), jq)
    st = state_mod.SimState(
        st.root_p, st.root_q, st.joint_q,
        jnp.asarray(rng.randn(B, model.nv).astype(np.float32) * 0.1))

    k_ref = jax.vmap(lambda s: fk_mod._fk_xla(model, s))(st)
    pos_r, nrm_r, dep_r = jax.vmap(
        lambda k: self_pair_features(model, k))(k_ref)

    k, c, x, sc = dynamics_terms_fused_lean(model, st, interpret=True)
    assert sc is not None
    pos, nrm, dep = sc
    # the fold must actually produce at least one overlapping pair,
    # otherwise the depth/normal comparison is vacuous
    assert float(np.max(np.asarray(dep_r))) > 0.0
    np.testing.assert_allclose(np.asarray(dep), np.asarray(dep_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm), np.asarray(nrm_r),
                               atol=1e-4)
    # closest-POINT comparison only where it is unique: for (near-)
    # parallel segments any point along the overlap is equally valid and
    # the two implementations may branch differently on the denom
    # threshold (dist/depth/normal still agree above).
    pairs = np.asarray(model.self_pairs)
    wa = np.asarray(k_ref.body_p) + _rot(np.asarray(k_ref.body_q),
                                         np.asarray(model.cap_a))
    wb = np.asarray(k_ref.body_p) + _rot(np.asarray(k_ref.body_q),
                                         np.asarray(model.cap_b))
    d1 = wb[:, pairs[:, 0]] - wa[:, pairs[:, 0]]
    d2 = wb[:, pairs[:, 1]] - wa[:, pairs[:, 1]]
    parallel = np.linalg.norm(np.cross(d1, d2), axis=-1) < 1e-3
    dp = np.abs(np.asarray(pos) - np.asarray(pos_r)).max(axis=-1)
    assert (dp[~parallel] < 1e-5).all(), dp


def _rot(q, v):
    """Rotate per-body local vectors v (NB,3) by body quats q (B,NB,4)."""
    from physicsvae_tpu.maths import quaternion as quat
    return np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
