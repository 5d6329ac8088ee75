"""Matrix-free Pallas APGD vs the dense reference (interpret mode on CPU).

The MF warm solve must reproduce the dense solve's fixed point: same
cone QP, same warm start, same carried step sizes — only the operator
application is matrix-free (ops/apgd_mf_kernel.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsvae_tpu.physics import contacts as contacts_mod


def _random_mf_system(rng, B, K, nv):
    """Random SPD M^-1 + random Jacobian — a generic contact system."""
    Q = rng.randn(B, nv, nv).astype(np.float32)
    Minv = (Q @ np.transpose(Q, (0, 2, 1)) / nv
            + 0.5 * np.eye(nv)).astype(np.float32)
    J = (rng.randn(B, K, 3, nv) * 0.5).astype(np.float32)
    v_pred = rng.randn(B, nv).astype(np.float32)
    bias = (rng.rand(B, K) * -0.5).astype(np.float32)
    n = rng.randn(B, K, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t1, t2 = contacts_mod.cone_basis(jnp.asarray(n), jnp.float32)
    act = (rng.rand(B, K) > 0.3).astype(np.float32)
    mu = np.full((B, K), 0.8, np.float32)
    Jf = J.reshape(B, 3 * K, nv)
    A = Jf @ Minv @ np.transpose(Jf, (0, 2, 1))
    L = np.abs(A).sum(-1).reshape(B, K, 3).max(-1)
    invL = (0.9 / np.maximum(L, 1e-8)).astype(np.float32)
    lam0 = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    return (Minv, J, v_pred, bias, n, np.asarray(t1), np.asarray(t2),
            act, mu, invL, lam0)


def test_mf_kernel_matches_dense_fallback():
    """Kernel (interpret) == the custom_vmap unbatched fallback, which is
    itself the dense solve_contacts math."""
    from physicsvae_tpu.ops.apgd_mf_kernel import apgd_mf_solve

    rng = np.random.RandomState(3)
    B, K, nv, iters = 5, 6, 20, 8
    args = tuple(map(jnp.asarray, _random_mf_system(rng, B, K, nv)))
    dispatch = contacts_mod._apgd_mf_dispatch(K, nv, iters)
    # unbatched calls run the dense fallback; loop envs to build the ref
    dv_ref = []
    lam_ref = []
    for b in range(B):
        per_env = tuple(a[b] for a in args)
        dv_b, lam_b = dispatch(*per_env)
        dv_ref.append(np.asarray(dv_b))
        lam_ref.append(np.asarray(lam_b))
    dv_ref, lam_ref = np.stack(dv_ref), np.stack(lam_ref)
    dv, lam = apgd_mf_solve(*args, iters, interpret=True)
    # the fallback's matvec rounds through bf16 (matching the dense
    # kernel); the MF kernel iterates in f32 — tolerance covers bf16
    # rounding accumulated over `iters` steps
    np.testing.assert_allclose(np.asarray(lam), lam_ref,
                               atol=3e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(dv), dv_ref,
                               atol=6e-3, rtol=2e-2)


def test_mf_matches_dense_solve_contacts():
    """solve_contacts_mf's fallback path == solve_contacts on identical
    warm inputs (same fixed point; XLA solver on both sides), run with
    enough iterations that the carried-invL conditioning difference is
    converged away."""
    import dataclasses

    from physicsvae_tpu.physics.model import load_loco_model, SimParams

    model = load_loco_model(params=SimParams(
        matmul_bf16=False, apgd_warm_iters=60))
    rng = np.random.RandomState(7)
    nv = model.nv
    K = 6
    (Minv, J, v_pred, bias, n, t1, t2, act, mu, invL, lam0) = \
        _random_mf_system(rng, 2, K, nv)
    depth = -bias * model.params.dt_sim / model.params.baumgarte \
        + model.params.contact_slop
    cons = contacts_mod.Contacts(
        pos=jnp.zeros((2, K, 3)), depth=jnp.asarray(depth),
        active=jnp.asarray(act) > 0.5,
        body=jnp.zeros((2, K), jnp.int32),
        point_idx=jnp.zeros((2, K), jnp.int32))
    dv_dense, lam_dense = contacts_mod.solve_contacts(
        model, jnp.asarray(Minv), jnp.asarray(J), jnp.asarray(v_pred),
        cons, model.params.dt_sim, normals=jnp.asarray(n),
        mu=jnp.asarray(mu), lam_warm=jnp.asarray(lam0))
    # the MF fallback is per-env (custom_vmap unbatched branch)
    dv_mf, lam_mf = [], []
    for b in range(2):
        dv_b, lam_b = contacts_mod.solve_contacts_mf(
            model, jnp.asarray(Minv[b]), jnp.asarray(J[b]),
            jnp.asarray(v_pred[b]), cons.depth[b], cons.active[b],
            model.params.dt_sim, jnp.asarray(lam0[b]),
            jnp.asarray(invL[b]), jnp.asarray(n[b]), jnp.asarray(mu[b]))
        dv_mf.append(np.asarray(dv_b))
        lam_mf.append(np.asarray(lam_b))
    dv_mf, lam_mf = np.stack(dv_mf), np.stack(lam_mf)
    np.testing.assert_allclose(np.asarray(lam_mf), np.asarray(lam_dense),
                               atol=3e-3, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(dv_mf), np.asarray(dv_dense),
                               atol=5e-3, rtol=3e-2)


def test_control_step_mf_matches_generic(monkeypatch):
    """Full control_step with use_mf_apgd (interpret-mode kernel, other
    kernels off) stays close to the generic XLA path over a short drop —
    the MF path changes dataflow, not physics."""
    import physicsvae_tpu.ops.apgd_mf_kernel as mfk
    orig = mfk.apgd_mf_fm
    monkeypatch.setattr(
        mfk, "apgd_mf_fm",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    from physicsvae_tpu.kinematics import motion as motion_mod
    from physicsvae_tpu.kinematics.char_info import load_char_info
    from physicsvae_tpu.physics import model as model_mod
    from physicsvae_tpu.physics import state as state_mod
    from physicsvae_tpu.physics import step as step_mod

    CHAR_INFO = "/root/reference/data/character/info/loco_char_info.py"
    BVH = "/root/reference/data/motion/loco/loco_hierarchy.bvh"
    char = load_char_info(CHAR_INFO)
    m = motion_mod.from_bvh_file(BVH, char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)

    outs = {}
    for label, flag in (("xla", False), ("mf", True)):
        if flag:
            # only the MF kernel may fire on this CPU run
            monkeypatch.setattr(step_mod, "kernels_on_tpu", lambda: True)
        else:
            monkeypatch.setattr(step_mod, "kernels_on_tpu", lambda: False)
        model = model_mod.load_loco_model(params=model_mod.SimParams(
            use_mf_apgd=flag, use_pallas_apgd=False,
            use_fused_dynamics=False, use_pallas_fk=False,
            matmul_bf16=False))
        st = state_mod.from_pose(
            model, jnp.stack([root_p.at[1].set(0.9)] * 2),
            jnp.stack([root_q] * 2), jnp.stack([joint_q] * 2))
        act = step_mod.Action(
            target_q=jnp.stack([joint_q] * 2),
            target_w=jnp.zeros((2, model.num_joints, 3)))
        step = jax.jit(jax.vmap(
            lambda s, a: step_mod.control_step(model, s, a)))
        for _ in range(5):
            st = step(st, act)
        outs[label] = np.asarray(st.root_p)
    assert np.isfinite(outs["mf"]).all()
    np.testing.assert_allclose(outs["mf"], outs["xla"], atol=5e-3)
