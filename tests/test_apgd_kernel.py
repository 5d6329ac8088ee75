"""VMEM-resident Pallas APGD vs the XLA loop (interpret mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physicsvae_tpu.physics import contacts as contacts_mod


def _random_system(rng, B, K):
    R = 3 * K
    M = rng.randn(B, R, R).astype(np.float32)
    A = (M @ np.transpose(M, (0, 2, 1)) / R
         + 0.5 * np.eye(R)).astype(np.float32)
    n = rng.randn(B, K, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    ref = np.where(np.abs(n[..., 0:1]) < 0.9,
                   np.array([1.0, 0, 0], np.float32),
                   np.array([0.0, 1, 0], np.float32))
    t2 = np.cross(n, ref)
    t2 /= np.linalg.norm(t2, axis=-1, keepdims=True)
    t1 = np.cross(t2, n)
    b = rng.randn(B, K, 3).astype(np.float32)
    act = (rng.rand(B, K) > 0.3).astype(np.float32)
    mu = np.full((B, K), 0.8, np.float32)
    Af = A.reshape(B, R, R)
    L = np.abs(Af).sum(-1).reshape(B, K, 3).max(-1)
    inv_L = (1.0 / np.maximum(L, 1e-8)).astype(np.float32)
    lam0 = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    return (A.reshape(B, K, 3, K, 3), b, n, t1.astype(np.float32),
            t2.astype(np.float32), act, mu, inv_L, lam0)


@pytest.mark.parametrize("warm", [False, True])
def test_kernel_matches_xla(warm):
    from physicsvae_tpu.ops.apgd_kernel import apgd_solve

    rng = np.random.RandomState(0)
    B, K, iters = 7, 8, 10
    A, b, n, t1, t2, act, mu, inv_L, lam0 = map(
        jnp.asarray, _random_system(rng, B, K))
    ref = jax.vmap(lambda *xs: contacts_mod._apgd_xla(*xs, iters, warm))(
        A, b, n, t1, t2, act, mu, inv_L, lam0)
    # the kernel derives its Gershgorin steps in-kernel from the bf16 A
    out = apgd_solve(A, b, n, t1, t2, act, mu, lam0, iters, warm,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_env_step_with_pallas_apgd_interpret(monkeypatch):
    """Full contact path with use_pallas_apgd (interpret mode): trajectory
    matches the XLA solver closely over a short drop."""
    import physicsvae_tpu.ops.apgd_kernel as ak
    orig = ak.apgd_pallas_fm
    monkeypatch.setattr(
        ak, "apgd_pallas_fm",
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
    for label, flag in (("xla", False), ("pallas", True)):
        model = model_mod.load_loco_model(params=model_mod.SimParams(
            use_pallas_apgd=flag, matmul_bf16=False))
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
    assert np.isfinite(outs["pallas"]).all()
    np.testing.assert_allclose(outs["pallas"], outs["xla"], atol=5e-3)
