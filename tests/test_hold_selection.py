"""Held contact-SELECTION cadence (SimParams.hold_selection).

Semantics contract: only the top-K slot IDENTITY (which candidate point /
self-collision pair occupies which contact slot) is pinned across the
warm substeps of one control step; positions, depths, normals, the
Jacobian, and the M^-1 action are rebuilt fresh from the current state
every substep.  With a rebuild every substep (hold_selection_every=1) the
path must therefore reproduce the standard per-substep path exactly; at
the default cadence it must stay finite and physically close over a
contact-rich rollout (the on-chip chaos gate lives in
tools/compare_hold_contacts.py --mode hold_selection).

Reference hot loop being replaced: envs/env_humanoid_tracking.py:393-399
(Bullet re-runs narrow phase + ranking every substep).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import contacts as contacts_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics import step as step_mod


def _loco(**over):
    return model_mod.load_loco_model(params=model_mod.SimParams(**over))


def _scramble_state(model, B, seed=0):
    rng = np.random.RandomState(seed)
    root_p = jnp.asarray(
        rng.uniform([-0.5, 0.35, -0.5], [0.5, 0.9, 0.5],
                    (B, 3)).astype(np.float32))
    q = rng.normal(size=(B, 4)).astype(np.float32)
    root_q = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    J = model.num_joints
    jq = rng.normal(scale=0.3, size=(B, J, 4)).astype(np.float32)
    jq[..., 3] += 1.0
    jq = jq / np.linalg.norm(jq, axis=-1, keepdims=True)
    vel = jnp.asarray(
        rng.normal(scale=0.4, size=(B, model.nv)).astype(np.float32))
    return state_mod.SimState(root_p, root_q, jnp.asarray(jq), vel)


def _rollout(model, st, steps=4):
    J = model.num_joints
    B = st.root_p.shape[0]
    act = step_mod.Action(
        target_q=jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]),
                                  (B, J, 4)),
        target_w=jnp.zeros((B, J, 3)))

    @jax.jit
    def run(st):
        def body(carry, _):
            s = jax.vmap(
                lambda s, a: step_mod.control_step(model, s, a))(carry, act)
            return s, (s.root_p, s.vel)
        return jax.lax.scan(body, st, None, length=steps)

    _, (ps, vs) = run(st)
    return np.asarray(ps), np.asarray(vs)


def test_every1_matches_baseline():
    """Cadence 1 = rebuild every substep = the standard path exactly
    (selection, operator, and warm-start chains all coincide)."""
    base = _loco(hold_selection=False)
    hs1 = _loco(hold_selection=True, hold_selection_every=1)
    st = _scramble_state(base, B=8)
    p_b, v_b = _rollout(base, st, steps=3)
    p_h, v_h = _rollout(hs1, st, steps=3)
    # identical dense solves modulo warm-start bookkeeping reassembly
    assert np.allclose(p_b, p_h, atol=1e-5), np.abs(p_b - p_h).max()
    assert np.allclose(v_b, v_h, atol=1e-3), np.abs(v_b - v_h).max()


def test_default_cadence_finite_and_close():
    base = _loco(hold_selection=False)
    hs = _loco(hold_selection=True)
    st = _scramble_state(base, B=8, seed=1)
    p_b, v_b = _rollout(base, st, steps=4)
    p_h, v_h = _rollout(hs, st, steps=4)
    # The seed-1 scramble is violent enough that some rows diverge on the
    # STANDARD path too (verified: baseline row 6 NaNs at the first
    # control step); the cadence is only required to stay finite and
    # close where the underlying dynamics do.
    ok = np.isfinite(p_b).all(axis=(0, 2)) & np.isfinite(v_b).all(axis=(0, 2))
    assert ok.sum() >= 6, f"baseline itself diverged on {8 - ok.sum()} rows"
    assert np.isfinite(p_h[:, ok]).all() and np.isfinite(v_h[:, ok]).all()
    # 4 control steps = 64 substeps of a contact scramble: bounded drift
    assert np.abs(p_h[:, ok] - p_b[:, ok]).max() < 0.05, \
        np.abs(p_h[:, ok] - p_b[:, ok]).max()


def test_held_sel_from_matches_selection():
    """The HeldSelection extracted at the rebuild substep must carry the
    same indices/bodies the selection chose."""
    model = _loco(hold_selection=True)
    st = _scramble_state(model, B=8, seed=2)
    k = jax.vmap(lambda s: fk_mod.fk(model, s))(st)
    x, _ = jax.vmap(lambda kk: fk_mod.contact_point_positions(model, kk))(k)
    depth = contacts_mod.detect_ground(model, x, 0.0)
    cons, _ = jax.vmap(
        lambda xx, dd: contacts_mod.select_contacts_oh(model, xx, dd))(
            x, depth)

    act = step_mod.hold_action(model, batch_shape=(8,))
    _, _, _, held = jax.vmap(
        lambda s, a: step_mod._substep_hsel_first(model, s, a, None))(
            st, act)
    assert np.array_equal(np.asarray(held.g_idx), np.asarray(cons.point_idx))
    assert np.array_equal(np.asarray(held.g_body), np.asarray(cons.body))
    if model.self_pairs.shape[0] > 0 and model.params.self_collision:
        pairs = np.asarray(model.self_pairs)
        si = np.asarray(held.s_idx)
        assert np.array_equal(np.asarray(held.s_bi), pairs[si, 0])
        assert np.array_equal(np.asarray(held.s_bj), pairs[si, 1])
    assert held.invL.shape[-1] == np.asarray(
        np.shape(held.g_idx))[-1] + (held.s_idx.shape[-1]
                                     if held.s_idx is not None else 0)


def test_warm_substep_uses_fresh_geometry():
    """A warm substep against a translated state must see the NEW
    penetration depths (fresh geometry), unlike the held-operator
    cadence which only refreshed depths through stale slot positions."""
    model = _loco(hold_selection=True)
    st = _scramble_state(model, B=4, seed=3)
    act = step_mod.hold_action(model, batch_shape=(4,))
    st1, Minv, lam, held = jax.vmap(
        lambda s, a: step_mod._substep_hsel_first(model, s, a, None))(
            st, act)
    # drop everything 5 cm: depths must increase by ~0.05 in the gathered
    # slots of the warm substep's solve (probe via the public gather path)
    st_drop = state_mod.SimState(
        st1.root_p - jnp.asarray([0.0, 0.05, 0.0]), st1.root_q,
        st1.joint_q, st1.vel)

    def gather_depth(s):
        k = fk_mod.fk(model, s)
        x, _ = fk_mod.contact_point_positions(model, k)
        depth = contacts_mod.detect_ground(model, x, 0.0)
        NP_ = depth.shape[-1]
        return depth

    d0 = jax.vmap(gather_depth)(st1)
    d1 = jax.vmap(gather_depth)(st_drop)
    ohg = np.eye(d0.shape[-1])[np.asarray(held.g_idx)]
    g0 = (ohg * np.asarray(d0)[:, None, :]).sum(-1)
    g1 = (ohg * np.asarray(d1)[:, None, :]).sum(-1)
    assert np.allclose(g1 - g0, 0.05, atol=1e-5)
