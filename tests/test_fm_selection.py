"""Feature-major contact selection (select-then-transpose path).

The fused-selection dispatch (physics/step._fused_dynamics_sel) keeps the
dynamics kernel's candidate rows in their native (rows, batch-lanes)
layout through detection, top-K ranking, and the one-hot gathers, and
transposes only the K winners.  These tests pin the feature-major helpers
to the batch-major originals EXACTLY (same ranking formula, exact one-hot
gathers): selections must be bit-identical, so the fused-selection flag
cannot move the physics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.physics import contacts as contacts_mod
from physicsvae_tpu.physics import fk as fk_mod
from physicsvae_tpu.physics import model as model_mod
from physicsvae_tpu.physics import state as state_mod
from physicsvae_tpu.physics.linalg import (topk_rank, topk_rank_2stage,
                                           topk_rank_2stage_fm,
                                           topk_rank_fm)
from physicsvae_tpu.physics.self_collision import (select_self_contacts_oh,
                                                   select_self_contacts_fm,
                                                   self_pair_features)


@pytest.fixture(scope="module")
def model():
    return model_mod.load_loco_model()


@pytest.fixture(scope="module")
def batched_state(model):
    """A batch of randomized humanoid poses (some limbs near the ground /
    each other so contacts are plausible)."""
    rng = np.random.RandomState(3)
    B = 32
    root_p = jnp.asarray(
        rng.uniform([-1, 0.2, -1], [1, 1.0, 1], (B, 3)).astype(np.float32))
    q = rng.normal(size=(B, 4)).astype(np.float32)
    root_q = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    J = model.num_joints
    jq = rng.normal(scale=0.4, size=(B, J, 4)).astype(np.float32)
    jq[..., 3] += 1.0
    jq = jq / np.linalg.norm(jq, axis=-1, keepdims=True)
    vel = jnp.asarray(rng.normal(scale=0.5,
                                 size=(B, model.nv)).astype(np.float32))
    return state_mod.SimState(root_p, root_q, jnp.asarray(jq), vel)


def test_topk_fm_matches_batch_major():
    rng = np.random.RandomState(0)
    for P, K in [(75, 16), (263, 8), (13, 4)]:
        x = jnp.asarray(rng.randn(64, P).astype(np.float32))
        x = x.at[:, 3].set(x[:, 7])  # inject ties: same rank rule?
        v, i, oh = jax.vmap(lambda xx: topk_rank(xx, K))(x)
        vf, idxf, ohf = topk_rank_fm(x.T, K)
        assert np.array_equal(np.asarray(v), np.asarray(vf.T))
        assert np.array_equal(np.asarray(i), np.asarray(idxf.T))
        assert np.array_equal(np.asarray(oh),
                              np.asarray(jnp.transpose(ohf, (2, 0, 1))))
        v2, i2, oh2 = jax.vmap(lambda xx: topk_rank_2stage(xx, K))(x)
        v2f, i2f, oh2f = topk_rank_2stage_fm(x.T, K)
        assert np.array_equal(np.asarray(v2), np.asarray(v2f.T))
        assert np.array_equal(np.asarray(i2), np.asarray(i2f.T))
        assert np.array_equal(np.asarray(oh2),
                              np.asarray(jnp.transpose(oh2f, (2, 0, 1))))


def _fm_points(x_bm):
    """(B,NP,3) batch-major candidate points -> (3NP, B) kernel rows."""
    B, NP_, _ = x_bm.shape
    return jnp.transpose(x_bm.reshape(B, 3 * NP_), (1, 0))


def test_ground_selection_fm_matches(model, batched_state):
    k = jax.vmap(lambda s: fk_mod.fk(model, s))(batched_state)
    x, _ = fk_mod.contact_point_positions(model, k)
    depth = contacts_mod.detect_ground(model, x, 0.0)
    cons, _ = jax.vmap(
        lambda xx, dd: contacts_mod.select_contacts_oh(model, xx, dd))(
            x, depth)

    x_fm = _fm_points(x)
    depth_fm = contacts_mod.detect_ground_fm(model, x_fm, 0.0)
    assert np.allclose(np.asarray(depth_fm.T), np.asarray(depth),
                       atol=1e-6)
    g = contacts_mod.select_contacts_fm(model, x_fm, depth_fm)
    # selections are exact gathers of identical ranks -> identical values
    assert np.array_equal(np.asarray(g.depth.T), np.asarray(cons.depth))
    assert np.array_equal(np.asarray(g.body.T), np.asarray(cons.body))
    assert np.array_equal(np.asarray(g.point_idx.T),
                          np.asarray(cons.point_idx))
    assert np.array_equal(np.asarray(jnp.transpose(g.pos, (2, 0, 1))),
                          np.asarray(cons.pos))


def test_self_selection_fm_matches(model, batched_state):
    if model.self_pairs.shape[0] == 0:
        pytest.skip("model has no self-collision pairs")
    k = jax.vmap(lambda s: fk_mod.fk(model, s))(batched_state)
    pos, normal, depth = self_pair_features(model, k)
    (sp, sn, sd, bi, bj, si), _ = jax.vmap(
        lambda p, n, d: select_self_contacts_oh(model, p, n, d))(
            pos, normal, depth)

    # pack the kernel's (7P,B) rows: [dist; pos xyz; normal xyz]
    pairs = np.asarray(model.self_pairs)
    cap_r = np.asarray(model.cap_r)
    rsum = jnp.asarray(
        (cap_r[pairs[:, 0]] + cap_r[pairs[:, 1]]).astype(np.float32))
    dist = rsum[None, :] - depth                     # (B,P)
    m = jnp.concatenate(
        [dist[:, None, :], jnp.transpose(pos, (0, 2, 1)),
         jnp.transpose(normal, (0, 2, 1))], axis=1)  # (B,7,P)
    sc_fm = jnp.transpose(m.reshape(m.shape[0], -1), (1, 0))

    s = select_self_contacts_fm(model, sc_fm)
    assert np.allclose(np.asarray(s.depth.T), np.asarray(sd), atol=1e-6)
    assert np.array_equal(np.asarray(s.body_i.T), np.asarray(bi))
    assert np.array_equal(np.asarray(s.body_j.T), np.asarray(bj))
    assert np.allclose(np.asarray(jnp.transpose(s.pos, (2, 0, 1))),
                       np.asarray(sp), atol=1e-6)
    assert np.allclose(np.asarray(jnp.transpose(s.normal, (2, 0, 1))),
                       np.asarray(sn), atol=1e-6)
    assert np.array_equal(np.asarray(s.pair_idx.T), np.asarray(si))


def test_sel_dispatch_fallback_matches_assembly(model, batched_state):
    """The fused-selection dispatch's unbatched fallback must select the
    same contacts as the classic assembly path (on CPU the dispatch
    always takes the fallback)."""
    from physicsvae_tpu.physics import step as step_mod

    s0 = jax.tree.map(lambda a: a[0], batched_state)
    k = fk_mod.fk(model, s0)
    x, _ = fk_mod.contact_point_positions(model, k)
    depth = contacts_mod.detect_ground(model, x, 0.0)
    cons, _ = contacts_mod.select_contacts_oh(model, x, depth)

    fd = step_mod._fused_dynamics_sel(model, 0.0, "lean")
    _, _, (gsel, ssel) = fd(s0.root_p, s0.root_q, s0.joint_q, s0.vel)
    assert np.array_equal(np.asarray(gsel.depth), np.asarray(cons.depth))
    assert np.array_equal(np.asarray(gsel.body), np.asarray(cons.body))
    assert np.array_equal(np.asarray(gsel.pos), np.asarray(cons.pos))
    if model.self_pairs.shape[0] > 0 and model.params.self_collision:
        sc = self_pair_features(model, k)
        (sp, sn, sd, bi, bj, si), _ = select_self_contacts_oh(model, *sc)
        assert np.array_equal(np.asarray(ssel.depth), np.asarray(sd))
        assert np.array_equal(np.asarray(ssel.body_i), np.asarray(bi))
