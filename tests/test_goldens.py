"""PyBullet golden-trajectory comparison (activates when tests/goldens/
exists — record with tools/record_golden.py on a machine that has
pybullet; PARITY.md §5).

Tolerances are physical, not bit-level: the two engines use different
contact solvers (APGD cone QP vs sequential impulse), so trajectories
diverge slowly after contact events.  Pre-contact and low-contact phases
must agree tightly; post-contact drift is bounded loosely.
"""
import glob
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))

pytestmark = pytest.mark.skipif(
    not GOLDENS, reason="no goldens recorded (tools/record_golden.py)")


@pytest.fixture(scope="module")
def model():
    from physicsvae_tpu.physics import model as model_mod
    return model_mod.load_loco_model(
        params=model_mod.SimParams(matmul_bf16=False))


def _rollout(model, root_p, root_q, joint_q, steps, hold_targets=None):
    import jax
    import jax.numpy as jnp
    from physicsvae_tpu.maths import quaternion as quat
    from physicsvae_tpu.physics import state as state_mod
    from physicsvae_tpu.physics import step as step_mod

    st = state_mod.from_pose(model, jnp.asarray(root_p),
                             jnp.asarray(root_q), jnp.asarray(joint_q))
    if hold_targets is None:
        action = step_mod.Action(
            target_q=quat.identity((model.num_joints,)),
            target_w=jnp.zeros((model.num_joints, 3)),
            torque=jnp.zeros(model.nv))
    else:
        action = step_mod.Action(
            target_q=jnp.asarray(hold_targets),
            target_w=jnp.zeros((model.num_joints, 3)))
    step = jax.jit(lambda s: step_mod.control_step(model, s, action))
    out_p, out_q = [], []
    for _ in range(steps):
        st = step(st)
        out_p.append(np.asarray(st.root_p))
        out_q.append(np.asarray(st.root_q))
    return np.stack(out_p), np.stack(out_q)


def _golden_joint_targets(model, g):
    """Golden joint_q index -> our model's movable-joint order (both follow
    URDF/reference joint order, so it is the identity on loco)."""
    import numpy as np
    jq = np.tile(np.array([0.0, 0.0, 0.0, 1.0]),
                 (model.num_joints, 1))
    mov = np.where(model.movable)[0]
    jq[mov] = g["joint_q"][0][:len(mov)] if g["joint_q"].ndim == 3 \
        else g["joint_q"]
    return jq


@pytest.mark.parametrize("path", GOLDENS, ids=[os.path.basename(p)
                                               for p in GOLDENS])
def test_golden_trajectory(path, model):
    g = np.load(path, allow_pickle=True)
    scenario = str(g["scenario"])
    T = g["root_p"].shape[0]

    mov = np.where(model.movable)[0]
    jq0 = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (model.num_joints, 1))
    if scenario in ("drop_spd_hold", "free_fall"):
        start = [0.0, float(g["start_h"]), 0.0]
        hold = jq0 if scenario == "drop_spd_hold" else None
        p, q = _rollout(model, start, [0, 0, 0, 1], jq0, T,
                        hold_targets=hold)
    else:  # spd_track
        jq = jq0.copy()
        jq[mov] = g["joint_q"][0][:len(mov)]
        p, q = _rollout(model, [0.0, 1.0, 0.0], [0, 0, 0, 1], jq, T,
                        hold_targets=jq)

    gp = g["root_p"]
    if scenario == "free_fall":
        # no contacts: kinematics must match almost exactly
        np.testing.assert_allclose(p, gp, atol=5e-3)
    else:
        # pre-impact (first ~0.25 s): tight
        n_pre = min(int(0.25 * 30), T)
        np.testing.assert_allclose(p[:n_pre], gp[:n_pre], atol=2e-2)
        # post-impact: bounded drift (different contact solvers)
        err = np.linalg.norm(p - gp, axis=-1)
        assert err.max() < 0.25, err.max()
        # final heights agree (settled on the same ground)
        assert abs(p[-1, 1] - gp[-1, 1]) < 0.05
