"""Multi-agent ImitationEnv slice: 2 agents, own kin twins + per-agent
obs/reward, coupled physics (reference: agent lists through the whole
task framework, envs/env_humanoid_base.py:45-205; one shared Bullet
world, envs/env_humanoid_tracking.py:181-209)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.env import make_env
from physicsvae_tpu.env.multi_agent import MultiAgentImitationEnv

SPEC = "/root/reference/data/spec/loco/loco_imitation.yaml"


@pytest.fixture(scope="module")
def menv():
    env = make_env(SPEC, project_dir="/root/reference",
                   physics_overrides={"carry_minv": False})
    return MultiAgentImitationEnv(env, num_agents=2)


def test_two_agent_step_shapes_and_rewards(menv):
    rng = jax.random.PRNGKey(0)
    st = menv.reset(rng, ref_motion_ids=[0, 1], start_times=[0.0, 2.0],
                    add_noise=False)
    assert st.sim.root_p.shape == (2, 3)
    obs = menv.observe(st)
    assert obs.shape == (2, menv.dim_state)

    a = jnp.zeros((2, menv.dim_action))
    st2, obs2, rew, done, info = menv.step(st, a)
    assert rew.shape == (2,) and done.shape == (2,)
    assert np.isfinite(np.asarray(rew)).all()
    assert np.asarray(rew).min() > 0.0  # both agents near their twins
    assert not np.asarray(done).any()
    assert "rew_info" in info and "eoe" in info
    # per-agent elapsed advanced together
    np.testing.assert_allclose(np.asarray(st2.elapsed),
                               menv.env.dt_con, rtol=1e-5)


def test_two_agent_coupling_pushes_apart(menv):
    """Same clip, same time, second agent shifted INTO the first: the
    coupled contact solve must push them apart (independent per-agent
    stepping would let them interpenetrate freely)."""
    rng = jax.random.PRNGKey(1)
    st = menv.reset(rng, ref_motion_ids=[0, 0], start_times=[0.0, 0.0],
                    root_offsets=np.asarray([[0.0, 0.0, 0.0],
                                             [0.15, 0.0, 0.0]]),
                    add_noise=False)
    a = jnp.zeros((2, menv.dim_action))
    st1 = st
    for _ in range(3):
        st1, _, _, _, _ = menv.step(st1, a)
    d0 = np.linalg.norm(np.asarray(st.sim.root_p[1] - st.sim.root_p[0]))
    d1 = np.linalg.norm(np.asarray(st1.sim.root_p[1] - st1.sim.root_p[0]))
    assert np.isfinite(np.asarray(st1.sim.root_p)).all()
    assert d1 > d0 + 0.01, (d0, d1)

    # far-apart control: agents independent, roots stay put horizontally
    stf = menv.reset(rng, ref_motion_ids=[0, 0], start_times=[0.0, 0.0],
                     root_offsets=np.asarray([[0.0, 0.0, 0.0],
                                              [5.0, 0.0, 0.0]]),
                     add_noise=False)
    st2 = stf
    for _ in range(3):
        st2, _, _, _, _ = menv.step(st2, a)
    df0 = np.linalg.norm(np.asarray(stf.sim.root_p[1] - stf.sim.root_p[0]))
    df1 = np.linalg.norm(np.asarray(st2.sim.root_p[1] - st2.sim.root_p[0]))
    assert abs(df1 - df0) < 0.05, (df0, df1)
