"""Precomputed kinematic-twin FK table (ImitationEnv._kin_fk_table).

The kin twin and sensor-lookahead task states are pure functions of
(clip, t); the table replaces 1 + len(lookahead) full FK tree sweeps per
control step with two-frame gathers + lerp.  Contract: at DB frame times
the table is exact; between frames it must match FK of the interpolated
pose to interpolation error (O(dt^2) of a 30 fps clip); observations and
task errors built from it must match the FK path closely.

Reference being replaced: the kinematic agent re-posed+FK'd every step
(envs/env_humanoid_imitation.py:111-117) and per lookahead
(envs/env_humanoid_imitation.py:146-189).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.env import make_env
from physicsvae_tpu.physics import fk as fk_mod

SPEC = "/root/reference/data/spec/loco/loco_imitation.yaml"
PROJ = "/root/reference"


@pytest.fixture(scope="module")
def env():
    return make_env(SPEC, project_dir=PROJ)


def _fk_of_pose(env, ref_idx, t):
    kin = env._kin_state(jnp.asarray(ref_idx), jnp.asarray(t))
    return fk_mod.fk(env.model, kin)


def test_exact_at_frame_times(env):
    fps = env.db.fps
    for fi in [0, 7, 100]:
        t = fi / fps
        k_tab = env.kin_fk_at(jnp.asarray(0), jnp.asarray(t))
        k_fk = _fk_of_pose(env, 0, t)
        np.testing.assert_allclose(np.asarray(k_tab.body_com),
                                   np.asarray(k_fk.body_com), atol=1e-5)
        # sign-aligned table quats may differ from FK by a global flip
        dot = np.abs(np.sum(np.asarray(k_tab.body_q)
                            * np.asarray(k_fk.body_q), axis=-1))
        assert np.all(dot > 1 - 1e-6)


def test_close_between_frames(env):
    rng = np.random.RandomState(0)
    ts = rng.uniform(0.0, 30.0, size=8).astype(np.float32)
    for t in ts:
        k_tab = env.kin_fk_at(jnp.asarray(1), jnp.asarray(t))
        k_fk = _fk_of_pose(env, 1, float(t))
        err_p = np.abs(np.asarray(k_tab.body_com)
                       - np.asarray(k_fk.body_com)).max()
        err_v = np.abs(np.asarray(k_tab.body_vcom)
                       - np.asarray(k_fk.body_vcom)).max()
        assert err_p < 5e-3, (t, err_p)
        assert err_v < 0.15, (t, err_v)


def test_obs_matches_fk_path(env):
    """End-to-end: observations with the table vs the FK path."""
    rng = jax.random.PRNGKey(0)
    st = env.reset(rng, ref_motion_id=2, start_time=3.37, add_noise=False)
    obs_tab = np.asarray(env.observe(st))

    tab = env._kin_fk_table
    env._kin_fk_table = None
    try:
        obs_fk = np.asarray(env.observe(st))
    finally:
        env._kin_fk_table = tab
    assert obs_tab.shape == obs_fk.shape
    # Velocity features of fast links (~6 m/s) differ by ~1% between
    # lerped-FK-outputs and FK-of-lerped-pose — both are O(dt)
    # finite-difference approximations of the true velocity; positions
    # agree to sub-mm.  (Measured max 0.064 over a full obs.)
    assert np.abs(obs_tab - obs_fk).max() < 0.1, \
        np.abs(obs_tab - obs_fk).max()


def test_task_error_matches_fk_path(env):
    rng = jax.random.PRNGKey(1)
    st = env.reset(rng, ref_motion_id=0, start_time=10.11, add_noise=False)
    a = jnp.zeros(env.dim_action)

    _, _, r_tab, _, info_tab = env.step(st, a)
    tab = env._kin_fk_table
    env._kin_fk_table = None
    try:
        _, _, r_fk, _, info_fk = env.step(st, a)
    finally:
        env._kin_fk_table = tab
    assert abs(float(r_tab) - float(r_fk)) < 1e-3
    for k in info_tab["error"]:
        assert abs(float(info_tab["error"][k])
                   - float(info_fk["error"][k])) < 1e-3, k
