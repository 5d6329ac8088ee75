"""Env API tests: observation/action dims must match the formulas in
SURVEY.md §2.1 (361 / 734 / 1095 / 54); reward tree; early termination;
vmap invariance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.env import make_env
from physicsvae_tpu.env.reward import compile_reward, subterm_names

SPEC = "/root/reference/data/spec/loco/loco_imitation.yaml"


@pytest.fixture(scope="module")
def env():
    return make_env(SPEC, project_dir="/root/reference")


def test_dims(env):
    assert env.dim_action == 54
    assert env.dim_state_body == 361
    assert env.dim_state_task == 734
    assert env.dim_state == 1095


def test_reset_tracks_reference(env):
    rng = jax.random.PRNGKey(0)
    st = env.reset(rng, ref_motion_id=0, start_time=1.0)
    # RSI: sim state equals reference pose (with height fix -0.1)
    p, q, jq = env.db.pose_at(jnp.asarray(0), jnp.asarray(1.0))
    assert np.allclose(st.sim.root_p, np.asarray(p) + [0, -0.1, 0], atol=1e-5)
    obs = env.observe(st)
    assert obs.shape == (1095,)
    assert np.isfinite(np.asarray(obs)).all()


def test_step_runs_and_rewards(env):
    rng = jax.random.PRNGKey(1)
    st = env.reset(rng, ref_motion_id=0, start_time=0.5)
    action = jnp.zeros(54)
    st2, obs, rew, done, info = jax.jit(env.step)(st, action)
    assert obs.shape == (1095,)
    r = float(rew)
    assert 0.0 < r <= 1.0
    assert not bool(done)
    # reward breakdown contains all five terms
    for name in ["pose_pos", "pose_vel", "ee", "root", "com"]:
        assert name in info["rew_info"]
    # Zero action = SPD toward the T-pose-ish base pose, away from the
    # walking clip: reward drops mostly via pose_vel but stays well above 0.
    assert r > 0.1, r


def test_oracle_tracking_reward_high(env):
    """Actions that set the SPD target to the reference pose must track well
    for the first ~10 control steps (Phase 3 slice, SURVEY.md §7)."""
    from physicsvae_tpu.maths import quaternion as quat

    mov_idx = jnp.asarray(np.where(np.asarray(env.model.movable))[0])

    def oracle_action(st):
        t = env.ref_time(st) + env.dt_con
        _, _, ref_q = env.db.pose_at(st.ref_idx, t)
        rel = quat.mul(quat.conjugate(jnp.asarray(env.base_q0)), ref_q)
        return quat.to_axis_angle(rel)[mov_idx].reshape(-1)

    @jax.jit
    def rollout(st):
        def body(st, _):
            st, obs, rew, done, info = env.step(st, oracle_action(st))
            return st, rew
        return jax.lax.scan(body, st, None, length=10)

    st = env.reset(jax.random.PRNGKey(7), ref_motion_id=0, start_time=0.5)
    _, rews = rollout(st)
    rews = np.asarray(rews)
    assert rews[0] > 0.85, rews
    assert rews.mean() > 0.7, rews


def test_perfect_tracking_reward_is_high(env):
    """If sim state is exactly the kin state, reward ≈ 1 (velocities from the
    clip introduce small pose_vel error only through interpolation)."""
    rng = jax.random.PRNGKey(2)
    st = env.reset(rng, ref_motion_id=0, start_time=1.0)
    kin = env._kin_state(st.ref_idx, env.ref_time(st))
    import physicsvae_tpu.physics.fk as fk_mod
    k = fk_mod.fk(env.model, kin)
    err = env._task_error(kin, kin, k, k)
    rew, _ = env.reward_fn(err)
    assert float(rew) > 0.999


def test_ref_motion_end_terminates(env):
    rng = jax.random.PRNGKey(3)
    length = float(np.asarray(env.db.length_of(0)))
    st = env.reset(rng, ref_motion_id=0, start_time=length - 0.01)
    action = jnp.zeros(54)
    step = jax.jit(env.step)
    # margin is 0.2s -> needs ~7 steps after EOE triggers
    done = False
    for i in range(12):
        st, obs, rew, done, info = step(st, action)
        if bool(done):
            break
    assert bool(done)
    assert bool(np.asarray(info["eoe"]["ref_motion_end"]))


def test_vmapped_env(env):
    B = 4
    rngs = jax.random.split(jax.random.PRNGKey(4), B)
    reset = jax.vmap(env.reset)
    st = reset(rngs)
    assert st.sim.root_p.shape == (B, 3)
    obs = jax.vmap(env.observe)(st)
    assert obs.shape == (B, 1095)
    actions = jnp.zeros((B, 54))
    st2, obs2, rew, done, info = jax.jit(jax.vmap(env.step_auto))(st, actions)
    assert rew.shape == (B,)
    assert np.isfinite(np.asarray(obs2)).all()


def test_reward_compiler():
    fn_def = {
        "name": "total", "op": "add", "child_nodes": [
            {"name": "a", "op": "leaf", "weight": 2.0,
             "kernel": {"type": "gaussian", "scale": 1.0}},
            {"name": "b", "op": "constant", "value": 0.25},
        ],
    }
    assert subterm_names(fn_def) == {"a", "b"}
    fn = compile_reward(fn_def)
    rew, info = fn({"a": jnp.asarray(0.0)})
    assert np.isclose(float(rew), 2.0 + 0.25)
    rew, info = fn({"a": jnp.asarray(1.0)})
    assert np.isclose(float(rew), 2.0 * np.exp(-1.0) + 0.25)
    assert "total" in info


def test_task_obs_zero_lookahead_matches_kin(env):
    """With sim == kin and zero lookahead time, the rel part of ref_motion_abs
    (facing-frame diff) should be ~zero."""
    rng = jax.random.PRNGKey(5)
    st = env.reset(rng, ref_motion_id=0, start_time=2.0)
    obs = np.asarray(env.observe(st))
    body, task = obs[:361], obs[361:]
    # facing-frame diff of the first lookahead (0.05s ahead): last 6 of the
    # first 367 block; position diff should be small (0.05 s of motion)
    ff = task[361:367]
    assert np.linalg.norm(ff[:3]) < 0.5
    # facing dir in sim facing frame: mostly +z
    assert ff[5] > 0.8


def test_reward_weight_schedule():
    """weight_schedule lerps the leaf weight by timesteps_total
    (envs/env_humanoid_base.py:973-976)."""
    fn = compile_reward({
        "name": "total", "op": "add", "child_nodes": [
            {"name": "a", "op": "leaf",
             "weight": 2.0,
             "weight_schedule": [(0, 1.0), (100, 0.0)],
             "kernel": {"type": "none"}},
        ]})
    r0, _ = fn({"a": jnp.asarray(1.0)}, timesteps_total=0)
    r50, _ = fn({"a": jnp.asarray(1.0)}, timesteps_total=50)
    r100, _ = fn({"a": jnp.asarray(1.0)}, timesteps_total=100)
    assert np.isclose(float(r0), 2.0)
    assert np.isclose(float(r50), 1.0)
    assert np.isclose(float(r100), 0.0)


def test_sim_window_termination():
    cfg = make_env(SPEC, project_dir="/root/reference").cfg
    import dataclasses
    from physicsvae_tpu.env.imitation import ImitationEnv
    cfg2 = dataclasses.replace(
        cfg, early_term_choices=["sim_window"], et_sim_window_time=2.5 / 30.0,
        et_eoe_margin=0.0)
    env2 = ImitationEnv(cfg2)
    st = env2.reset(jax.random.PRNGKey(0), ref_motion_id=0, start_time=0.0)
    step = jax.jit(env2.step)
    action = jnp.zeros(54)
    dones = []
    for _ in range(5):
        st, obs, rew, done, info = step(st, action)
        dones.append(bool(done))
    assert dones == [False, False, True, True, True]


def test_add_noise_reset(env):
    """add_noise=True perturbs the RSI pose away from the reference
    (add_noise_to_pose_vel path)."""
    rng = jax.random.PRNGKey(11)
    st_clean = env.reset(rng, ref_motion_id=0, start_time=1.0,
                         add_noise=False)
    st_noisy = env.reset(rng, ref_motion_id=0, start_time=1.0,
                         add_noise=True)
    from physicsvae_tpu.maths import quaternion as quat
    dq = np.asarray(quat.geodesic_angle(st_clean.sim.joint_q,
                                        st_noisy.sim.joint_q))
    movable = np.asarray(env.model.movable)
    assert dq[movable].max() > 0.01
    assert dq[movable].max() <= 0.5 + 1e-4
    # root untouched
    assert np.allclose(st_clean.sim.root_p, st_noisy.sim.root_p)


def test_horizon_cap():
    """The rllib episode-step cap (horizon, loco_imitation.yaml:43-44) hard-
    terminates episodes even with no EOE condition met."""
    import dataclasses
    from physicsvae_tpu.env.imitation import ImitationEnv
    cfg = make_env(SPEC, project_dir="/root/reference").cfg
    cfg2 = dataclasses.replace(cfg, early_term_choices=[], et_eoe_margin=0.0,
                               repeat_ref_motion=True)
    env2 = ImitationEnv(cfg2)
    env2.horizon = 3
    st = env2.reset(jax.random.PRNGKey(0), ref_motion_id=0, start_time=0.0)
    step = jax.jit(env2.step)
    action = jnp.zeros(54)
    dones = []
    for _ in range(5):
        st, obs, rew, done, info = step(st, action)
        dones.append(bool(done))
    assert dones == [False, False, True, True, True]


def test_timesteps_total_reaches_weight_schedule():
    """set_learning_info plumbing (envs/env_humanoid_base.py:349-353 ->
    :973-976): the same step with different timesteps_total yields a
    different scheduled reward."""
    import dataclasses
    from physicsvae_tpu.env.imitation import ImitationEnv
    cfg = make_env(SPEC, project_dir="/root/reference").cfg
    sched_def = {
        "name": "total", "op": "add", "child_nodes": [
            {"name": "pose_pos", "op": "leaf", "weight": 1.0,
             "weight_schedule": [(0, 1.0), (1000, 0.0)],
             "kernel": {"type": "gaussian", "scale": 40.0}},
            {"name": "c", "op": "constant", "value": 0.0},
        ]}
    cfg2 = dataclasses.replace(cfg, reward_fn_def=sched_def)
    env2 = ImitationEnv(cfg2)
    st = env2.reset(jax.random.PRNGKey(0), ref_motion_id=0, start_time=0.5)
    step = jax.jit(env2.step)
    action = jnp.zeros(54)
    _, _, r0, _, _ = step(st, action, jnp.asarray(0.0))
    _, _, r500, _, _ = step(st, action, jnp.asarray(500.0))
    _, _, r1000, _, _ = step(st, action, jnp.asarray(1000.0))
    assert float(r0) > 0.0
    assert np.isclose(float(r500), 0.5 * float(r0), atol=1e-5)
    assert np.isclose(float(r1000), 0.0, atol=1e-6)


def test_heightmap_threaded_through_imitation():
    """Terrain affects contacts, falldown and root-height features in the
    imitation env (VERDICT r1 weak #10; reference heightmap ground,
    envs/env_humanoid_tracking.py:157-161, :295-345)."""
    import dataclasses
    from physicsvae_tpu.env.imitation import ImitationEnv

    cfg = make_env(SPEC, project_dir="/root/reference").cfg
    cfg2 = dataclasses.replace(cfg, early_term_choices=[])
    env_flat = ImitationEnv(cfg2)
    env_hill = ImitationEnv(cfg2)
    from physicsvae_tpu.env.ground import Heightmap
    # constant 0.30 m plateau
    env_hill.ground = Heightmap(jnp.full((4, 4), 0.30), 100.0, 100.0)

    st = env_flat.reset(jax.random.PRNGKey(0), ref_motion_id=0,
                        start_time=0.5)
    obs_flat = np.asarray(env_flat.observe(st))
    obs_hill = np.asarray(env_hill.observe(st))
    # root height feature (last entry of the body block) shifts down by 0.30
    h_flat = obs_flat[360]
    h_hill = obs_hill[360]
    assert np.isclose(h_flat - h_hill, 0.30, atol=1e-5), (h_flat, h_hill)

    # raised ground produces earlier/harder ground contact in the step
    st_f, _, _, _, _ = jax.jit(env_flat.step)(st, jnp.zeros(54))
    st_h, _, _, _, _ = jax.jit(env_hill.step)(st, jnp.zeros(54))
    up_f = float(st_f.sim.root_p[1])
    up_h = float(st_h.sim.root_p[1])
    assert up_h > up_f  # pushed up by the plateau


def test_ref_motion_rel_quaternion_difference():
    """include_rel compares quaternion features via difference quaternions
    (getDifferenceQuaternion, envs/env_humanoid_imitation.py:238-245): at
    sim == kin the Q entries are the identity quaternion, not zeros."""
    from physicsvae_tpu.env import obs as obs_mod
    from physicsvae_tpu.physics import fk as fk_mod

    env_ = make_env(SPEC, project_dir="/root/reference")
    st = env_.reset(jax.random.PRNGKey(0), ref_motion_id=0, start_time=1.0)
    k = fk_mod.fk(env_.model, st.sim)
    rel = np.asarray(obs_mod.body_state_rel(env_.model, k, k, "facing"))
    # 'facing' layout per link: p(3) Q(4) v(3) w(3) = 13; root included
    L = env_.model.num_bodies
    per = rel[:13 * L].reshape(L, 13)
    assert np.allclose(per[:, 0:3], 0.0, atol=1e-5)          # p diff
    assert np.allclose(per[:, 3:7], [0, 0, 0, 1], atol=1e-5)  # Q identity
    assert np.allclose(per[:, 7:13], 0.0, atol=1e-5)          # v, w diff
