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
