"""End-to-end pipeline tests: demo generation on the real env, and the cVAE
CLI over a generated pickle (stages 2-3 of the reference pipeline,
README.md:60-133)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.env import make_env
from physicsvae_tpu.train.demo_gen import DemoGenConfig, generate_demos

SPEC_TEST = "/root/reference/data/spec/loco/loco_test.yaml"


@pytest.fixture(scope="module")
def env():
    return make_env(SPEC_TEST, project_dir="/root/reference")


@pytest.mark.slow
def test_generate_demos_and_train_vae(env, tmp_path):
    """Roll the T-pose clip with a zero policy, write the pickle, then run
    the cVAE trainer CLI on it."""

    def policy_fn(obs, rng, explore):
        mean = jnp.zeros(obs.shape[:-1] + (env.dim_action,))
        if explore:
            return mean + 0.05 * jax.random.normal(rng, mean.shape)
        return mean

    # Short windows: with reference falldown semantics (a window that
    # falls after max_retries contributes NOTHING), the zero policy
    # cannot survive the T-pose clip's full ~54-step window, but it
    # stands through 0.3 s ones.
    cfg = DemoGenConfig(iter_per_episode=2, max_retries=1,
                        window_size=0.3, stride=0.3)
    out = str(tmp_path / "demos.pkl")
    data = generate_demos(env, policy_fn, jax.random.PRNGKey(0), cfg,
                          output_path=out)
    assert os.path.exists(out)
    assert len(data["episodes"]) >= 1
    ep = data["episodes"][0]
    assert len(ep["state_body"]) > 5
    assert ep["state_body"][0].shape == (env.dim_state_body,)
    assert ep["action"][0].shape == (env.dim_action,)

    # Stage 3: train the cVAE on the pickle via the CLI entry
    from physicsvae_tpu.train_physics_vae import main as vae_main
    vae_main([
        "--data_train", out,
        "--max_iter", "2", "--max_iter_world_model", "1",
        "--latent_dim", "4",
        "--TE_width", "32", "--TE_depth", "1",
        "--MD_width", "32", "--MD_depth", "1",
        "--world_model_width", "32", "--world_model_depth", "1",
        "--local_dir", str(tmp_path / "runs"), "--name", "t",
        "--checkpoint_freq", "100",
    ])
    runs = os.listdir(str(tmp_path / "runs"))
    assert len(runs) == 1
    trial = os.path.join(str(tmp_path / "runs"), runs[0])
    assert os.path.isdir(os.path.join(trial, "ckpt_final"))
    assert os.path.exists(os.path.join(trial, "progress.jsonl"))
