import numpy as np
import jax
import jax.numpy as jnp

from physicsvae_tpu.models import (PhysicsVAE, PhysicsVAEConfig, init_model,
                                   PolicyConfig, init_policy)
from physicsvae_tpu.models.physics_vae import component_label
from physicsvae_tpu.models.policy import sample_action, log_prob


def small_cfg(**kw):
    from physicsvae_tpu.models.fc import default_fc_layers
    defaults = dict(
        dim_state_body=20, dim_state_task=20, dim_action=6,
        task_encoder_layers=tuple(default_fc_layers(32, 2)),
        motor_decoder_layers=tuple(default_fc_layers(32, 2)),
        world_model_layers=tuple(default_fc_layers(32, 2)),
        value_fn_layers=tuple(default_fc_layers(32, 2)),
        task_encoder_output_dim=8,
    )
    defaults.update(kw)
    return PhysicsVAEConfig(**defaults)


def test_physics_vae_shapes():
    cfg = small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    obs = jnp.ones((4, 40))
    logits, aux = model.apply(variables, obs, rng=jax.random.PRNGKey(1))
    assert logits.shape == (4, 12)          # mean + log_std
    assert aux["future_state"].shape == (4, 20)
    assert aux["value"].shape == (4,)
    assert aux["mu"].shape == (4, 8)
    assert aux["z_task"].shape == (4, 8)
    # constant log_std = log(0.1)
    assert np.allclose(np.asarray(logits[..., 6:]), np.log(0.1), atol=1e-5)


def test_deterministic_encode():
    cfg = small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    obs = jnp.ones((2, 40))
    l1, a1 = model.apply(variables, obs, sample=False)
    l2, a2 = model.apply(variables, obs, sample=False)
    assert np.allclose(l1, l2)
    assert np.allclose(a1["z_task"], a1["mu"])


def test_prior_variants():
    for prior in ["normal_zero_mean_one_std", "hypersphere_uniform", False]:
        cfg = small_cfg(latent_prior_type=prior)
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        obs = jnp.ones((2, 40))
        logits, aux = model.apply(variables, obs, rng=jax.random.PRNGKey(2))
        assert logits.shape == (2, 12)
        if prior == "hypersphere_uniform":
            # Reference rllib_model_torch.py:810-814: mu and the random
            # prior direction are unit vectors; z_task is NOT normalized.
            for key in ("mu", "prior_mu"):
                n = np.linalg.norm(np.asarray(aux[key]), axis=-1)
                assert np.allclose(n, 1.0, atol=1e-5)


def test_state_mean_prior():
    cfg = small_cfg(latent_prior_type="normal_state_mean_one_std")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    obs = jnp.ones((2, 40))
    logits, aux = model.apply(variables, obs, rng=jax.random.PRNGKey(2))
    assert aux["prior_mu"].shape == (2, 8)
    labels = {component_label(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(
                  variables["params"])}
    assert "latent_prior" in labels


def test_component_labels():
    cfg = small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    labels = {component_label(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(
                  variables["params"])}
    assert labels == {"task_encoder", "motor_decoder", "world_model",
                      "value_branch"}


def test_policy():
    cfg = PolicyConfig(dim_state=10, dim_action=4, sample_std=0.1)
    model, variables = init_policy(cfg, jax.random.PRNGKey(0))
    obs = jnp.ones((3, 10))
    logits, value = model.apply(variables, obs)
    assert logits.shape == (3, 8)
    assert value.shape == (3,)
    a_det = sample_action(None, logits, 4, explore=False)
    assert a_det.shape == (3, 4)
    a = sample_action(jax.random.PRNGKey(1), logits, 4, explore=True)
    lp = log_prob(logits, 4, a)
    assert lp.shape == (3,)
    assert np.isfinite(np.asarray(lp)).all()


def test_normc_init_scale():
    from physicsvae_tpu.models.fc import normc_initializer
    init = normc_initializer(1.0)
    w = init(jax.random.PRNGKey(0), (64, 32))
    norms = np.linalg.norm(np.asarray(w), axis=0)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_lstm_policy():
    from physicsvae_tpu.models.lstm import (LSTMPolicy, LSTMPolicyConfig,
                                            init_lstm_policy, unroll)
    cfg = LSTMPolicyConfig(dim_state=10, dim_action=4, hidden_size=16,
                           num_layers=2)
    model, variables = init_lstm_policy(cfg, jax.random.PRNGKey(0))
    B = 3
    carry = model.initial_state((B,))
    obs = jnp.ones((B, 10))
    logits, value, carry2 = model.apply(variables, obs, carry)
    assert logits.shape == (B, 8)
    assert value.shape == (B,)
    assert len(carry2) == 2
    # memory: different history -> different output for same obs
    obs_seq = jnp.asarray(
        np.random.default_rng(0).normal(size=(5, B, 10)), jnp.float32)
    l1, v1, c1 = unroll(model, variables, obs_seq, carry)
    l2, _, _ = model.apply(variables, obs, c1)
    assert not np.allclose(np.asarray(l2[..., :4]),
                           np.asarray(logits[..., :4]))
    assert l1.shape == (5, B, 8)
