"""Fused Pallas MLP kernel vs the Flax FC reference (interpret mode on CPU;
compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from physicsvae_tpu.models.fc import FC, default_fc_layers
from physicsvae_tpu.ops.fused_mlp import fused_mlp_apply, HAS_PALLAS

import pytest


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_mlp_matches_fc():
    layers = default_fc_layers(64, 2)
    fc = FC(size_out=16, layers=layers)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(50, 24)),
                    jnp.float32)
    variables = fc.init({"params": jax.random.PRNGKey(0)}, x)
    y_ref = fc.apply(variables, x)
    y = fused_mlp_apply(variables["params"], layers, x, interpret=True)
    assert y.shape == y_ref.shape
    assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_mlp_tanh():
    layers = default_fc_layers(32, 1, out_act="tanh")
    fc = FC(size_out=8, layers=layers)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(10, 12)),
                    jnp.float32)
    variables = fc.init({"params": jax.random.PRNGKey(1)}, x)
    y_ref = fc.apply(variables, x)
    y = fused_mlp_apply(variables["params"], layers, x, interpret=True)
    assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)
    assert np.abs(np.asarray(y)).max() <= 1.0
