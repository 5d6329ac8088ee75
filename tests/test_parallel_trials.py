"""Parallel hyperparameter trials (ParallelCVAETrials): the vmapped-trial
epoch must reproduce the sequential trainer's cVAE phase per (kl, cyc)
combo — tune.grid_search concurrency semantics with identical numerics
(reference trial scheduling: train_physics_vae.py:264-285 + tune.run)."""
import dataclasses

import numpy as np
import jax
import pytest

from physicsvae_tpu.train.dataset import Batches
from physicsvae_tpu.train.vae import (ParallelCVAETrials, VAETrainConfig,
                                      VAETrainer)

from test_vae_train import small_mcfg, synthetic_dataset


def _sequential_cvae(mcfg, tcfg, X, Y, epochs):
    tr = VAETrainer(mcfg, tcfg, jax.random.PRNGKey(0))
    tr.world_phase = False  # cVAE phase only (shared pretrained WM case)
    import jax.numpy as jnp
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    np_rng = np.random.default_rng(0)
    out = None
    for _ in range(epochs):
        out = tr.train_epoch_device(Xd, Yd, np_rng)
    return tr.params, out


def test_parallel_matches_sequential():
    import jax.numpy as jnp

    X, Y = synthetic_dataset(1024)
    mcfg = small_mcfg()
    combos = [(1e-3, 1e-3), (1e-1, 1e-2)]
    epochs = 3

    base = VAETrainConfig(lr=2e-3, batch_size=256, max_iter=epochs,
                          max_iter_world_model=0)
    par = ParallelCVAETrials(mcfg, base, combos, jax.random.PRNGKey(0))
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    np_rng = np.random.default_rng(0)
    ms = None
    for _ in range(epochs):
        ms = par.train_epoch_device(Xd, Yd, np_rng)
    assert len(ms) == len(combos)

    for t, (kl, cyc) in enumerate(combos):
        tcfg = dataclasses.replace(base, vae_kl_coeff=kl,
                                   vae_cycle_coeff=cyc)
        seq_params, seq_m = _sequential_cvae(mcfg, tcfg, X, Y, epochs)
        pt = par.trial_params(t)

        # metrics agree (same init, shuffles, rng stream, coefficients)
        for key in ("loss", "loss_a", "loss_kl", "loss_cyc"):
            assert ms[t][key] == pytest.approx(seq_m[key], rel=1e-3,
                                               abs=1e-5), (t, key)
        # trained parameters agree to f32 noise
        for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_leaves_with_path(pt),
                jax.tree_util.tree_leaves_with_path(seq_params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-3, atol=2e-5,
                                       err_msg=str(pa))

    # the two trials genuinely differ (the coefficients took effect)
    l0 = jax.tree_util.tree_leaves(par.trial_params(0))
    l1 = jax.tree_util.tree_leaves(par.trial_params(1))
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4
               for a, b in zip(l0, l1))
