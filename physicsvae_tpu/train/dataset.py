"""Expert-demo dataset pipeline.

Reads/writes the same pickle schema as the reference
(train_physics_vae.py:57-114 documents it; gen_state_action_pairs writes it,
envs/rllib_env_imitation.py:140-145), and reproduces the
(x=[sb_t, sb_{t+1}], y=a_t) tuple extraction with lookahead and abs/rel
conditioning (train_physics_vae.py:117-164).
"""
from __future__ import annotations

import pickle
from typing import Optional

import numpy as np


def merge_dataset(files):
    """Concatenate episode lists across pickles (train_physics_vae.py:94-114)."""
    data_all = None
    for i, file in enumerate(files):
        with open(file, "rb") as f:
            data = pickle.load(f)
        if i == 0:
            data_all = data
        else:
            for k in ("iter_per_episode", "dim_state", "dim_state_body",
                      "dim_state_task", "dim_action", "exp_std"):
                assert data_all[k] == data[k], k
            data_all["episodes"] = data_all["episodes"] + data["episodes"]
    return data_all


def load_physics_vae_dataset(files, num_samples: Optional[int] = None,
                             lookahead: int = 1, cond: str = "abs",
                             use_a_gt: bool = False):
    """Returns (X (N, lookahead, 2*dim_sb), Y (N, lookahead, dim_a)).

    Mirrors load_dataset_for_PhysicsVAE (train_physics_vae.py:117-164).
    """
    assert files and lookahead >= 1
    data = merge_dataset(list(files))
    X, Y = [], []
    for ep in data["episodes"]:
        n = len(ep["time"])
        assert n >= lookahead
        sb = np.asarray(ep["state_body"], dtype=np.float32)
        key = "action_gt" if use_a_gt else "action"
        ac = np.asarray(ep[key], dtype=np.float32)
        for i in range(n - lookahead):
            if num_samples is not None and len(X) >= num_samples:
                break
            xs, ys = [], []
            for j in range(lookahead):
                s1, s2 = sb[i + j], sb[i + j + 1]
                if cond == "abs":
                    xs.append(np.concatenate([s1, s2]))
                elif cond == "rel":
                    xs.append(np.concatenate([s1, s2 - s1]))
                else:
                    raise NotImplementedError(cond)
                ys.append(ac[i + j])
            X.append(np.stack(xs))
            Y.append(np.stack(ys))
    X = np.asarray(X, dtype=np.float32)
    Y = np.asarray(Y, dtype=np.float32)
    return X, Y, data


def save_demo_dataset(path, episodes, dims, exp_std, iter_per_episode):
    """Write the reference pickle schema
    (envs/rllib_env_imitation.py:63-71, 140-145)."""
    data = {
        "iter_per_episode": iter_per_episode,
        "dim_state": dims["state"],
        "dim_state_body": dims["state_body"],
        "dim_state_task": dims["state_task"],
        "dim_action": dims["action"],
        "episodes": episodes,
        "exp_std": exp_std,
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


EPSILON = 1e-10


class Standardizer:
    """Per-feature mean/std standardization (DatasetBase normalize_x/y,
    reference torch_models.py:39-95).  The reference disables it for
    PhysicsVAE (train_physics_vae.py:164), but the option is part of the
    supervised-training surface."""

    def __init__(self, data):
        self.mean = np.mean(data, axis=0)
        self.std = np.std(data, axis=0)

    def preprocess(self, x):
        return (x - self.mean) / (self.std + EPSILON)

    def postprocess(self, x):
        return self.mean + x * self.std


class Batches:
    """Shuffled minibatch iterator (epoch semantics like the reference's
    DataLoader, torch_models.py:131-145).

    normalize_x / normalize_y standardize features per the reference's
    DatasetBase; the fitted Standardizers are exposed as x_norm / y_norm
    for postprocessing model outputs."""

    def __init__(self, X, Y, batch_size, seed=0, normalize_x=False,
                 normalize_y=False):
        self.x_norm = Standardizer(X) if normalize_x else None
        self.y_norm = Standardizer(Y) if normalize_y else None
        if self.x_norm is not None:
            X = self.x_norm.preprocess(X)
        if self.y_norm is not None:
            Y = self.y_norm.preprocess(Y)
        self.X, self.Y = X, Y
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def epoch(self):
        n = len(self.X)
        idx = self.rng.permutation(n)
        nb = n // self.batch_size
        for b in range(max(nb, 1)):
            sl = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if len(sl) == 0:
                sl = idx
            yield self.X[sl], self.Y[sl]
