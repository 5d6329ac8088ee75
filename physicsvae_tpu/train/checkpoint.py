"""Checkpointing: whole-model and per-component weight files.

The reference saves model.pt plus task_encoder.pt / motor_decoder.pt /
world_model.pt / latent_prior.pt per checkpoint (train_physics_vae.py:
440-467) and can load+freeze components independently at construction
(rllib_model_torch.py:707-727).  Here components are param subtrees, saved
via orbax; `load_component` grafts a saved subtree into a live param tree.

Restores are TOPOLOGY-PORTABLE: arrays come back as host numpy (a TPU-saved
checkpoint loads on a CPU-only process and vice versa; orbax's default
device-sharded restore fails across topologies), and jit/jnp consumers
upload them on first use.
"""
from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.physics_vae import COMPONENT_NAMES


def save_model(dirpath: str, params, constants=None):
    # orbax/tensorstore requires absolute paths; CLI callers pass relative
    dirpath = os.path.abspath(dirpath)
    os.makedirs(dirpath, exist_ok=True)
    cp = ocp.PyTreeCheckpointer()
    cp.save(os.path.join(dirpath, "model"), params, force=True)
    if constants:
        cp.save(os.path.join(dirpath, "constants"), constants, force=True)
    # per-component subtrees (train_physics_vae.py:447-466)
    for name in COMPONENT_NAMES:
        if name in params:
            cp.save(os.path.join(dirpath, name), params[name], force=True)
    return dirpath


def _restore(path: str, like=None):
    cp = ocp.PyTreeCheckpointer()
    if like is None:
        out = cp.restore(path)
    else:
        args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), like)
        out = cp.restore(path, item=like, restore_args=args)
    return jax.tree.map(np.asarray, out)


def load_model(dirpath: str, like_params=None):
    dirpath = os.path.abspath(dirpath)
    return _restore(os.path.join(dirpath, "model"), like_params)


def load_component(dirpath: str, params, name: str):
    """Replace params[name] with the saved component subtree
    (load_weights_* equivalents, rllib_model_torch.py:882-928)."""
    dirpath = os.path.abspath(dirpath)
    sub = _restore(os.path.join(dirpath, name), params[name])
    new = dict(params)
    new[name] = sub
    return type(params)(new) if not isinstance(params, dict) else new
