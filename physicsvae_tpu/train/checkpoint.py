"""Checkpointing: whole-model and per-component weight files.

The reference saves model.pt plus task_encoder.pt / motor_decoder.pt /
world_model.pt / latent_prior.pt per checkpoint (train_physics_vae.py:
440-467) and can load+freeze components independently at construction
(rllib_model_torch.py:707-727).  Here components are param subtrees, saved
via orbax; `load_component` grafts a saved subtree into a live param tree.
"""
from __future__ import annotations

import os

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


def load_model(dirpath: str, like_params=None):
    dirpath = os.path.abspath(dirpath)
    cp = ocp.PyTreeCheckpointer()
    path = os.path.join(dirpath, "model")
    if like_params is not None:
        return cp.restore(path, item=like_params)
    return cp.restore(path)


def load_component(dirpath: str, params, name: str):
    """Replace params[name] with the saved component subtree
    (load_weights_* equivalents, rllib_model_torch.py:882-928)."""
    dirpath = os.path.abspath(dirpath)
    cp = ocp.PyTreeCheckpointer()
    sub = cp.restore(os.path.join(dirpath, name), item=params[name])
    new = dict(params)
    new[name] = sub
    return type(params)(new) if not isinstance(params, dict) else new
