"""Fused MLP forward as a single Pallas TPU kernel.

The PhysicsVAE components are 2-3 layer MLPs (task encoder 256x2, motor
decoder 512x3, world model 1024x2 — train_physics_vae.py:269-279).  XLA
executes each layer as a separate HBM-roundtrip matmul; at rollout batch
sizes (256-4096 rows) the weights dominate the traffic.  This kernel keeps
ALL layer weights resident in VMEM and streams batch tiles through the whole
stack — one HBM read of the weights per call instead of one per layer per
tile (BASELINE.json north star: "fused Pallas MLP kernels").

Supports relu/tanh/linear activations; used via `fused_mlp_apply` with
parameters extracted from a Flax FC module (models/fc.py).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

_ACT = {"relu": 0, "linear": 1, "tanh": 2}


def _round_up(x, m):
    return (x + m - 1) // m * m


def _mlp_kernel(x_ref, *refs, n_layers, acts, out_ref):
    h = x_ref[...]
    for i in range(n_layers):
        w = refs[2 * i][...]
        b = refs[2 * i + 1][...]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if acts[i] == 0:
            h = jnp.maximum(h, 0.0)
        elif acts[i] == 2:
            h = jnp.tanh(h)
    out_ref[...] = h


def fused_mlp(x, weights, biases, activations: Sequence[str],
              block_b: int = 256, interpret: bool = False):
    """y = MLP(x) in one pallas_call.

    x: (B, D_in); weights[i]: (D_i, D_{i+1}); biases[i]: (D_{i+1},).
    activations: per layer, in {relu, linear, tanh}.
    """
    assert HAS_PALLAS
    n = len(weights)
    assert len(biases) == n and len(activations) == n
    B, D_in = x.shape
    D_out = weights[-1].shape[1]
    acts = tuple(_ACT[a] for a in activations)

    Bp = _round_up(B, block_b)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))

    args = []
    in_specs = [pl.BlockSpec((block_b, D_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w, b in zip(weights, biases):
        args.append(w)
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, -1))
        in_specs.append(pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_mlp_kernel_wrapper, n_layers=n, acts=acts)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, D_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D_out), jnp.float32),
        interpret=interpret,
    )(x, *args)
    return out[:B]


def _mlp_kernel_wrapper(x_ref, *refs, n_layers, acts):
    out_ref = refs[-1]
    _mlp_kernel(x_ref, *refs[:-1], n_layers=n_layers, acts=acts,
                out_ref=out_ref)


def fc_params_to_arrays(fc_params, layer_cfgs):
    """Extract (weights, biases, activations) from a Flax FC param subtree
    (models/fc.py naming: fc_0, fc_1, ...)."""
    weights, biases, acts = [], [], []
    i = 0
    for cfg in layer_cfgs:
        if cfg["type"] != "fc":
            continue
        p = fc_params[f"fc_{i}"]
        weights.append(jnp.asarray(p["kernel"]))
        biases.append(jnp.asarray(p["bias"]))
        act = cfg.get("activation") or "linear"
        acts.append(act if act in _ACT else "linear")
        i += 1
    return weights, biases, acts


def fused_mlp_apply(fc_params, layer_cfgs, x, interpret: bool = False):
    w, b, a = fc_params_to_arrays(fc_params, layer_cfgs)
    return fused_mlp(x, w, b, a, interpret=interpret)
