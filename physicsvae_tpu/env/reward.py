"""Reward DSL compiler.

The reference evaluates a YAML-defined tree of add/mul/min/max/leaf/constant
ops with gaussian/quadratic/none kernels per step in Python
(envs/env_humanoid_base.py:928-1001).  Here the tree is *compiled once* into
a pure jax function over a dict of error terms — vectorized over the batch,
fused by XLA — per SURVEY.md §7 Phase 2.
"""
from __future__ import annotations

import jax.numpy as jnp


def lerp_from_paired_list(x, pairs):
    """Piecewise-linear interpolation over [(x0,y0),(x1,y1),...] (replaces
    fairmotion math.lerp_from_paired_list used by weight_schedule,
    envs/env_humanoid_base.py:973-976)."""
    xs = jnp.asarray([p[0] for p in pairs], dtype=jnp.float32)
    ys = jnp.asarray([p[1] for p in pairs], dtype=jnp.float32)
    return jnp.interp(x, xs, ys)


def subterm_names(fn_def) -> set:
    """Leaf/constant names used by a reward tree
    (envs/env_humanoid_base.py:906-918)."""
    op = fn_def.get("op", "leaf")
    names = set()
    if op in ("add", "mul", "min", "max"):
        for child in fn_def["child_nodes"]:
            names |= subterm_names(child)
    elif op in ("leaf", "constant"):
        names.add(fn_def.get("name", "noname"))
    else:
        raise NotImplementedError(op)
    return names


def compile_reward(fn_def):
    """Compile a reward tree into `fn(error_dict, timesteps_total) ->
    (reward, info_dict)`.

    `info_dict` maps node names to their values (flattened breakdown of the
    reference's recursive rew_info, envs/env_humanoid_base.py:941-999).
    """

    def make(node):
        op = node.get("op", "leaf")
        name = node.get("name", "noname")
        weight = float(node.get("weight", 1.0))
        value = float(node.get("value", 0.0))

        if op in ("add", "mul", "min", "max"):
            children = [make(c) for c in node["child_nodes"]]

            def fn(error, tt, _children=children, _op=op, _name=name):
                vals, infos = [], {}
                for c in _children:
                    v, i = c(error, tt)
                    vals.append(v)
                    infos.update(i)
                stacked = jnp.stack(vals, axis=0)
                if _op == "add":
                    out = jnp.sum(stacked, axis=0)
                elif _op == "mul":
                    out = jnp.prod(stacked, axis=0)
                elif _op == "min":
                    out = jnp.min(stacked, axis=0)
                else:
                    out = jnp.max(stacked, axis=0)
                infos[_name] = out
                return out, infos

            return fn

        if op == "constant":
            def fn(error, tt, _v=value, _name=name):
                return jnp.asarray(_v), {_name: jnp.asarray(_v)}
            return fn

        if op == "leaf":
            kernel = node.get("kernel")
            schedule = node.get("weight_schedule")

            def fn(error, tt, _name=name, _w=weight, _k=kernel, _s=schedule):
                e = error[_name]
                if _k is None or _k["type"] == "none":
                    r = e
                elif _k["type"] == "gaussian":
                    r = jnp.exp(-_k["scale"] * e)
                elif _k["type"] == "quadratic":
                    v = _k["scale"] * e
                    r = v * v
                else:
                    raise NotImplementedError(_k["type"])
                w = _w
                if _s is not None:
                    w = w * lerp_from_paired_list(tt, _s)
                r = w * r
                return r, {_name: r}

            return fn

        raise NotImplementedError(op)

    root = make(fn_def)

    def reward_fn(error, timesteps_total=0.0):
        return root(error, timesteps_total)

    return reward_fn
