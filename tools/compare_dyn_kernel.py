#!/usr/bin/env python
"""On-device numerical comparison: fused dynamics kernel vs XLA path.

Run alone on the TPU (never concurrently with another TPU process):
  python tools/compare_dyn_kernel.py [--batch 256]
Prints max abs differences per output; the A/B protocol requires all
below tolerance BEFORE enabling use_fused_dynamics.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from physicsvae_tpu.kinematics import motion as motion_mod
    from physicsvae_tpu.kinematics.char_info import load_char_info
    from physicsvae_tpu.ops.dyn_kernel import dynamics_terms_fused
    from physicsvae_tpu.physics import dynamics as dyn
    from physicsvae_tpu.physics import fk as fk_mod
    from physicsvae_tpu.physics import model as model_mod
    from physicsvae_tpu.physics import state as state_mod

    model = model_mod.load_loco_model()
    char = load_char_info(
        "/root/reference/data/character/info/loco_char_info.py")
    m = motion_mod.from_bvh_file(
        "/root/reference/data/motion/loco/loco_hierarchy.bvh", char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    rng = np.random.RandomState(0)
    B = args.batch
    sts = state_mod.from_pose(
        model,
        jnp.asarray(np.tile(np.asarray(root_p), (B, 1))
                    + rng.randn(B, 3) * 0.1),
        jnp.broadcast_to(root_q, (B, 4)),
        jnp.broadcast_to(joint_q, (B,) + joint_q.shape))
    sts = state_mod.SimState(
        sts.root_p, sts.root_q, sts.joint_q,
        jnp.asarray(rng.randn(B, model.nv).astype(np.float32)))

    t0 = time.perf_counter()
    fused = jax.jit(lambda s: dynamics_terms_fused(model, s)).lower(
        sts).compile()
    print(f"fused kernel compile: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    k, S, I, V, c, x = fused(sts)
    k_ref = jax.jit(jax.vmap(lambda s: fk_mod._fk_xla(model, s)))(sts)
    S_r, I_r, V_r, c_r = jax.jit(jax.vmap(
        lambda s, kk: dyn.dynamics_terms_split(model, s, kk)))(sts, k_ref)
    x_r = jax.jit(jax.vmap(
        lambda kk: fk_mod.contact_point_positions(model, kk)[0]))(k_ref)

    def d(a, b):
        return float(jnp.max(jnp.abs(a - b)))

    print("body_q ", d(k.body_q, k_ref.body_q))
    print("vcom   ", d(k.body_vcom, k_ref.body_vcom))
    print("S      ", d(S, S_r))
    print("I_sp   ", d(I, I_r))
    print("V      ", d(V, V_r))
    print("c      ", d(c, c_r))
    print("x      ", d(x, x_r))

    # lean (held-inverse warm substep) variant: must match the full kernel
    # exactly on its emitted subset
    from physicsvae_tpu.ops.dyn_kernel import dynamics_terms_fused_lean
    kl, cl, xl = jax.jit(
        lambda s: dynamics_terms_fused_lean(model, s))(sts)
    print("lean body_q vs full", d(kl.body_q, k.body_q))
    print("lean body_p vs full", d(kl.body_p, k.body_p))
    print("lean c      vs full", d(cl, c))
    print("lean x      vs full", d(xl, x))


if __name__ == "__main__":
    main()
