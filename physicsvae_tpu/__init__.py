"""physicsvae_tpu — a TPU-native re-build of facebookresearch/PhysicsVAE.

JAX/XLA/Pallas compute path: batched articulated-body physics, motion
imitation environments, PhysicsVAE conditional-VAE models, on-device PPO.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache for every entry point (driver, trainers,
# bench, tools): the 16-substep physics program costs minutes of XLA
# compile cold; repeat runs should pay it once per program shape.
# PHYSICSVAE_CACHE_DIR overrides; empty string disables.
_cache_dir = _os.environ.get(
    "PHYSICSVAE_CACHE_DIR",
    _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..",
                                   ".jax_cache")))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# True-f32 matmuls everywhere by default.  On TPU, JAX's DEFAULT matmul
# precision computes f32 contractions with bf16 inputs (~2.6e-3 relative
# error measured on-chip) — acceptable for neural nets, NOT for a physics
# engine: the heavy-base fidelity fixtures (1e6 kg) turn that into
# O(kJ) energy drift, and bf16 cannot even represent contact-candidate
# indices > 256 exactly in the ranking-matmul top-K.  The hot,
# bandwidth-dominant matmuls (Newton–Schulz, Delassus, APGD matvec, qdd)
# opt INTO bf16 explicitly by casting inputs (physics/linalg.py,
# physics/contacts.py) — those sites are unaffected by this default.
_jax.config.update("jax_default_matmul_precision", "highest")
