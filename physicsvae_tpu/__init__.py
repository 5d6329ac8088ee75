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
# Precedence: a user-set JAX_COMPILATION_CACHE_DIR wins (never override
# it); then PHYSICSVAE_CACHE_DIR (empty string disables); then the repo
# checkout's .jax_cache when the package is an editable/source checkout,
# else a per-user cache dir (a site-packages install must not write next
# to itself).
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache_dir = _os.environ.get("PHYSICSVAE_CACHE_DIR")
    if _cache_dir is None:
        _repo = _os.path.abspath(_os.path.join(_os.path.dirname(__file__),
                                               ".."))
        if _os.path.isdir(_os.path.join(_repo, ".git")):
            _cache_dir = _os.path.join(_repo, ".jax_cache")
        else:
            _cache_dir = _os.path.join(
                _os.path.expanduser("~"), ".cache", "physicsvae_jax")
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
