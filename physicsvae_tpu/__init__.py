"""physicsvae_tpu — a TPU-native re-build of facebookresearch/PhysicsVAE.

JAX/XLA/Pallas compute path: batched articulated-body physics, motion
imitation environments, PhysicsVAE conditional-VAE models, on-device PPO.
"""

__version__ = "0.1.0"

import jax as _jax

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
