"""physicsvae_tpu — a TPU-native re-build of facebookresearch/PhysicsVAE.

JAX/XLA/Pallas compute path: batched articulated-body physics, motion
imitation environments, PhysicsVAE conditional-VAE models, on-device PPO.
"""

__version__ = "0.1.0"
