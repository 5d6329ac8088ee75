from . import checkpoint, dataset, demo_gen, ppo, vae  # noqa: F401
from .ppo import PPOConfig, PPOTrainer  # noqa: F401
from .vae import VAETrainConfig, VAETrainer  # noqa: F401
