from . import fc, physics_vae, policy  # noqa: F401
from .physics_vae import PhysicsVAE, PhysicsVAEConfig, init_model  # noqa: F401
from .policy import FullyConnectedPolicy, PolicyConfig, init_policy  # noqa: F401
