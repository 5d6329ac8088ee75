from . import fc, lstm, physics_vae, policy  # noqa: F401
from .lstm import LSTMPolicy, LSTMPolicyConfig, init_lstm_policy  # noqa: F401
from .physics_vae import PhysicsVAE, PhysicsVAEConfig, init_model  # noqa: F401
from .policy import FullyConnectedPolicy, PolicyConfig, init_policy  # noqa: F401
