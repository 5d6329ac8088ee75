from . import config, ground, imitation, noise, obs, reward, tracking  # noqa: F401
from .imitation import ImitationEnv, make_env  # noqa: F401
from .tracking import TrackingEnv  # noqa: F401
