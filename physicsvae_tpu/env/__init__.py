from . import config, imitation, obs, reward  # noqa: F401
from .imitation import ImitationEnv, make_env  # noqa: F401
