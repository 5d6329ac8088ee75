from . import runner  # noqa: F401
from .runner import EnvRunner  # noqa: F401
