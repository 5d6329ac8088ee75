from . import fused_mlp  # noqa: F401
