from . import checkpoint, dataset, vae  # noqa: F401
