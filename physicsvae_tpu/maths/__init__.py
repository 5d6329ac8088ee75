from . import quaternion, transforms, normalizer  # noqa: F401
