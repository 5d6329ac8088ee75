from . import bvh, char_info, motion, urdf  # noqa: F401
