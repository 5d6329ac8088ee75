"""Render flag/toggle registry — rebuild of the reference's
``render_module.py`` global tables (render_module.py:17-76).

The reference keeps a module-global ``flag`` dict (what to draw), a
``toggle`` keymap (which GLUT key flips which flag) and ``get_flag``
which resolves multi-state flags stored as ``[index, (choices...)]``.
Here the same registry is a small class so several renderers/REPLs can
hold independent flag sets; the key bindings and defaults are kept
byte-for-byte compatible so reference muscle memory carries over to the
REPL's ``t <key>`` command.

Color palettes (render_module.py:81-121) are ported as float RGB(A)
arrays used by the headless ray tracer.
"""
from __future__ import annotations

import numpy as np

# Defaults exactly as the reference table (render_module.py:17-41).
# Multi-state flags are [index, (choices...)] like the reference.
_DEFAULT_FLAGS = {
    "all_scene": True,
    "follow_cam": [0, ("fixed", "pos", "pos+rot")],
    "ground": True,
    "origin": False,
    "shadow": True,
    "sim_model": True,
    "kin_model": False,
    "joint": False,
    "com_vel": False,
    "collision": False,
    "overlay": True,
    "overlay_text": False,
    "target_pose": False,
    "auto_play": False,
    "fog": False,
    "facing_frame": False,
    "interaction": True,
    "obstacle": True,
    "root_trajectory": False,
    "custom1": True,
    "custom2": True,
    "custom3": True,
    "custom4": False,
    "custom5": False,
}

# Key → flag bindings exactly as the reference (render_module.py:43-67).
TOGGLE_KEYS = {
    "`": "all_scene",
    "0": "follow_cam",
    "1": "ground",
    "2": "origin",
    "3": "shadow",
    "4": "sim_model",
    "5": "kin_model",
    "6": "joint",
    "7": "com_vel",
    "8": "collision",
    "9": "overlay",
    "T": "overlay_text",
    "t": "target_pose",
    "a": "auto_play",
    "f": "fog",
    "F": "facing_frame",
    "i": "interaction",
    "o": "obstacle",
    "y": "root_trajectory",
    "!": "custom1",
    "@": "custom2",
    "#": "custom3",
    "$": "custom4",
    "%": "custom5",
}


class RenderFlags:
    """Per-renderer flag set with the reference's toggle semantics."""

    def __init__(self, **overrides):
        self.flag = {}
        for k, v in _DEFAULT_FLAGS.items():
            self.flag[k] = list(v) if isinstance(v, list) else v
        for k, v in overrides.items():
            if k not in self.flag:
                raise KeyError(f"unknown render flag {k!r}")
            self.set(k, v)

    def get(self, keyword):
        """Resolve a flag value (render_module.py:69-76): list-valued
        flags return the current choice string."""
        entity = self.flag[keyword]
        if isinstance(entity, list):
            return entity[1][entity[0]]
        if isinstance(entity, bool):
            return entity
        raise NotImplementedError(keyword)

    def set(self, keyword, value):
        entity = self.flag[keyword]
        if isinstance(entity, list):
            if value not in entity[1]:
                raise ValueError(
                    f"{keyword}: {value!r} not in {entity[1]}")
            entity[0] = entity[1].index(value)
        else:
            self.flag[keyword] = bool(value)

    def toggle(self, key_or_name):
        """Flip a bool flag / cycle a multi-state flag.  Accepts either a
        reference key binding ('1', '0', 'F', ...) or a flag name
        ('ground').  Returns (name, new_value)."""
        name = TOGGLE_KEYS.get(key_or_name, key_or_name)
        if name not in self.flag:
            raise KeyError(f"no render flag or key {key_or_name!r}")
        entity = self.flag[name]
        if isinstance(entity, list):
            entity[0] = (entity[0] + 1) % len(entity[1])
        else:
            self.flag[name] = not entity
        return name, self.get(name)

    def items(self):
        return {k: self.get(k) for k in self.flag}.items()


# Agent color palette (render_module.py:81-99), RGB in [0,1].
COLORS_FOR_AGENTS = np.array([
    [30, 120, 180], [215, 40, 40], [150, 100, 190], [225, 120, 190],
    [140, 90, 80], [50, 160, 50], [255, 125, 15], [125, 125, 125],
    [255, 0, 255], [0, 255, 125], [50, 50, 50], [175, 175, 175],
    [248, 215, 3], [248, 60, 18], [243, 118, 97], [247, 116, 25],
    [249, 241, 215],
], dtype=np.float32) / 255.0

# Single-agent default color (render_module.py:101).
COLOR_AGENT = np.array([85, 160, 173], dtype=np.float32) / 255.0

# Expert palette is identical in the reference (render_module.py:103-121).
COLORS_FOR_EXPERTS = COLORS_FOR_AGENTS
