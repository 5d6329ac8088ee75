"""Action/observation normalizer (replaces fairmotion math.Normalizer,
reference usage: envs/env_humanoid_base.py:217-279)."""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Normalizer:
    """Affine map between 'real' values (e.g. joint angles) and 'norm' values
    (policy outputs)."""

    real_min: np.ndarray
    real_max: np.ndarray
    norm_min: np.ndarray
    norm_max: np.ndarray
    apply_clamp: bool = True

    @property
    def dim(self) -> int:
        return int(np.asarray(self.real_min).shape[-1])

    def norm_to_real(self, x):
        if self.apply_clamp:
            x = jnp.clip(x, self.norm_min, self.norm_max)
        t = (x - self.norm_min) / (self.norm_max - self.norm_min)
        return self.real_min + t * (self.real_max - self.real_min)

    def real_to_norm(self, x):
        t = (x - self.real_min) / (self.real_max - self.real_min)
        y = self.norm_min + t * (self.norm_max - self.norm_min)
        if self.apply_clamp:
            y = jnp.clip(y, self.norm_min, self.norm_max)
        return y


def uniform(dim, real_min, real_max, norm_min, norm_max, apply_clamp=True):
    ones = np.ones(dim)
    return Normalizer(
        real_min=real_min * ones,
        real_max=real_max * ones,
        norm_min=norm_min * ones,
        norm_max=norm_max * ones,
        apply_clamp=apply_clamp,
    )
