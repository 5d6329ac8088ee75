"""Normalizer + transform helper coverage (reference math.Normalizer and
projectionOnVector semantics)."""
import numpy as np
import jax.numpy as jnp

from physicsvae_tpu.maths.normalizer import Normalizer, uniform
from physicsvae_tpu.maths.transforms import (apply, compose, inverse,
                                             project_on_vector)
from physicsvae_tpu.maths import quaternion as quat


def test_normalizer_roundtrip():
    n = uniform(4, real_min=-3.0, real_max=3.0, norm_min=-1.0, norm_max=1.0)
    x = jnp.asarray([-1.0, -0.5, 0.0, 1.0])
    real = n.norm_to_real(x)
    assert np.allclose(real, [-3.0, -1.5, 0.0, 3.0])
    back = n.real_to_norm(real)
    assert np.allclose(back, np.asarray(x))


def test_normalizer_clamp():
    n = uniform(2, real_min=-3.0, real_max=3.0, norm_min=-1.0, norm_max=1.0,
                apply_clamp=True)
    real = n.norm_to_real(jnp.asarray([5.0, -5.0]))
    assert np.allclose(real, [3.0, -3.0])
    n2 = uniform(2, real_min=-3.0, real_max=3.0, norm_min=-1.0, norm_max=1.0,
                 apply_clamp=False)
    real2 = n2.norm_to_real(jnp.asarray([2.0, -2.0]))
    assert np.allclose(real2, [6.0, -6.0])


def test_identity_normalizer_is_loco_action_space():
    """loco specs: range_min==range_min_pol==-3 -> identity with clamp
    (loco_imitation.yaml:54-59)."""
    n = uniform(54, real_min=-3.0, real_max=3.0, norm_min=-3.0, norm_max=3.0)
    x = jnp.linspace(-2.9, 2.9, 54)
    assert np.allclose(n.norm_to_real(x), np.asarray(x), atol=1e-6)


def test_project_on_vector():
    v = jnp.asarray([1.0, 2.0, 3.0])
    u = jnp.asarray([0.0, 1.0, 0.0])
    assert np.allclose(project_on_vector(v, u), [0, 2, 0])


def test_transform_compose_inverse():
    rng = np.random.default_rng(0)
    qa = quat.normalize(jnp.asarray(rng.normal(size=4)))
    pa = jnp.asarray(rng.normal(size=3))
    qb = quat.normalize(jnp.asarray(rng.normal(size=4)))
    pb = jnp.asarray(rng.normal(size=3))
    x = jnp.asarray(rng.normal(size=3))
    # (a∘b)(x) == a(b(x))
    qc, pc = compose(qa, pa, qb, pb)
    assert np.allclose(apply(qc, pc, x), apply(qa, pa, apply(qb, pb, x)),
                       atol=1e-5)
    # a∘a^-1 == identity
    qi, pi = inverse(qa, pa)
    qe, pe = compose(qa, pa, qi, pi)
    assert np.allclose(apply(qe, pe, x), np.asarray(x), atol=1e-5)
