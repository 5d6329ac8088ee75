"""TPU-lowering regression gate (VERDICT r3 item 3).

Round 3 shipped a kernel edit (`jnp.arctan2` in ops/dyn_kernel.py) that
Mosaic cannot lower; the whole CPU test suite stayed green because the
Pallas kernels are only exercised in interpret mode there, and the crash
surfaced only on the real chip (BENCH_r03.json).  This gate lowers every
default-on Pallas kernel for the TPU target via cross-platform lowering
(`lowering_platforms=("tpu",)` — Mosaic runs at StableHLO-lowering time,
no TPU needed), so that failure class now fails the suite on CPU.
"""
import jax
import jax.numpy as jnp
import pytest

from physicsvae_tpu.ops import probe as probe_mod
from physicsvae_tpu.physics import model as model_mod


@pytest.fixture(scope="module")
def loco_model():
    return model_mod.load_loco_model()


def test_default_kernels_lower_for_tpu(loco_model):
    """Every kernel the default flags put on the TPU hot path must have a
    clean Mosaic lowering."""
    results = probe_mod.probe_model_kernels(loco_model)
    # The default config must actually exercise the kernels this gate
    # exists to protect.
    assert {"dyn_full", "dyn_lean", "dyn_lean_spd", "apgd_cold",
            "apgd_warm"} <= set(results)
    bad = {k: v for k, v in results.items() if v is not None}
    assert not bad, f"kernels failed TPU lowering: {bad}"


def test_mf_apgd_kernel_lowers_for_tpu():
    """The matrix-free APGD kernel must lower whenever its flag is on
    (it is probed only when use_mf_apgd is set)."""
    import dataclasses

    m = model_mod.load_loco_model(
        params=model_mod.SimParams(use_mf_apgd=True))
    results = probe_mod.probe_model_kernels(m)
    assert "apgd_mf" in results
    assert results["apgd_mf"] is None, results["apgd_mf"]


def test_gate_detects_unlowerable_primitive():
    """Negative control: the gate mechanism must catch the exact round-3
    failure class (an atan2 inside a Pallas TPU kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def bad_kernel(x_ref, o_ref):
        o_ref[...] = jnp.arctan2(x_ref[...], 1.0 + x_ref[...])

    def call(x):
        return pl.pallas_call(
            bad_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    x = jnp.ones((8, 128), jnp.float32)
    with pytest.raises(NotImplementedError):
        probe_mod.lower_for_tpu(call, x)


def test_probe_fallback_disables_failing_flags(loco_model, monkeypatch):
    """apply_kernel_probe must downgrade flags (not raise) when a kernel
    stops lowering, and leave the model untouched when all lower."""
    import warnings

    # Pretend we're on TPU so the probe path runs.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # All-clean: model unchanged (identity).
    probe_mod._PROBE_CACHE.clear()
    m = probe_mod.apply_kernel_probe(loco_model)
    assert m.params.use_fused_dynamics and m.params.use_pallas_apgd

    # Break the dyn-kernel probes: flags must downgrade, with a warning.
    probe_mod._PROBE_CACHE.clear()

    def broken_probe(model, B=8, K=32):
        return {"dyn_full": "NotImplementedError: atan2",
                "dyn_lean": "NotImplementedError: atan2",
                "dyn_lean_spd": "NotImplementedError: atan2",
                "apgd_cold": None, "apgd_warm": None}

    monkeypatch.setattr(probe_mod, "probe_model_kernels", broken_probe)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = probe_mod.apply_kernel_probe(loco_model)
    assert not m.params.use_fused_dynamics
    assert not m.params.fuse_warm_kernel
    assert m.params.use_pallas_apgd  # apgd still on — it lowered
    assert any("falling back" in str(x.message) for x in w)
    probe_mod._PROBE_CACHE.clear()


def test_axis_angle_polynomial_matches_atan2():
    """The Mosaic-lowerable asin-polynomial in ops/dyn_kernel matches the
    atan2 formulation to f32 rounding over the whole quaternion domain."""
    import numpy as np

    from physicsvae_tpu.ops.dyn_kernel import _q_to_axis_angle

    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, 20000)).astype(np.float32)
    q /= np.linalg.norm(q, axis=0, keepdims=True)
    # include near-identity and near-pi quaternions
    q[:, :100] = np.array([[1e-6], [0], [0], [1.0]], dtype=np.float32)
    q[:, 100:200] = np.array([[1.0], [0], [0], [1e-6]], dtype=np.float32)
    out = jnp.stack(_q_to_axis_angle(tuple(jnp.asarray(r) for r in q)))
    # reference (float64 atan2 halfspace formulation)
    qq = q.astype(np.float64)
    sgn = np.where(qq[3] < 0, -1.0, 1.0)
    qq = qq * sgn
    s = np.sqrt((qq[:3] ** 2).sum(0))
    ang = 2.0 * np.arctan2(s, qq[3])
    k = ang / np.maximum(s, 1e-8)
    ref = qq[:3] * k
    assert np.abs(np.asarray(out) - ref).max() < 3e-6
