"""TPU-lowering probe for the default-on Pallas kernels.

Round-3 postmortem: a kernel edit introduced `jnp.arctan2`, which Mosaic
has no lowering rule for; the kernel flags default on, so every TPU run
of the default hot path crashed (BENCH_r03.json).  This module closes
that failure class twice over:

  (a) `apply_kernel_probe(model)` — called at model-build time — lowers
      each default-on kernel for the TPU target ONCE (lowering only, no
      compile: Mosaic runs during StableHLO lowering, which is where the
      unimplemented-primitive errors surface).  A kernel that fails to
      lower gets its flag switched off with a warning, so the engine
      degrades to the XLA path instead of crashing at run time.
  (b) `tests/test_tpu_lowering.py` runs the same probes on the CPU test
      mesh via cross-platform lowering (`lowering_platforms=("tpu",)`)
      — the regression gate that would have failed at round-3 HEAD.

No reference counterpart (the reference has no kernels); TPU-rebuild
infrastructure.
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp


def lower_for_tpu(fn, *args):
    """Trace fn(*args) and run the TPU (Mosaic) lowering, on any host
    platform.  Raises (typically NotImplementedError) if any Pallas
    kernel inside cannot lower for TPU."""
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _probe_state(model, B=8):
    from ..physics.state import SimState
    J = model.num_joints
    ident = jnp.concatenate([jnp.zeros((3,)), jnp.ones((1,))])
    return SimState(
        root_p=jnp.zeros((B, 3)),
        root_q=jnp.tile(ident, (B, 1)),
        joint_q=jnp.tile(ident, (B, J, 1)),
        vel=jnp.zeros((B, model.nv)),
    )


def probe_model_kernels(model, B=8, K=32):
    """Lower every kernel the model's flags put on the default hot path.

    Returns {probe_name: None | error_string}; only probes kernels whose
    flag is on.  Pure lowering — safe to run without a TPU attached."""
    p = model.params
    results = {}

    def attempt(name, thunk):
        try:
            thunk()
            results[name] = None
        except Exception as e:  # noqa: BLE001 — any lowering error gates
            results[name] = f"{type(e).__name__}: {e}"

    if p.use_fused_dynamics:
        from .dyn_kernel import (dynamics_terms_fused,
                                 dynamics_terms_fused_lean)
        st = _probe_state(model, B)
        attempt("dyn_full", lambda: lower_for_tpu(
            lambda s: dynamics_terms_fused(model, s), st))
        if p.fuse_warm_kernel:
            attempt("dyn_lean", lambda: lower_for_tpu(
                lambda s: dynamics_terms_fused_lean(model, s), st))
            if p.actuation == "spd":
                J = model.num_joints
                tq = jnp.tile(jnp.concatenate(
                    [jnp.zeros((3,)), jnp.ones((1,))]), (B, J, 1))
                tw = jnp.zeros((B, J, 3))
                attempt("dyn_lean_spd", lambda: lower_for_tpu(
                    lambda s, a, b_: dynamics_terms_fused_lean(
                        model, s, a, b_), st, tq, tw))

    if p.use_pallas_apgd:
        from .apgd_kernel import apgd_solve
        A = jnp.zeros((B, K, 3, K, 3))
        v3 = jnp.zeros((B, K, 3))
        sc = jnp.zeros((B, K))
        for name, iters, warm in (("apgd_cold", p.apgd_iters, False),
                                  ("apgd_warm", p.apgd_warm_iters, True)):
            attempt(name, lambda it=iters, w=warm: lower_for_tpu(
                lambda A_, b_, n_, t1, t2, act, mu, l0: apgd_solve(
                    A_, b_, n_, t1, t2, act, mu, l0, it, w),
                A, v3, v3, v3, v3, sc, sc, v3))

    if p.use_pallas_fk:
        from .fk_kernel import fk_pallas
        st = _probe_state(model, B)
        attempt("fk", lambda: lower_for_tpu(
            lambda s: fk_pallas(model, s), st))

    if p.use_mf_apgd:
        from .apgd_mf_kernel import apgd_mf_solve
        nv = model.nv
        Kc = p.num_contacts + (p.num_self_contacts if p.self_collision
                               and model.self_pairs.shape[0] > 0 else 0)
        Mi = jnp.zeros((B, nv, nv))
        Jm = jnp.zeros((B, Kc, 3, nv))
        vp = jnp.zeros((B, nv))
        v3 = jnp.zeros((B, Kc, 3))
        sc = jnp.zeros((B, Kc))
        attempt("apgd_mf", lambda: lower_for_tpu(
            lambda *a: apgd_mf_solve(*a, p.apgd_warm_iters),
            Mi, Jm, vp, sc, v3, v3, v3, sc, sc, sc, v3))

    return results


_PROBE_CACHE = {}


def apply_kernel_probe(model):
    """Return `model`, with any kernel flag whose kernel fails TPU
    lowering switched off (and a warning emitted).  No-op when tracing
    for a non-TPU backend (kernels are already gated off there) or when
    every flagged kernel lowers cleanly.  Cached per kernel-relevant
    model config."""
    import dataclasses

    p = model.params
    flags_on = (p.use_fused_dynamics or p.use_pallas_apgd
                or p.use_pallas_fk or p.use_mf_apgd)
    if not flags_on or jax.default_backend() != "tpu":
        return model

    key = (model.num_joints, model.nv, int(model.point_body.shape[0]),
           p.actuation, p.use_fused_dynamics, p.fuse_warm_kernel,
           p.use_pallas_apgd, p.use_pallas_fk, p.use_mf_apgd,
           p.apgd_iters, p.apgd_warm_iters, p.self_collision,
           p.fuse_self_narrow, int(model.self_pairs.shape[0]))
    if key in _PROBE_CACHE:
        overrides = _PROBE_CACHE[key]
    else:
        results = probe_model_kernels(model)
        overrides = {}
        bad = {k: v for k, v in results.items() if v is not None}
        dyn_bad = {"dyn_full", "dyn_lean", "dyn_lean_spd"} & set(bad)
        if dyn_bad and p.self_collision and p.fuse_self_narrow \
                and model.self_pairs.shape[0] > 0:
            # retry the dynamics kernels without the in-kernel self-
            # collision narrow phase before giving up on them entirely
            import dataclasses as _dc
            m2 = _dc.replace(model, params=_dc.replace(
                p, fuse_self_narrow=False))
            retry = probe_model_kernels(m2)
            if all(retry.get(n) is None for n in dyn_bad):
                overrides["fuse_self_narrow"] = False
                for n in dyn_bad:
                    del bad[n]
        if "dyn_full" in bad:
            overrides["use_fused_dynamics"] = False
            overrides["fuse_warm_kernel"] = False
        if "dyn_lean" in bad or "dyn_lean_spd" in bad:
            overrides["fuse_warm_kernel"] = False
        if "apgd_cold" in bad or "apgd_warm" in bad:
            overrides["use_pallas_apgd"] = False
        if "apgd_mf" in bad:
            overrides["use_mf_apgd"] = False
        if "fk" in bad:
            overrides["use_pallas_fk"] = False
        for name, err in bad.items():
            warnings.warn(
                f"Pallas kernel '{name}' failed TPU lowering; falling "
                f"back to the XLA path ({err.splitlines()[-1][:200]})",
                RuntimeWarning, stacklevel=2)
        _PROBE_CACHE[key] = overrides

    if not overrides:
        return model
    return dataclasses.replace(
        model, params=dataclasses.replace(p, **overrides))
