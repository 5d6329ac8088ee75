"""Matrix-free Pallas APGD: solve the contact cone QP without ever
materializing the Delassus operator.

Why: the r4 device trace (docs/PERF_r4.md) shows the warm-substep contact
path is pure HBM bandwidth.  The dense path forms W = M^-1 J^T and
A = J W — (B,60,72)/(B,72,72) batched matmuls whose operands and results
round-trip HBM every substep: contacts.py:268-269 alone touch 21.8 GB of
the ~85 GB a 5-control-step trace accesses, plus the feature-major
transposes feeding the dense VMEM solver.  But APGD only ever needs A
through its action A @ y, and A = J M^-1 J^T: with M^-1 and J resident in
VMEM per batch block, A @ y = J (M^-1 (J^T y)) costs three unrolled FMA
sweeps over (rows, batch-lanes) tiles.  Per-substep HBM traffic for the
solve drops from ~275 MB to ~45 MB (one read each of M^-1, two J layouts,
and the small cone vectors).

Step sizes: the per-contact Gershgorin bounds 1/L_k need |A|'s rows,
which matrix-free cannot see.  The caller passes them in, carried from
the control step's REBUILD substep, where the dense operator is formed
anyway (cold solve, 16 iters).  A step size is a preconditioner — it
never moves the solve's FIXED POINT — but at apgd_warm_iters=5 the solve
is approximate, and the carried sizes are per-SLOT while the top-K
contact selection reorders slots between substeps, so a misassigned
large 1/L makes the truncated iterates overshoot.  Measured result
(tools/compare_mf_apgd.py): trajectory divergence 8.84x the intrinsic
chaos rate — FAILS the same gate that rejected the held operator —
and the perf A/B showed +9% sim_only but only +0.1% on the full env
step at B=2048.  use_mf_apgd therefore stays opt-in (default off);
the kernel is kept as the reference implementation of the matrix-free
dataflow (and for configs with larger warm budgets, where the
truncation gap closes).

Reference behavior: Bullet re-forms and re-solves its contact constraints
every substep inside stepSimulation (the reference drives it at
envs/env_humanoid_tracking.py:393-399); this kernel keeps exactly that
freshness with TPU-shaped dataflow.

Layouts (per grid cell, batch block Bt on the lane axis):
  Minv  (nvp, nvp, Bt)  symmetric damped-mass inverse, zero-padded to nvp
  Ja    (R, nvp, Bt)    Ja[i] = row i of J           (row-major sweep)
  Jt    (nvp, R, Bt)    Jt[m] = column m of J        (col-major sweep)
  cone vectors (R, Bt) / (K, Bt); outputs lam (R, Bt), dv (nvp, Bt)
All sweeps index the MAJOR axis with static (unrolled) indices — Mosaic
TC has no dynamic slice on the tiled minor axes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .apgd_kernel import _momentum_betas, _round_up

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _make_mf_kernel(K: int, nv: int, nvp: int, iters: int):
    betas = _momentum_betas(iters)
    R = 3 * K

    def kernel(Minv_ref, Ja_ref, Jt_ref, vp_ref, bb_ref, n_ref, t1_ref,
               t2_ref, act_ref, mu_ref, invL_ref, lam0_ref,
               lam_out, dv_out):
        n = n_ref[:]
        t1 = t1_ref[:]
        t2 = t2_ref[:]
        Ja = Ja_ref[:].astype(jnp.float32)    # (R, nvp, Bt)
        Jt = Jt_ref[:].astype(jnp.float32)    # (nvp, R, Bt)
        Mi = Minv_ref[:].astype(jnp.float32)  # (nvp, nvp, Bt)

        def jt_mul(y):
            """u = J^T y: accumulate rows of J scaled by y's rows."""
            u = Ja[0] * y[0:1]
            for i in range(1, R):
                u = u + Ja[i] * y[i:i + 1]
            return u                            # (nvp, Bt)

        def minv_mul(u):
            """w = M^-1 u (symmetric: row sweep == column sweep).  Rows
            >= nv are zero padding — skipped."""
            w = Mi[0] * u[0:1]
            for m in range(1, nv):
                w = w + Mi[m] * u[m:m + 1]
            return w                            # (nvp, Bt)

        def j_mul(w):
            """g = J w: accumulate columns of J scaled by w's rows."""
            g = Jt[0] * w[0:1]
            for m in range(1, nv):
                g = g + Jt[m] * w[m:m + 1]
            return g                            # (R, Bt)

        # b = J v_pred + baumgarte bias (bb precomputed as bias*n rows)
        b = j_mul(vp_ref[:]) + bb_ref[:]

        # per-row step sizes from the carried per-contact 1/L_k
        invL = invL_ref[:]
        invL_rows = jnp.concatenate(
            [invL[k:k + 1] for k in range(K) for _ in range(3)], axis=0)

        def project(li):
            """Friction-cone projection per contact (identical maths to
            apgd_kernel._make_kernel.project)."""
            rows = []
            for k in range(K):
                s = slice(3 * k, 3 * k + 3)
                ln = (li[3 * k] * n[3 * k] + li[3 * k + 1] * n[3 * k + 1]
                      + li[3 * k + 2] * n[3 * k + 2])
                ln = jnp.maximum(ln, 0.0)
                lt1 = (li[3 * k] * t1[3 * k] + li[3 * k + 1] * t1[3 * k + 1]
                       + li[3 * k + 2] * t1[3 * k + 2])
                lt2 = (li[3 * k] * t2[3 * k] + li[3 * k + 1] * t2[3 * k + 1]
                       + li[3 * k + 2] * t2[3 * k + 2])
                lt = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
                scale = jnp.minimum(
                    1.0, mu_ref[k] * ln / jnp.maximum(lt, 1e-9))
                a = act_ref[k]
                for i in range(3):
                    rows.append((ln * n[s][i] + scale * lt1 * t1[s][i]
                                 + scale * lt2 * t2[s][i]) * a)
            return jnp.stack(rows, axis=0)

        # warm start only: the rebuild substep always cold-solves dense
        lam = project(lam0_ref[:])
        y = lam
        for it in range(iters):
            g = b + j_mul(minv_mul(jt_mul(y)))
            lam_new = project(y - invL_rows * g)
            y = lam_new + betas[it] * (lam_new - lam)
            lam = lam_new
        lam_out[:] = lam
        # dv = M^-1 J^T lam comes free from one more half-sweep
        dv_out[:] = minv_mul(jt_mul(lam))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("K", "nv", "iters", "interpret",
                                    "block"))
def apgd_mf_fm(Minv_fm, Ja_fm, Jt_fm, vp_fm, bb_fm, n_fm, t1_fm, t2_fm,
               act_fm, mu_fm, invL_fm, lam0_fm, K: int, nv: int,
               iters: int, interpret: bool = False, block: int = 128):
    """Feature-major entry: trailing dim of every arg is batch B.
    Returns (lam (R, B) f32, dv (nvp, B) f32)."""
    R = 3 * K
    nvp = Minv_fm.shape[0]
    B = bb_fm.shape[-1]
    Bt = min(block, _round_up(B, 128))
    Bp = _round_up(B, Bt)
    if Bp != B:
        pad = lambda x: jnp.pad(
            x, ((0, 0),) * (x.ndim - 1) + ((0, Bp - B),))
        (Minv_fm, Ja_fm, Jt_fm, vp_fm, bb_fm, n_fm, t1_fm, t2_fm, act_fm,
         mu_fm, invL_fm, lam0_fm) = (
            pad(x) for x in (Minv_fm, Ja_fm, Jt_fm, vp_fm, bb_fm, n_fm,
                             t1_fm, t2_fm, act_fm, mu_fm, invL_fm,
                             lam0_fm))

    kernel = _make_mf_kernel(K, nv, nvp, iters)

    def spec2(rows):
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def spec3(d0, d1):
        return pl.BlockSpec((d0, d1, Bt), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    lam, dv = pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[spec3(nvp, nvp), spec3(R, nvp), spec3(nvp, R),
                  spec2(nvp), spec2(R), spec2(R), spec2(R), spec2(R),
                  spec2(K), spec2(K), spec2(K), spec2(R)],
        out_specs=[spec2(R), spec2(nvp)],
        out_shape=[jax.ShapeDtypeStruct((R, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((nvp, Bp), jnp.float32)],
        interpret=interpret,
    )(Minv_fm, Ja_fm, Jt_fm, vp_fm, bb_fm, n_fm, t1_fm, t2_fm, act_fm,
      mu_fm, invL_fm, lam0_fm)
    return lam[:, :B], dv[:, :B]


def apgd_mf_solve(Minv, J, v_pred, bias, n, t1, t2, act, mu, invL, lam0,
                  iters: int, interpret: bool = False):
    """Batch-major adapter.

    Minv (B,nv,nv) any float dtype; J (B,K,3,nv); v_pred (B,nv);
    bias (B,K) Baumgarte normal-velocity bias; n/t1/t2 (B,K,3) cone
    basis; act/mu/invL (B,K); lam0 (B,K,3) warm start.
    Returns (dv (B,nv) f32, lam (B,K,3) f32).
    """
    B, K = act.shape
    nv = Minv.shape[-1]
    R = 3 * K
    # pad nv to the bf16 sublane tile (16): the carried inverse arrives
    # bf16 on the perf path and is cast to f32 per-tile IN the kernel —
    # never materialized as f32 in HBM
    nvp = _round_up(nv, 16)

    fm = lambda x: jnp.transpose(x.reshape(B, -1), (1, 0))

    def padv(x_fm, rows):
        return jnp.pad(x_fm, ((0, rows - x_fm.shape[0]), (0, 0)))

    Minv_fm = jnp.transpose(Minv, (1, 2, 0))
    Minv_fm = jnp.pad(Minv_fm, ((0, nvp - nv), (0, nvp - nv), (0, 0)))
    Jf = J.reshape(B, R, nv).astype(jnp.float32)
    Ja_fm = jnp.pad(jnp.transpose(Jf, (1, 2, 0)),
                    ((0, 0), (0, nvp - nv), (0, 0)))
    Jt_fm = jnp.transpose(Jf, (2, 1, 0))  # (nv, R, B): rows >= nv absent
    Jt_fm = jnp.pad(Jt_fm, ((0, nvp - nv), (0, 0), (0, 0)))
    vp_fm = padv(fm(v_pred.astype(jnp.float32)), nvp)
    bb = bias[..., None] * n  # (B,K,3) bias along the contact normal
    lam, dv = apgd_mf_fm(
        Minv_fm, Ja_fm, Jt_fm, vp_fm, fm(bb), fm(n), fm(t1), fm(t2),
        jnp.transpose(act, (1, 0)).astype(jnp.float32),
        jnp.transpose(mu, (1, 0)).astype(jnp.float32),
        jnp.transpose(invL, (1, 0)).astype(jnp.float32),
        fm(lam0), K=K, nv=nv, iters=iters, interpret=interpret)
    return (jnp.transpose(dv[:nv], (1, 0)),
            jnp.transpose(lam, (1, 0)).reshape(B, K, 3))
