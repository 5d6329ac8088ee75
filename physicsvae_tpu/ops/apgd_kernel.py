"""Pallas VMEM-resident APGD contact solver.

Why: the APGD matvec re-reads the Delassus matrix A from HBM every
iteration — 16 GB / 42 ms per 80-substep trace at B=2048 (r3 trace,
contacts.py).  This kernel keeps A resident in VMEM across ALL iterations
(one 21 MB read per substep instead of ~8) and runs the projections on
(rows, batch) tiles.

Design notes vs the r2 kernel that lost in-context (docs/PERF_r2.md):
  - A stays bf16 end-to-end (the XLA path's matvec input is bf16 too, so
    there is no precision change and half the traffic of the r2 f32-A).
  - No extra input materialization: XLA materializes A anyway (it is the
    output of the Delassus matmul); the only added cost is one transpose
    to feature-major.
  - The per-env matvec runs as a fori_loop over columns: each step is one
    fused multiply-add on a (3K, Bt) tile — no cross-lane reductions, no
    MXU misuse on per-env matrices.
  - Nesterov momentum coefficients are a deterministic scalar sequence,
    precomputed on the host and unrolled statically.

Bit-faithfulness: validated against contacts.solve_contacts in interpret
mode (tests/test_apgd_kernel.py); the accumulation order of the matvec
differs (column-major FMA vs XLA's dot), so agreement is to f32 rounding,
not bit-exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _round_up(x, m):
    return (x + m - 1) // m * m


def _momentum_betas(iters: int):
    """Static Nesterov sequence: beta_k = (t_k - 1) / t_{k+1}."""
    t = 1.0
    betas = []
    for _ in range(iters):
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
        betas.append((t - 1.0) / t_new)
        t = t_new
    return betas


def _make_kernel(K: int, iters: int, project_warm: bool):
    """Kernel over one batch block.

    Refs (feature-major, trailing dim = batch block Bt):
      A_ref   (3K, 3K, Bt) bf16   Delassus, column-leading: A_ref[j] is
                                  the j-th column of the batch-major A
      b_ref   (3K, Bt)  f32
      n_ref   (3K, Bt)  f32       per-contact normal (rows 3k..3k+2)
      t1_ref  (3K, Bt)  f32       tangent 1
      t2_ref  (3K, Bt)  f32       tangent 2
      act_ref (K, Bt)   f32
      mu_ref  (K, Bt)   f32
      lam0_ref(3K, Bt)  f32
      out_ref (3K, Bt)  f32

    Per-contact Gershgorin step sizes are computed IN-KERNEL from the
    VMEM-resident bf16 A (the operator the matvec actually iterates on) —
    this removed the XLA-side abs-sum pass that re-read the full f32 A
    from HBM every substep.
    """
    betas = _momentum_betas(iters)
    R = 3 * K

    def kernel(A_ref, b_ref, n_ref, t1_ref, t2_ref, act_ref, mu_ref,
               lam0_ref, out_ref):
        n = n_ref[:]
        t1 = t1_ref[:]
        t2 = t2_ref[:]
        b = b_ref[:]

        def project(li):
            """Cone projection per contact (same maths as
            contacts.solve_contacts.project)."""
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

        def matvec(y):
            # Mosaic TC has no dynamic_slice, so no fori_loop over
            # columns: one widening multiply-reduce over the whole
            # VMEM-resident block instead (A stays bf16; products and
            # the accumulation run f32 on the VPU).
            yf = y.astype(jnp.bfloat16).astype(jnp.float32)
            A = A_ref[:].astype(jnp.float32)               # (3K, 3K, Bt)
            return jnp.sum(A * yf[:, None, :], axis=0)

        # per-contact Gershgorin step size from the VMEM-resident A:
        # L_k = max over contact k's 3 rows of sum_j |A[i,j]|.  A_ref is
        # column-leading (A_ref[j, i] = A[i, j]), so the row sum is a
        # reduction over axis 0.
        rowsum = jnp.sum(jnp.abs(A_ref[:].astype(jnp.float32)), axis=0)
        invL_rows_list = []
        for k in range(K):
            L_k = jnp.maximum(jnp.maximum(rowsum[3 * k], rowsum[3 * k + 1]),
                              rowsum[3 * k + 2])
            inv = 1.0 / jnp.maximum(L_k, 1e-8)
            invL_rows_list.extend([inv, inv, inv])
        invL_rows = jnp.stack(invL_rows_list, axis=0)

        lam = project(lam0_ref[:]) if project_warm else lam0_ref[:] * 0.0
        y = lam
        for it in range(iters):
            g = b + matvec(y)
            lam_new = project(y - invL_rows * g)
            y = lam_new + betas[it] * (lam_new - lam)
            lam = lam_new
        out_ref[:] = lam

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("K", "iters", "project_warm",
                                    "interpret", "block"))
def apgd_pallas_fm(A_fm, b_fm, n_fm, t1_fm, t2_fm, act_fm, mu_fm,
                   lam0_fm, K: int, iters: int, project_warm: bool,
                   interpret: bool = False, block: int = 256):
    """Feature-major entry: all args have trailing batch dim B.

    A_fm: (3K, 3K, B) bf16 with A_fm[j, i] = A[i, j] of the batch-major
    operator (column-LEADING layout so the fori_loop matvec can
    dynamically index the majormost axis).  Returns lam (3K, B) f32.
    """
    R = 3 * K
    B = b_fm.shape[-1]
    Bt = min(block, _round_up(B, 128))
    Bp = _round_up(B, Bt)
    if Bp != B:
        pad = lambda x: jnp.pad(
            x, ((0, 0),) * (x.ndim - 1) + ((0, Bp - B),))
        A_fm, b_fm, n_fm, t1_fm, t2_fm, act_fm, mu_fm, lam0_fm = (
            pad(x) for x in (A_fm, b_fm, n_fm, t1_fm, t2_fm, act_fm,
                             mu_fm, lam0_fm))

    kernel = _make_kernel(K, iters, project_warm)

    def spec(rows, ndim3=False):
        if ndim3:
            return pl.BlockSpec((R, R, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[spec(None, True), spec(R), spec(R), spec(R), spec(R),
                  spec(K), spec(K), spec(R)],
        out_specs=spec(R),
        out_shape=jax.ShapeDtypeStruct((R, Bp), jnp.float32),
        interpret=interpret,
    )(A_fm, b_fm, n_fm, t1_fm, t2_fm, act_fm, mu_fm, lam0_fm)
    return out[:, :B]


def apgd_solve(A, b, n, t1, t2, act, mu, lam0, iters: int,
               project_warm: bool, interpret: bool = False):
    """Batch-major adapter: A (B,K,3,K,3) f32/bf16; b/n/t1/t2 (B,K,3);
    act/mu (B,K); lam0 (B,K,3).  Returns lam (B,K,3) f32.  Step sizes
    are derived in-kernel (Gershgorin on the bf16 A)."""
    B, K = act.shape
    R = 3 * K
    Af = A.reshape(B, R, R)
    # column-LEADING layout: A_fm[j, i, b] = Af[b, i, j] -> the kernel's
    # A_ref[j] is the j-th COLUMN of the matvec (majormost dynamic index)
    A_fm = jnp.transpose(Af, (2, 1, 0)).astype(jnp.bfloat16)
    fm = lambda x: jnp.transpose(x.reshape(B, -1), (1, 0))
    lam = apgd_pallas_fm(
        A_fm, fm(b), fm(n), fm(t1), fm(t2),
        jnp.transpose(act, (1, 0)).astype(jnp.float32),
        jnp.transpose(mu, (1, 0)).astype(jnp.float32),
        fm(lam0), K=K, iters=iters, project_warm=project_warm,
        interpret=interpret)
    return jnp.transpose(lam, (1, 0)).reshape(B, K, 3)
