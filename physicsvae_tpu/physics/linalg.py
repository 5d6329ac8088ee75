"""Batched SPD linear algebra tuned for TPU.

TPU's XLA Cholesky/TriangularSolve custom-calls are loop-heavy and dominate
the substep at scale (profiled ~15 ms of a 26 ms substep at B=2048).  The
tpu-native design: compute the explicit inverse of the damped mass matrix
once per control step, then keep it current across the 16 substeps with
warm-started Newton–Schulz refinement — two (B,60,60) matmuls per substep
that run on the MXU instead of sequential factorizations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def spd_inverse(M):
    """Exact inverse of a batched SPD matrix via Cholesky (reference path;
    the TPU Cholesky/TriangularSolve custom-calls cost ~13 ms per control
    step at B=2048 — see ns_inverse for the hot-path replacement)."""
    L = jnp.linalg.cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def ns_inverse(M, iters: int = 22):
    """Factorization-free SPD inverse: Jacobi equilibration + Newton–Schulz
    from the Pan–Schreiber seed.

    Pure MXU matmuls — replaces the per-control-step Cholesky custom-call
    (13.2 ms at B=2048 vs ~4 ms of f32 (B,60,60) matmul pairs; r3 device
    trace).  The symmetric equilibration Ms = D^-1/2 M D^-1/2 (D = diag(M))
    makes convergence mass-scale invariant: the damped humanoid mass matrix
    drops from cond ~770 to ~250 (converged by iter 20-22), and extreme
    mass-ratio fixtures (1e6-kg quasi-static base) converge by iter 10
    where the unequilibrated iteration needs 45+.  Runs in f32: bf16 stalls
    at resid ~1 because the tiny early iterates round away the contraction
    (measured).
    """
    d = jnp.sqrt(jnp.diagonal(M, axis1=-2, axis2=-1))
    s = 1.0 / jnp.maximum(d, 1e-12)
    Ms = M * s[..., :, None] * s[..., None, :]
    n1 = jnp.max(jnp.sum(jnp.abs(Ms), axis=-1), axis=-1)
    X = jnp.swapaxes(Ms, -1, -2) / (n1 * n1)[..., None, None]

    def mm(a, b):
        return jnp.einsum("...ij,...jk->...ik", a, b,
                          preferred_element_type=jnp.float32)

    def body(X, _):
        MX = mm(Ms, X)
        X = 2.0 * X - mm(X, MX)
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        return X, None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X * s[..., :, None] * s[..., None, :]


def ns_refine(M, X, iters: int = 2, bf16: bool = False):
    """Newton–Schulz refinement X <- X(2I - MX) toward M^-1.

    Converges quadratically when ||I - MX|| < 1, which holds when X is the
    inverse from the previous substep (M changes O(dt) per 1/480 s substep).
    Symmetrized every iteration to stay SPD.

    bf16: inputs in bfloat16 with f32 accumulation — halves the HBM traffic
    of the two (B,NV,NV) matmuls.  The refinement floor rises to the bf16
    epsilon (~4e-3 relative), which stays well inside the NS contraction
    region, so stability is unaffected; the residual acts like a slightly
    larger solver tolerance.

    Accumulation is always f32 even when the carried X is bf16 (the warm-
    start inverse is stored bf16 on the spd+bf16 path); the 2X-XMX update
    and symmetrization run in f32 and the result is cast back to X.dtype.
    """
    out_dtype = X.dtype
    acc = jnp.float32

    def mm(a, b):
        if bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.einsum("...ij,...jk->...ik", a, b,
                          preferred_element_type=acc)

    for _ in range(iters):
        MX = mm(M, X)
        X = 2.0 * X.astype(acc) - mm(X, MX)
        X = (0.5 * (X + jnp.swapaxes(X, -1, -2))).astype(out_dtype)

    # Self-healing guard: NS DIVERGES (quadratically) when the seed is too
    # stale for the current pose — e.g. a carried inverse on a lane whose
    # sim is flying apart.  A blown-up lane gets the Jacobi diagonal
    # inverse instead: bounded, SPD, and wrong — which is fine, because
    # such lanes hit the sim_div early termination and reset.  Healthy
    # lanes are untouched (legit damped-mass inverses have entries << 1e4;
    # the damping floor bounds ||M_hat^-1|| by ~10).
    bad = (~jnp.isfinite(X).all(axis=(-2, -1))
           | (jnp.max(jnp.abs(X), axis=(-2, -1)) > 1e4))
    d = jnp.diagonal(M, axis1=-2, axis2=-1).astype(out_dtype)
    fallback = (jnp.eye(X.shape[-1], dtype=out_dtype)
                / jnp.maximum(jnp.abs(d), 1e-9)[..., None, :])
    return jnp.where(bad[..., None, None], fallback, X)


def topk_rank(x, K: int):
    """Exact top-K via a stable ranking matmul: ONE fused comparison-reduce
    computes rank_j = #{x_i > x_j} + #{i < j : x_i == x_j}, then a (K,P)
    one-hot selects the winners.

    Replaces K sequential argmax sweeps (each sweep = 3 serialized tiny ops;
    the sweeps cost ~44 ms/trace at B=2048 from dispatch overhead alone —
    r3 device trace, contacts.py:59 + self_collision.py:146).  Ties break by
    index order, matching argmax's first-occurrence rule.

    Returns (vals, idx, onehot) with onehot (...,K,P) in f32 — callers
    gather per-candidate features with ONE einsum against it instead of
    separate one-hot builds.
    """
    P = x.shape[-1]
    xi = x[..., :, None]
    xj = x[..., None, :]
    tri = jnp.triu(jnp.ones((P, P), bool), 1)          # i < j
    rank = jnp.sum((xi > xj) | ((xi == xj) & tri), axis=-2)
    ks = jnp.arange(K)[:, None]
    onehot = (rank[..., None, :] == ks).astype(jnp.float32)  # (...,K,P)
    vals = jnp.einsum("...kp,...p->...k", onehot, x)
    iota = jnp.arange(P, dtype=jnp.float32)
    idx = jnp.einsum("...kp,p->...k", onehot, iota).astype(jnp.int32)
    return vals, idx, onehot


def topk_rank_2stage(x, K: int, chunk: int = 64):
    """Exact top-K for large P via hierarchical ranking.

    Stage 1 ranks within ceil(P/chunk) chunks and keeps each chunk's top-K
    (the global top-K must be among them); stage 2 ranks the finalists.
    The (.., P, P) comparison of the flat ranking shrinks to
    ceil(P/chunk) * chunk^2 + (n_chunks*K)^2 — ~4x fewer comparisons for
    the 263-pair self-collision list.  Returns (vals, idx, onehot) like
    topk_rank, with onehot over the ORIGINAL P.
    """
    P = x.shape[-1]
    n_chunks = -(-P // chunk)
    if n_chunks <= 1 or n_chunks * K >= P:
        return topk_rank(x, K)
    pad = n_chunks * chunk - P
    neg = jnp.finfo(x.dtype).min
    xp = jnp.concatenate(
        [x, jnp.full(x.shape[:-1] + (pad,), neg, x.dtype)], axis=-1) \
        if pad else x
    xc = xp.reshape(x.shape[:-1] + (n_chunks, chunk))
    v1, i1, _ = topk_rank(xc, K)                     # (...,n_chunks,K)
    base = (jnp.arange(n_chunks) * chunk)[:, None]
    gidx = (i1 + base).reshape(x.shape[:-1] + (n_chunks * K,))
    flat = v1.reshape(x.shape[:-1] + (n_chunks * K,))
    v2, i2, oh2 = topk_rank(flat, K)                 # over finalists
    # map finalist positions back to original indices
    idx = jnp.einsum("...kf,...f->...k", oh2,
                     gidx.astype(jnp.float32)).astype(jnp.int32)
    onehot = (idx[..., :, None]
              == jnp.arange(P)[None, :]).astype(jnp.float32)
    return v2, idx, onehot


def topk_rank_fm(x, K: int):
    """Feature-major topk_rank: x (P, B) with the BATCH on the minor
    (lane) axis.  Same stable ranking formula as topk_rank — identical
    selections — but every op is lane-parallel elementwise/reduce work,
    so nothing forces a batch-major relayout of kernel-resident
    feature-major data (the select-then-transpose path: only the K
    selected rows ever get transposed to batch-major).

    Returns (vals (K,B), idx (K,B) int32, onehot (K,P,B) f32)."""
    P = x.shape[0]
    xi = x[:, None, :]
    xj = x[None, :, :]
    tri = jnp.triu(jnp.ones((P, P), bool), 1)[..., None]   # i < j
    rank = jnp.sum((xi > xj) | ((xi == xj) & tri), axis=0)  # (P,B)
    ks = jnp.arange(K)[:, None, None]
    onehot = (rank[None, :, :] == ks).astype(jnp.float32)   # (K,P,B)
    vals = jnp.sum(onehot * x[None, :, :], axis=1)          # (K,B)
    iota = jnp.arange(P, dtype=jnp.float32)[None, :, None]
    idx = jnp.sum(onehot * iota, axis=1).astype(jnp.int32)
    return vals, idx, onehot


def topk_rank_2stage_fm(x, K: int, chunk: int = 64):
    """Feature-major topk_rank_2stage: x (P, B), batch on lanes.  Same
    chunked exact ranking as topk_rank_2stage (identical selections);
    returns (vals (K,B), idx (K,B), onehot (K,P,B))."""
    P = x.shape[0]
    n_chunks = -(-P // chunk)
    if n_chunks <= 1 or n_chunks * K >= P:
        return topk_rank_fm(x, K)
    pad = n_chunks * chunk - P
    neg = jnp.finfo(x.dtype).min
    xp = jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], neg, x.dtype)], axis=0) \
        if pad else x
    xc = xp.reshape(n_chunks, chunk, x.shape[-1])        # (nc,chunk,B)
    # stage 1: rank within each chunk (chunk plays the P role on axis 1)
    xi = xc[:, :, None, :]
    xj = xc[:, None, :, :]
    tri = jnp.triu(jnp.ones((chunk, chunk), bool), 1)[..., None]
    rank1 = jnp.sum((xi > xj) | ((xi == xj) & tri), axis=1)  # (nc,chunk,B)
    ks = jnp.arange(K)[:, None, None, None]
    oh1 = (rank1[None] == ks).astype(jnp.float32)        # (K,nc,chunk,B)
    v1 = jnp.sum(oh1 * xc[None], axis=2)                 # (K,nc,B)
    iota_c = jnp.arange(chunk, dtype=jnp.float32)[None, None, :, None]
    i1 = jnp.sum(oh1 * iota_c, axis=2)                   # (K,nc,B) f32
    base = (jnp.arange(n_chunks, dtype=jnp.float32) * chunk)[None, :, None]
    gidx = (i1 + base)                                   # (K,nc,B)
    # flatten finalists to (nc*K, B); stage-1 emits (K,nc) so transpose
    # the two MAJOR dims (free) to match topk_rank_2stage's (nc,K) order
    flat = jnp.swapaxes(v1, 0, 1).reshape(n_chunks * K, x.shape[-1])
    gflat = jnp.swapaxes(gidx, 0, 1).reshape(n_chunks * K, x.shape[-1])
    v2, _, oh2 = topk_rank_fm(flat, K)                   # (K,B)/(K,F,B)
    idx = jnp.sum(oh2 * gflat[None], axis=1).astype(jnp.int32)  # (K,B)
    onehot = (idx[:, None, :]
              == jnp.arange(P)[None, :, None]).astype(jnp.float32)
    return v2, idx, onehot


def topk_argmax(x, K: int):
    """Exact top-K via K iterated argmax sweeps.

    lax.top_k lowers to a full sort on TPU (~17 ms/trace for the contact
    selects); K cheap reduce+mask sweeps win for small K.  Returns values
    and indices in descending order, like lax.top_k."""
    iota = jnp.arange(x.shape[-1])
    vals, idxs = [], []
    cur = x
    for _ in range(K):
        i = jnp.argmax(cur, axis=-1)
        vals.append(jnp.max(cur, axis=-1))
        idxs.append(i)
        cur = jnp.where(iota == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def onehot_take(feats, idx, bf16: bool = False):
    """Batched row gather feats[..., idx, :] as a one-hot matmul.

    (...,P,F) gathered at (...,K) -> (...,K,F).  TPU gathers of tiny-minor-
    dim rows run at ~1% of bandwidth (r2 trace); the MXU one-hot contraction
    is much faster for small K*P."""
    P = feats.shape[-2]
    dtype = jnp.bfloat16 if bf16 else feats.dtype
    oh = jax.nn.one_hot(idx, P, dtype=dtype)
    f = feats.astype(dtype) if bf16 else feats
    return jnp.einsum("...kp,...pf->...kf", oh, f,
                      preferred_element_type=feats.dtype)


def inverse_quality(M, X):
    """max ||I - MX||_inf over the batch (diagnostic)."""
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    R = eye - jnp.einsum("...ij,...jk->...ik", M, X)
    return jnp.max(jnp.sum(jnp.abs(R), axis=-1))
