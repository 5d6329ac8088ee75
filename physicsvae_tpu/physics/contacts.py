"""Ground-contact detection and impulse solve.

TPU-native replacement for Bullet's narrow phase + sequential-impulse LCP
(reference solver params at envs/env_humanoid_tracking.py:241-250: 10 solver
iterations, cone friction).  Design (SURVEY.md §7 Phase 1):

  - A fixed set of candidate points (sphere centers, capsule endpoints, box
    corners) is tested against the ground plane/heightmap every substep.
  - The deepest K candidates form a fixed-size contact buffer (shape-static
    for vmap); inactive slots are masked.
  - Impulses are solved with projected Gauss–Seidel on the Delassus operator
    A = J M^-1 J^T with a friction cone |λ_t| <= mu λ_n, Baumgarte
    stabilization, zero restitution (loco char_info restitution = 0).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .model import PhysicsModel


class Contacts(NamedTuple):
    pos: jnp.ndarray      # (...,K,3) world contact point
    depth: jnp.ndarray    # (...,K) penetration depth (>0 means penetrating)
    active: jnp.ndarray   # (...,K) bool
    body: jnp.ndarray     # (...,K) int body index
    point_idx: jnp.ndarray  # (...,K) candidate index


def detect_ground(model: PhysicsModel, x, ground=0.0):
    """Penetration depth of every candidate point vs the ground.

    x: (...,NP,3) world candidate positions.  `ground` is either a scalar
    plane height or an env.ground.Heightmap (terrain height sampled under
    each point — replaces Bullet rayTestBatch ground queries,
    envs/env_humanoid_tracking.py:295-345).  Returns (...,NP) depth
    (positive = penetrating) along the env up-axis.
    """
    up = jnp.asarray(model.v_up_env, dtype=x.dtype)
    if hasattr(ground, "height_at"):
        gh = ground.height_at(x[..., 0], x[..., 2])
    else:
        gh = ground
    h = jnp.einsum("...i,i->...", x, up) - gh
    return jnp.asarray(model.point_radius) - h


def select_contacts(model: PhysicsModel, x, depth, margin=0.0):
    """Top-K deepest candidates as a fixed-size contact set (stable ranking
    matmul — one fused comparison-reduce instead of K argmax sweeps)."""
    cons, _ = select_contacts_oh(model, x, depth, margin)
    return cons


def select_contacts_oh(model: PhysicsModel, x, depth, margin=0.0):
    """select_contacts that also returns the (...,K,NP) selection one-hot —
    the held-contact cadence reuses it as a gather matrix to refresh the
    held slots' penetration depths each warm substep."""
    from .linalg import topk_rank

    K = min(model.params.num_contacts, depth.shape[-1])
    d, idx, oh = topk_rank(depth, K)
    active = d > -margin
    pos = jnp.einsum("...kp,...pf->...kf", oh, x)
    body_f = jnp.asarray(model.point_body, jnp.float32)
    body = jnp.einsum("...kp,p->...k", oh, body_f).astype(jnp.int32)
    return Contacts(pos=pos, depth=d, active=active, body=body,
                    point_idx=idx), oh


class GroundSel(NamedTuple):
    """Selected ground contacts (select-then-transpose path): the K
    deepest candidates, already gathered.  Batch-major after the
    custom_vmap rule."""
    pos: jnp.ndarray        # (...,K,3)
    depth: jnp.ndarray      # (...,K)
    body: jnp.ndarray       # (...,K) int32
    point_idx: jnp.ndarray  # (...,K) int32


class SelfSel(NamedTuple):
    """Selected self-collision contacts (select-then-transpose path)."""
    pos: jnp.ndarray        # (...,K2,3)
    normal: jnp.ndarray     # (...,K2,3)
    depth: jnp.ndarray      # (...,K2)
    body_i: jnp.ndarray     # (...,K2) int32
    body_j: jnp.ndarray     # (...,K2) int32
    pair_idx: jnp.ndarray   # (...,K2) int32 index into the static pair list


def detect_ground_fm(model: PhysicsModel, x_fm, ground=0.0):
    """Feature-major detect_ground: x_fm (3*NP, B) kernel rows (point p's
    world position at rows 3p..3p+2, batch on lanes).  Returns depth
    (NP, B).  Same maths as detect_ground — the dot with the up axis is
    written out component-wise so it stays lane-parallel elementwise."""
    NP_ = x_fm.shape[0] // 3
    xr = x_fm.reshape(NP_, 3, x_fm.shape[-1])            # (NP,3,B)
    up = [float(u) for u in model.v_up_env]
    h = sum(up[i] * xr[:, i, :] for i in range(3) if up[i] != 0.0)
    if hasattr(ground, "height_at"):
        gh = ground.height_at(xr[:, 0, :], xr[:, 2, :])
    else:
        gh = ground
    return jnp.asarray(model.point_radius)[:, None] - (h - gh)


def select_contacts_fm(model: PhysicsModel, x_fm, depth_fm):
    """Feature-major top-K ground selection + gather: x_fm (3NP,B),
    depth_fm (NP,B) -> GroundSel in FEATURE-major form
    (pos (K,3,B), depth (K,B), body (K,B), point_idx (K,B)).

    Identical selections and (exact one-hot) gathers as
    select_contacts_oh; the gathers are written as multiply-reduce so
    they run as lane-parallel VPU loop fusions instead of MXU-padded
    per-env matvecs (the tiny-K one-hot einsums cost ~10 ms/trace
    batch-major, r4 device trace)."""
    from .linalg import topk_rank_fm

    NP_ = depth_fm.shape[0]
    K = min(model.params.num_contacts, NP_)
    d, idx, oh = topk_rank_fm(depth_fm, K)               # (K,B)/(K,NP,B)
    xr = x_fm.reshape(NP_, 3, x_fm.shape[-1])
    pos = jnp.sum(oh[:, :, None, :] * xr[None], axis=1)  # (K,3,B)
    body_f = jnp.asarray(model.point_body, jnp.float32)[None, :, None]
    body = jnp.sum(oh * body_f, axis=1).astype(jnp.int32)  # (K,B)
    return GroundSel(pos=pos, depth=d, body=body, point_idx=idx)


def contact_jacobian(model: PhysicsModel, k_fk, contacts: Contacts):
    """J: (...,K,3,NV) mapping generalized velocity -> world velocity of each
    contact point (rows: world x,y,z)."""
    axis = k_fk.dof_axis            # (...,NV,3)
    anchor = k_fk.dof_pos           # (...,NV,3)
    is_ang = jnp.asarray(model.dof_is_ang)
    anc = jnp.asarray(model.anc)    # (NB,NV)

    # Row-major assembly: build the 3 world rows as (...,K,NV) planes and
    # stack on axis -2.  Same arithmetic as cross() on a 3-minor layout,
    # but the output is born (...,K,3,NV) — no (...,K,NV,3) intermediate
    # and no swapaxes relayout (47 MB r+w per substep at B=2048; the
    # Jacobian-build lines were 8 ms / 13 GB of the r4 device trace).
    ax, ay, az = (axis[..., None, :, 0], axis[..., None, :, 1],
                  axis[..., None, :, 2])                     # (...,1,NV)
    rx = contacts.pos[..., :, 0:1] - anchor[..., None, :, 0]  # (...,K,NV)
    ry = contacts.pos[..., :, 1:2] - anchor[..., None, :, 1]
    rz = contacts.pos[..., :, 2:3] - anchor[..., None, :, 2]
    J0 = jnp.where(is_ang, ay * rz - az * ry, jnp.broadcast_to(ax, rx.shape))
    J1 = jnp.where(is_ang, az * rx - ax * rz, jnp.broadcast_to(ay, rx.shape))
    J2 = jnp.where(is_ang, ax * ry - ay * rx, jnp.broadcast_to(az, rx.shape))
    mask = anc[contacts.body]                  # (...,K,NV)
    return jnp.stack([J0, J1, J2], axis=-2) * mask[..., None, :]


def _inv3(m):
    """Closed-form inverse of batched 3x3 matrices (avoids TPU LU
    custom-calls)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    adj = jnp.stack([
        jnp.stack([A, D, G], axis=-1),
        jnp.stack([B, E, H], axis=-1),
        jnp.stack([C, F, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _apgd_xla(A, b, n, t1, t2, act, mu, inv_L, lam0, iters: int,
              warm: bool):
    """Reference APGD loop on one (unbatched) contact system — the
    fallback body of the custom_vmap dispatch below (the Pallas kernel
    handles the batched case).  inv_L=None derives the per-contact
    Gershgorin step bound from A (same formula as the Pallas kernel)."""
    K = act.shape[-1]

    def project(li):
        ln = jnp.maximum(jnp.einsum("...ki,...ki->...k", li, n), 0.0)
        lt1 = jnp.einsum("...ki,...ki->...k", li, t1)
        lt2 = jnp.einsum("...ki,...ki->...k", li, t2)
        lt = jnp.sqrt(lt1 ** 2 + lt2 ** 2 + 1e-12)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(lt, 1e-9))
        li = (ln[..., None] * n + (scale * lt1)[..., None] * t1
              + (scale * lt2)[..., None] * t2)
        return li * act[..., None]

    Af = A.reshape(A.shape[:-4] + (K * 3, K * 3))
    if inv_L is None:
        rowsum = jnp.sum(jnp.abs(Af), axis=-1)
        L_k = jnp.max(rowsum.reshape(rowsum.shape[:-1] + (K, 3)), axis=-1)
        inv_L = 1.0 / jnp.maximum(L_k, 1e-8)

    def mv(lam):
        return jnp.einsum(
            "...ij,...j->...i", Af.astype(jnp.bfloat16),
            lam.reshape(lam.shape[:-2] + (K * 3,)).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32
        ).reshape(lam.shape)

    inv_Lr = inv_L[..., None]

    def step(carry, _):
        lam, y, t = carry
        g = b + mv(y)
        lam_new = project(y - inv_Lr * g)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = lam_new + ((t - 1.0) / t_new) * (lam_new - lam)
        return (lam_new, y_new, t_new), None

    l0 = project(lam0) if warm else lam0
    (lam, _, _), _ = jax.lax.scan(step, (l0, l0, jnp.asarray(1.0)), None,
                                  length=iters)
    return lam


_APGD_DISPATCH = {}


def _apgd_dispatch(K: int, iters: int, warm: bool):
    """custom_vmap: unbatched calls use the XLA loop; vmapped calls route
    to the VMEM-resident Pallas kernel (ops/apgd_kernel.py) — the same
    dispatch pattern as physics/fk.fk."""
    key = (K, iters, warm)
    if key not in _APGD_DISPATCH:
        from jax import custom_batching

        @custom_batching.custom_vmap
        def _apgd(A, b, n, t1, t2, act, mu, lam0):
            # inv_L=None: the unbatched fallback derives its Gershgorin
            # steps from A, exactly like the kernel does in VMEM — the
            # caller never builds an XLA-side abs-sum pass over A.
            return _apgd_xla(A, b, n, t1, t2, act, mu, None, lam0,
                             iters, warm)

        @_apgd.def_vmap
        def _rule(axis_size, in_batched, *args):
            from ..ops.apgd_kernel import apgd_solve
            # constants (e.g. scalar-mu broadcasts) arrive unbatched
            args = tuple(
                a if bt else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, bt in zip(args, in_batched))
            A, b, n, t1, t2, act, mu, lam0 = args
            out = apgd_solve(A, b, n, t1, t2, act.astype(jnp.float32),
                             mu, lam0, iters, warm)
            return out, True

        _APGD_DISPATCH[key] = _apgd
    return _APGD_DISPATCH[key]


def solve_contacts(model: PhysicsModel, Minv, J, v_pred, contacts: Contacts,
                   dt, normals=None, mu=None, lam_warm=None,
                   extra_inv_mass=None, vc_offset=None):
    """Cone-constrained contact impulse solve (APGD).

    Minv: explicit inverse of the damped mass matrix, (...,NV,NV).
    J: (...,K,3,NV).  v_pred: (...,NV) post-force velocity.
    normals: (...,K,3) per-contact normals; None -> all env-up (ground).
    mu: (...,K) per-contact friction; None -> params.mu everywhere (Bullet
    multiplies the two bodies' coefficients, so char-char contacts get
    mu_char^2 while char-ground gets mu_char * mu_ground).
    lam_warm: optional (...,K,3) impulse warm start from the previous
    substep (Bullet warm-starts its sequential impulses the same way);
    with it, half the APGD iterations reach the same solution quality.
    extra_inv_mass: optional (...,K) inverse mass of a free body on the
    other side of each contact (0 for static ground/self rows) — adds
    1/m * I3 to that contact's Delassus diagonal block, which is exactly
    the two-body Delassus operator for a non-rotating free body (dynamic
    obstacles).  The free body's velocity change is -lam/m.
    vc_offset: optional (...,K,3) velocity of the other body at the
    contact, subtracted from the contact-point velocity (constraints act
    on RELATIVE velocity).
    Returns (delta_v (...,NV), impulses (...,K,3)).
    """
    op = build_operator(model, Minv, J, v_pred.dtype, normals=normals,
                        mu=mu, extra_inv_mass=extra_inv_mass)
    return solve_with_operator(model, op, v_pred, contacts.depth,
                               contacts.active, dt, lam_warm=lam_warm,
                               vc_offset=vc_offset)


class ContactOperator(NamedTuple):
    """The loop-invariant half of the contact solve: Jacobian, Delassus
    operator, cone bases, step bounds.

    The held-contact cadence (SimParams.hold_contacts) builds this once on
    the first substep of a control step and reuses it across the warm
    substeps (the contact SET barely changes within 1/fps_con), so the
    Delassus build (J M^-1 J^T — the single most bandwidth-hungry op in the
    r4 device trace), the top-K ranking, and the Jacobian build all leave
    the per-substep path; warm substeps only refresh depths (one-hot
    gathers), b, and the APGD solve.  Same cadence trick as the held mass
    inverse (ns_refine_every=0).  Bullet instead re-runs its narrow phase
    + factorization every substep (envs/env_humanoid_tracking.py:393-399).
    """
    J: jnp.ndarray       # (...,K,3,NV)
    W: jnp.ndarray       # (...,NV,3K)  M^-1 J^T
    A: jnp.ndarray       # (...,K,3,K,3) Delassus (+ any free-body diagonal)
    n: jnp.ndarray       # (...,K,3) contact normals
    t1: jnp.ndarray      # (...,K,3) tangent basis
    t2: jnp.ndarray      # (...,K,3)
    mu: jnp.ndarray      # (...,K) friction coefficients
    inv_L: jnp.ndarray   # (...,K,1) Gershgorin steps; None when the Pallas
    #                      kernel derives them in VMEM


def cone_basis(n, dtype):
    """Per-contact tangent basis orthogonal to the normal."""
    ref = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0], dtype),
                    jnp.asarray([0.0, 1.0, 0.0], dtype))
    t2 = jnp.cross(n, ref)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-8)
    t1 = jnp.cross(t2, n)
    return t1, t2


def gershgorin_invL(A):
    """Per-contact inverse Gershgorin step bounds 1/L_k from a dense
    Delassus operator (...,K,3,K,3) -> (...,K).  The matrix-free warm
    path (solve_contacts_mf) carries these from the rebuild substep."""
    K = A.shape[-4]
    batch = A.shape[:-4]
    Af = A.reshape(batch + (K * 3, K * 3))
    rowsum = jnp.sum(jnp.abs(Af), axis=-1).reshape(batch + (K, 3))
    L_k = jnp.max(rowsum, axis=-1)
    return 1.0 / jnp.maximum(L_k, 1e-8)


def build_operator(model: PhysicsModel, Minv, J, dtype, normals=None,
                   mu=None, extra_inv_mass=None):
    """Delassus operator + cone geometry for a fixed contact set.  See
    solve_contacts for argument semantics."""
    p = model.params
    K = J.shape[-3]
    nv = model.nv
    batch = J.shape[:-3]
    bf16 = p.matmul_bf16

    def mm(sub, a, b):
        if bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.einsum(sub, a, b, preferred_element_type=dtype)

    Jf = J.reshape(batch + (K * 3, nv))
    W = mm("...ij,...kj->...ik", Minv, Jf)                    # (...,nv,3K)
    A = mm("...ik,...kj->...ij", Jf, W)                       # (...,3K,3K)
    A = A.reshape(batch + (K, 3, K, 3))
    if extra_inv_mass is not None:
        # two-body coupling: += 1/m I3 on each contact's diagonal block
        eye_blocks = (jnp.eye(K)[:, None, :, None]
                      * jnp.eye(3)[None, :, None, :])          # (K,3,K,3)
        A = A + extra_inv_mass[..., :, None, None, None] * eye_blocks
    if bf16:
        # Store W in bf16: both consumers (the A build above and the
        # delta_v einsum in solve_with_operator) cast it to bf16 anyway,
        # so the values are bit-identical — this just moves the convert
        # into the dot epilogue and halves the (…,NV,3K) HBM round trip,
        # the single largest stream of the per-substep operator build
        # (r4 device trace: contacts.py build lines = 21 ms / 22 GB).
        W = W.astype(jnp.bfloat16)

    up = jnp.asarray(model.v_up_env, dtype=dtype)
    if normals is None:
        n = jnp.broadcast_to(up, batch + (K, 3))
    else:
        n = normals
    t1, t2 = cone_basis(n, dtype)

    mu_k = jnp.broadcast_to(jnp.asarray(p.mu if mu is None else mu, dtype),
                            batch + (K,))

    # Per-contact Jacobi preconditioning (Chrono does the same): the step
    # size for contact k is 1/L_k with L_k a Gershgorin bound over that
    # contact's 3 rows, instead of one global 1/L.  Light feet no longer
    # crawl at the step size dictated by the heaviest contact, which
    # roughly halves the iterations needed for the same slip error.  The
    # Pallas kernel derives these in VMEM from the A tile it already holds,
    # so the XLA-side pass over A is only built for the XLA solver path.
    from .step import kernels_on_tpu
    if p.use_pallas_apgd and kernels_on_tpu():
        inv_L = None
        # The VMEM APGD kernel consumes A in bf16 (ops/apgd_kernel.py);
        # casting here instead of in the adapter is bit-identical and
        # halves the Delassus write + feature-major transpose traffic.
        A = A.astype(jnp.bfloat16)
    else:
        inv_L = gershgorin_invL(A)[..., None]               # (...,K,1)
    return ContactOperator(J=J, W=W, A=A, n=n, t1=t1, t2=t2, mu=mu_k,
                           inv_L=inv_L)


def solve_with_operator(model: PhysicsModel, op: ContactOperator, v_pred,
                        depth, active, dt, lam_warm=None, vc_offset=None):
    """The state-dependent half of the contact solve: fresh contact-point
    velocities and Baumgarte bias against the (possibly held) operator,
    then the APGD cone QP.  Returns (delta_v (...,NV), impulses (...,K,3))."""
    p = model.params
    K = op.J.shape[-3]
    batch = v_pred.shape[:-1]
    f32 = v_pred.dtype
    bf16 = p.matmul_bf16

    n, t1, t2, mu = op.n, op.t1, op.t2, op.mu

    vc = jnp.einsum("...kin,...n->...ki", op.J, v_pred)        # (...,K,3)
    if vc_offset is not None:
        vc = vc - vc_offset

    # Desired normal velocity: Baumgarte push-out, no restitution.
    bias = -p.baumgarte / dt * jnp.maximum(depth - p.contact_slop, 0.0)
    b = vc + bias[..., None] * n                               # (...,K,3)

    act = active.astype(f32)

    def project(li):
        ln = jnp.einsum("...ki,...ki->...k", li, n)
        ln = jnp.maximum(ln, 0.0)
        lt1 = jnp.einsum("...ki,...ki->...k", li, t1)
        lt2 = jnp.einsum("...ki,...ki->...k", li, t2)
        lt = jnp.sqrt(lt1 ** 2 + lt2 ** 2 + 1e-12)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(lt, 1e-9))
        li = (ln[..., None] * n
              + (scale * lt1)[..., None] * t1
              + (scale * lt2)[..., None] * t2)
        return li * act[..., None]

    # Accelerated projected gradient (APGD, Nesterov momentum) on the cone-
    # constrained QP  min 0.5 lam^T A lam + lam^T b.  A sequential
    # Gauss–Seidel sweep would be K*iters dependent gather+LU steps per
    # substep — pathological on TPU; APGD is one batched matmul + projection
    # per iteration (tpu-first redesign of Bullet's sequential impulse
    # solver; same approach as Chrono's GPU solver).
    if lam_warm is None:
        lam0 = jnp.zeros(batch + (K, 3), dtype=f32)
        iters = p.apgd_iters
        warm = False
    else:
        lam0 = lam_warm
        iters = p.apgd_warm_iters
        warm = True

    from .step import kernels_on_tpu
    if p.use_pallas_apgd and kernels_on_tpu():
        lam = _apgd_dispatch(K, iters, warm)(
            op.A, b, n, t1, t2, act, mu, lam0)
    else:
        Af = op.A.reshape(batch + (K * 3, K * 3))
        Af_mv = Af.astype(jnp.bfloat16) if bf16 else Af
        inv_L = op.inv_L
        if inv_L is None:   # operator built under a different backend pick
            rowsum = jnp.sum(jnp.abs(Af), axis=-1).reshape(batch + (K, 3))
            inv_L = (1.0 / jnp.maximum(jnp.max(rowsum, axis=-1),
                                       1e-8))[..., None]

        def mv(lam):
            lam = lam.reshape(batch + (K * 3,))
            if bf16:
                lam = lam.astype(jnp.bfloat16)
            return jnp.einsum("...ij,...j->...i", Af_mv, lam,
                              preferred_element_type=f32
                              ).reshape(batch + (K, 3))

        def apgd_iter(carry, _):
            lam, y, t = carry
            g = b + mv(y)
            lam_new = project(y - inv_L * g)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            y_new = lam_new + ((t - 1.0) / t_new) * (lam_new - lam)
            return (lam_new, y_new, t_new), None

        if warm:
            # project the carried impulse (the active set / cone may have
            # changed since last substep)
            lam0 = project(lam0)
        (lam, _, _), _ = jax.lax.scan(
            apgd_iter, (lam0, lam0, jnp.asarray(1.0, f32)), None,
            length=iters)

    # delta_v = M^-1 J^T lam = W lam
    lam_f = lam.reshape(batch + (K * 3,))
    if bf16:
        delta_v = jnp.einsum("...nk,...k->...n",
                             op.W.astype(jnp.bfloat16),
                             lam_f.astype(jnp.bfloat16),
                             preferred_element_type=f32)
    else:
        delta_v = jnp.einsum("...nk,...k->...n", op.W, lam_f)
    return delta_v, lam


_MF_DISPATCH = {}


def _apgd_mf_dispatch(K: int, nv: int, iters: int):
    """custom_vmap for the matrix-free warm solve: unbatched calls build
    the dense operator in XLA (same fixed point, f32); vmapped calls
    route to the matrix-free VMEM kernel (ops/apgd_mf_kernel.py)."""
    key = (K, nv, iters)
    if key not in _MF_DISPATCH:
        from jax import custom_batching

        @custom_batching.custom_vmap
        def _mf(Minv, J, v_pred, bias, n, t1, t2, act, mu, invL, lam0):
            Mi = Minv.astype(jnp.float32)
            Jf = J.reshape(K * 3, nv).astype(jnp.float32)
            W = jnp.einsum("ij,kj->ik", Mi, Jf)            # (nv,3K)
            A = jnp.einsum("ik,kj->ij", Jf, W).reshape(K, 3, K, 3)
            vc = jnp.einsum("kin,n->ki", J, v_pred)
            b = vc + bias[..., None] * n
            lam = _apgd_xla(A, b, n, t1, t2, act, mu, invL, lam0,
                            iters, warm=True)
            dv = jnp.einsum("nk,k->n", W, lam.reshape(K * 3))
            return dv, lam

        @_mf.def_vmap
        def _rule(axis_size, in_batched, *args):
            from ..ops.apgd_mf_kernel import apgd_mf_solve
            args = tuple(
                a if bt else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, bt in zip(args, in_batched))
            Minv, J, v_pred, bias, n, t1, t2, act, mu, invL, lam0 = args
            dv, lam = apgd_mf_solve(Minv, J, v_pred, bias, n, t1, t2,
                                    act, mu, invL, lam0, iters)
            return (dv, lam), (True, True)

        _MF_DISPATCH[key] = _mf
    return _MF_DISPATCH[key]


def solve_contacts_mf(model: PhysicsModel, Minv, J, v_pred, depth, active,
                      dt, lam_warm, invL, normals, mu=None):
    """Warm contact solve against FRESH J and M^-1 with CARRIED step
    sizes: matrix-free APGD, no Delassus/W materialization in HBM
    (ops/apgd_mf_kernel.py).  The fixed point is identical to
    solve_contacts on the same inputs — invL only conditions the
    iteration — so, unlike the held-operator cadence, staleness cannot
    move the physics.  Returns (delta_v (...,NV), impulses (...,K,3))."""
    p = model.params
    K = J.shape[-3]
    f32 = v_pred.dtype
    n = normals
    t1, t2 = cone_basis(n, f32)
    bias = -p.baumgarte / dt * jnp.maximum(depth - p.contact_slop, 0.0)
    act = active.astype(f32)
    mu_k = jnp.broadcast_to(jnp.asarray(p.mu if mu is None else mu, f32),
                            depth.shape)
    return _apgd_mf_dispatch(K, model.nv, p.apgd_warm_iters)(
        Minv, J, v_pred, bias, n, t1, t2, act, mu_k, invL, lam_warm)
