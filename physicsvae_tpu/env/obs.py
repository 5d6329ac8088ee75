"""Observation builders.

Bit-compatible re-implementation of the reference's modular state builders
(envs/env_humanoid_base.py:700-843 `_state_body`/`_state_body_raw`,
envs/env_humanoid_imitation.py:210-255 `state_imitation`): same feature set,
same ordering, same frames — vectorized over the batch.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..maths import quaternion as quat
from ..maths import transforms as tf
from ..physics.fk import FKResult, com_and_vel, fk
from ..physics.model import PhysicsModel
from ..physics.state import SimState


@dataclasses.dataclass(frozen=True)
class BodyStateSpec:
    """Feature switches per body_type (envs/env_humanoid_base.py:708-753)."""
    use_facing_frame: bool
    include_com: bool
    include_link_p: bool
    include_link_Q: bool
    include_link_v: bool
    include_link_w: bool
    include_link_R6: bool
    include_root_as_link: bool
    include_root_height: bool
    include_root_up_dir: bool


BODY_TYPES = {
    "facing": BodyStateSpec(True, True, True, True, True, True, False,
                            True, False, False),
    "facing_R6_h": BodyStateSpec(True, False, True, False, True, True, True,
                                 False, True, False),
    "root_R6_h": BodyStateSpec(False, False, True, False, True, True, True,
                               False, True, False),
    "root_R6_h_vup": BodyStateSpec(False, False, True, False, True, True,
                                   True, False, True, True),
}


def body_state_dim(model: PhysicsModel, body_type: str) -> int:
    s = BODY_TYPES[body_type]
    n_links = model.num_joints + (1 if s.include_root_as_link else 0)
    per = (3 * s.include_link_p + 4 * s.include_link_Q + 3 * s.include_link_v
           + 3 * s.include_link_w + 6 * s.include_link_R6)
    return (n_links * per + 6 * s.include_com + s.include_root_height
            + 3 * s.include_root_up_dir)


def reference_frame(model: PhysicsModel, k: FKResult, spec: BodyStateSpec,
                    ground_height=0.0):
    """(R_ref, p_ref) — facing or root frame."""
    root_q = k.body_q[..., 0, :]
    root_p = k.body_p[..., 0, :]
    if spec.use_facing_frame:
        return tf.facing_frame(root_q, root_p,
                               jnp.asarray(model.v_face),
                               jnp.asarray(model.v_up_env), ground_height)
    return quat.to_matrix(root_q), root_p


def _body_feats(model: PhysicsModel, k: FKResult, spec: BodyStateSpec,
                ground_height=0.0):
    """Per-link + extra features in the reference frame, with kind tags so
    relative states can apply quaternion differences to Q entries
    (envs/env_humanoid_imitation.py:238-245).  Returns a list of
    (kind, array): kind "quat" marks (...,L,4) quaternion features."""
    R_ref, p_ref = reference_frame(model, k, spec, ground_height)
    # rows of R_ref^T = columns of R_ref
    RT = jnp.swapaxes(R_ref, -1, -2)

    def to_ref(v):
        return jnp.einsum("...ij,...kj->...ki", RT, v)

    if spec.include_root_as_link:
        sl = slice(0, model.num_bodies)
    else:
        sl = slice(1, model.num_bodies)

    p = k.body_com[..., sl, :]
    q = k.body_q[..., sl, :]
    v = k.body_vcom[..., sl, :]
    w = k.body_w[..., sl, :]

    feats = []
    if spec.include_link_p:
        feats.append(("vec", to_ref(p - p_ref[..., None, :])))
    if spec.include_link_Q:
        R_rel = jnp.einsum("...ij,...kjl->...kil", RT, quat.to_matrix(q))
        feats.append(("quat", quat.halfspace(
            quat.normalize(quat.from_matrix(R_rel)))))
    if spec.include_link_v:
        feats.append(("vec", to_ref(v)))
    if spec.include_link_w:
        feats.append(("vec", to_ref(w)))
    if spec.include_link_R6:
        R = quat.to_matrix(q)
        feats.append(("vec", to_ref(R[..., :, 0])))
        feats.append(("vec", to_ref(R[..., :, 1])))

    extras = []
    if spec.include_com:
        com, com_v = com_and_vel(model, k)
        extras.append(("vec", jnp.einsum("...ij,...j->...i", RT,
                                         com - p_ref)))
        extras.append(("vec", jnp.einsum("...ij,...j->...i", RT, com_v)))

    if spec.include_root_height:
        up = jnp.asarray(model.v_up_env)
        h = jnp.einsum("...i,i->...", k.body_p[..., 0, :], up) - ground_height
        extras.append(("vec", h[..., None]))

    if spec.include_root_up_dir:
        root_R = quat.to_matrix(k.body_q[..., 0, :])
        extras.append(("vec", jnp.einsum("...ij,j->...i", root_R,
                                         jnp.asarray(model.v_up))))
    return feats, extras


def _assemble(feats, extras):
    per_link = jnp.concatenate([a for _, a in feats], axis=-1)  # (...,L,per)
    out = [per_link.reshape(per_link.shape[:-2] + (-1,))]
    out += [a for _, a in extras]
    return out


def body_state(model: PhysicsModel, k: FKResult, body_type: str,
               ground_height=0.0, stacked=True):
    """Proprioceptive state of an agent from its FK result.

    Feature order per link: p, (Q), v, w, (r0, r1) — exactly
    envs/env_humanoid_base.py:797-816.
    """
    spec = BODY_TYPES[body_type]
    out = _assemble(*_body_feats(model, k, spec, ground_height))
    if stacked:
        return jnp.concatenate(out, axis=-1)
    return out


def _quat_difference(q_start, q_end):
    """Bullet getDifferenceQuaternion semantics: flip q_end to q_start's
    hemisphere (nearest), then q_end * q_start^-1."""
    dot = jnp.sum(q_start * q_end, axis=-1, keepdims=True)
    q_end = jnp.where(dot < 0.0, -q_end, q_end)
    return quat.mul(q_end, quat.conjugate(q_start))


def body_state_rel(model: PhysicsModel, k_sim: FKResult, k_kin: FKResult,
                   body_type: str, ground_height=0.0):
    """sim-vs-kin feature difference with quaternion features compared via
    difference quaternions, matching state_imitation's include_rel branch
    (envs/env_humanoid_imitation.py:238-245)."""
    spec = BODY_TYPES[body_type]
    fs, es = _body_feats(model, k_sim, spec, ground_height)
    fk_, ek = _body_feats(model, k_kin, spec, ground_height)
    feats = [(kind, _quat_difference(a_sim, a_kin) if kind == "quat"
              else a_sim - a_kin)
             for (kind, a_sim), (_, a_kin) in zip(fs, fk_)]
    extras = [(kind, a_sim - a_kin)
              for (kind, a_sim), (_, a_kin) in zip(es, ek)]
    return jnp.concatenate(_assemble(feats, extras), axis=-1)


def imitation_task_state(model: PhysicsModel, k_sim: FKResult,
                         kin_fks, body_type: str,
                         include_abs: bool, include_rel: bool,
                         include_facing_frame: bool, ground_height=0.0):
    """Task state from future reference poses (state_imitation,
    envs/env_humanoid_imitation.py:210-255).

    kin_fks: list of FKResult, one per sensor-lookahead time.
    """
    R_sim, p_sim = tf.facing_frame(
        k_sim.body_q[..., 0, :], k_sim.body_p[..., 0, :],
        jnp.asarray(model.v_face), jnp.asarray(model.v_up_env), ground_height)
    RT_sim = jnp.swapaxes(R_sim, -1, -2)

    parts = []
    for k_kin in kin_fks:
        if include_abs:
            parts.append(body_state(model, k_kin, body_type, ground_height))
        if include_rel:
            parts.append(body_state_rel(model, k_sim, k_kin, body_type,
                                        ground_height))
        if include_facing_frame:
            R_kin, p_kin = tf.facing_frame(
                k_kin.body_q[..., 0, :], k_kin.body_p[..., 0, :],
                jnp.asarray(model.v_face), jnp.asarray(model.v_up_env),
                ground_height)
            parts.append(jnp.einsum("...ij,...j->...i", RT_sim, p_kin - p_sim))
            parts.append(jnp.einsum("...ij,...j->...i", RT_sim,
                                    R_kin[..., :, 2]))
    return jnp.concatenate(parts, axis=-1)


def sim_fk(model: PhysicsModel, state: SimState) -> FKResult:
    return fk(model, state)
