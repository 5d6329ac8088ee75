#!/usr/bin/env python
"""LOCAL truncation-error fidelity gate for contact-solver cadences.

Why a second instrument beside tools/compare_hold_contacts.py: the
trajectory gate measures 30-control-step divergence against the BASELINE
path and normalizes by the growth of a single 1e-6 seed perturbation.
That is the right test for cadences that change the PHYSICS seen by the
solver (stale geometry — the r4 held-operator failed it at 8.5-11.5x and
deserved to).  But it cannot distinguish "worse physics" from "different
solver-iterate noise": any change to the APGD iterate path — even one
that brings the solve CLOSER to the true solution — re-randomizes the
per-substep truncation noise, which the chaotic humanoid then amplifies
every substep.  Measured demonstration: raising apgd_warm_iters from 5
to 12 (strictly more accurate, identical fixed point) scores 18x on the
trajectory gate.  By that yardstick a MORE converged solver is "worse
physics", which is absurd — the yardstick saturates for solver-internal
changes.

This tool measures what actually matters instead: the ONE-CONTROL-STEP
(16-substep) error of each path against a CONVERGED reference solve of
the same discretization (dense f32 XLA, 100 APGD iterations everywhere,
exact Cholesky inverse refreshed every substep, no bf16).  Over an
ensemble of contact-rich scramble states, a cadence is faithful if its
local error is no worse than the shipping baseline's own truncation
noise (ratio gate <= 1.5 median / 2.0 p95).  Chaos cannot confound this:
16 substeps bound the amplification equally for every path.

Run on TPU (the cadences under test are TPU-only):
    python tools/fidelity_local.py [--batch 256] [--out FILE.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


REF_OVERRIDES = dict(
    apgd_iters=100, apgd_warm_iters=100, ns_refine_every=1, ns_iters=2,
    cold_inverse="chol", matmul_bf16=False, use_pallas_apgd=False,
    use_fused_dynamics=False, fuse_selection=False, fuse_self_narrow=False,
    carry_minv=False, hold_selection=False,
)

# "baseline" = the per-substep dense path (hold_selection became the
# DEFAULT in r5, so it must be disabled explicitly here).
VARIANTS = {
    "baseline": dict(hold_selection=False),
    "hold_selection": dict(hold_selection=True),
    "hold_selection_8": dict(hold_selection=True, hold_selection_every=8),
    "mf_matched": dict(hold_selection=False, use_mf_apgd=True),
}


def build_physical_states(model, B, seed=0):
    """PHYSICAL ensemble: poses + true finite-difference velocities
    sampled from the loco reference clips at random times — the state
    distribution the carried-inverse hot path actually sees (seeds are
    1/fps_con stale along smooth motion; the NS self-healing guard stays
    inactive, unlike on the scramble ensemble)."""
    import glob

    from physicsvae_tpu.kinematics import motion as motion_mod
    from physicsvae_tpu.kinematics.char_info import load_char_info
    from physicsvae_tpu.physics import state as state_mod

    char = load_char_info(
        "/root/reference/data/character/info/loco_char_info.py")
    clips = sorted(glob.glob(
        "/root/reference/data/motion/loco/random_loco_*.bvh"))[:3]
    motions = [motion_mod.from_bvh_file(f, char) for f in clips]
    rng = np.random.RandomState(seed)
    dt_con = model.params.num_substeps * model.params.dt_sim
    sts, tq1, tq2 = [], [], []
    for b in range(B):
        m = motions[b % len(motions)]
        t = rng.uniform(0.5, (m.num_frames - 2) / m.fps - 0.5)
        rp, rq, jq = motion_mod.pose_at_time(m, t)
        rv, rw, jw = motion_mod.velocity_at_time(m, t)
        sts.append(state_mod.from_pose(model, rp, rq, jq, rv, rw, jw))
        # TRACKING probe actions: SPD targets = the clip's next poses,
        # i.e. what a perfect imitation policy commands — the action
        # distribution the carried-inverse hot path actually runs under
        # (an identity-T-pose target from mid-clip states is far more
        # violent and diverges a 16-substep-stale inverse spuriously)
        tq1.append(motion_mod.pose_at_time(m, t + dt_con)[2])
        tq2.append(motion_mod.pose_at_time(m, t + 2 * dt_con)[2])
    st = jax.tree.map(lambda *x: jnp.stack(x), *sts)
    return st, (np.asarray(jnp.stack(tq1)), np.asarray(jnp.stack(tq2)))


def build_states(model, B, seed=0):
    """Contact-rich scramble ensemble: limbs near/into the ground with
    random velocities (same generator family as compare_hold_contacts)."""
    from physicsvae_tpu.kinematics import motion as motion_mod
    from physicsvae_tpu.kinematics.char_info import load_char_info
    from physicsvae_tpu.physics import state as state_mod

    char = load_char_info(
        "/root/reference/data/character/info/loco_char_info.py")
    m = motion_mod.from_bvh_file(
        "/root/reference/data/motion/loco/loco_hierarchy.bvh", char)
    root_p, root_q, joint_q = motion_mod.pose_at_time(m, 0.0)
    rng = np.random.RandomState(seed)
    rp = (np.tile(np.asarray(root_p), (B, 1))
          + np.concatenate([rng.randn(B, 1) * 0.05,
                            rng.uniform(-0.35, 0.1, (B, 1)),
                            rng.randn(B, 1) * 0.05], axis=-1))
    q = rng.normal(size=(B, 4)).astype(np.float32)
    q[:, 3] += 2.0
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    J = joint_q.shape[0]
    jq = np.asarray(jnp.broadcast_to(joint_q, (B, J, 4))).copy()
    pert = rng.normal(scale=0.25, size=(B, J, 4)).astype(np.float32)
    jq = jq + pert
    jq /= np.linalg.norm(jq, axis=-1, keepdims=True)
    st = state_mod.from_pose(model, jnp.asarray(rp.astype(np.float32)),
                             jnp.asarray(q), jnp.asarray(jq))
    vel = rng.normal(scale=0.6, size=(B, model.nv)).astype(np.float32)
    return state_mod.SimState(st.root_p, st.root_q, st.joint_q,
                              jnp.asarray(vel))


def one_control_step(overrides, st_np, B):
    from physicsvae_tpu.physics import model as model_mod
    from physicsvae_tpu.physics import state as state_mod
    from physicsvae_tpu.physics import step as step_mod

    params = model_mod.SimParams(**overrides)
    model = model_mod.load_loco_model(params=params)
    st = state_mod.SimState(*[jnp.asarray(a) for a in st_np])
    J = model.num_joints
    act = step_mod.Action(
        target_q=jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]), (B, J, 4)),
        target_w=jnp.zeros((B, J, 3)))

    @jax.jit
    def run(st):
        return jax.vmap(lambda s, a: step_mod.control_step(model, s, a))(
            st, act)

    t0 = time.perf_counter()
    out = run(st)
    jax.block_until_ready(out.vel)
    print(f"[{overrides or 'baseline'}] {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    return np.asarray(out.root_p), np.asarray(out.vel)


def two_control_steps(overrides, st_np, B, carry_iters=None, targets=None):
    """TWO control steps from the scramble state; with carry_iters the
    second step goes through control_step_carry seeded by the first's
    33 ms-stale inverse with `seed_refine_iters=carry_iters` f32 NS
    refinements — the exact env hot path (ImitationEnv.step_core).
    Without carry_iters both steps cold-start (the converged-reference /
    baseline shape)."""
    from physicsvae_tpu.physics import model as model_mod
    from physicsvae_tpu.physics import state as state_mod
    from physicsvae_tpu.physics import step as step_mod
    from physicsvae_tpu.physics.dynamics import dynamics_terms
    from physicsvae_tpu.physics.fk import fk
    from physicsvae_tpu.physics.linalg import spd_inverse

    params = model_mod.SimParams(**overrides)
    model = model_mod.load_loco_model(params=params)
    st = state_mod.SimState(*[jnp.asarray(a) for a in st_np])
    J = model.num_joints
    if targets is None:
        iq = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]), (B, J, 4))
        tq1 = tq2 = iq
    else:
        tq1, tq2 = (jnp.asarray(t) for t in targets)
    tw = jnp.zeros((B, J, 3))
    act1 = step_mod.Action(target_q=tq1, target_w=tw)
    act2 = step_mod.Action(target_q=tq2, target_w=tw)

    @jax.jit
    def run(st):
        if carry_iters is None:
            s1 = jax.vmap(lambda s, a: step_mod.control_step(model, s, a))(
                st, act1)
            s2 = jax.vmap(lambda s, a: step_mod.control_step(model, s, a))(
                s1, act2)
            return s2

        def seed(s):
            k = fk(model, s)
            _, M, _ = dynamics_terms(model, s, k)
            return spd_inverse(step_mod._damped_mass_matrix(
                model, M, model.params.dt_sim))

        Minv0 = jax.vmap(seed)(st)
        s1, Minv1, _ = jax.vmap(
            lambda s, a, m: step_mod.control_step_carry(
                model, s, a, m, seed_refine_iters=carry_iters))(
                    st, act1, Minv0)
        s2, _, _ = jax.vmap(
            lambda s, a, m: step_mod.control_step_carry(
                model, s, a, m, seed_refine_iters=carry_iters))(
                    s1, act2, Minv1.astype(jnp.float32))
        return s2

    t0 = time.perf_counter()
    out = run(st)
    jax.block_until_ready(out.vel)
    print(f"[carry={carry_iters} {overrides or 'default'}] "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)
    return np.asarray(out.root_p), np.asarray(out.vel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--carry", action="store_true",
                    help="gate the carried-inverse seed_refine_iters "
                         "variants over TWO control steps instead of the "
                         "cadence variants over one")
    ap.add_argument("--physical", action="store_true",
                    help="sample initial states from the loco clips with "
                         "their true velocities instead of the contact "
                         "scramble (the right ensemble for --carry: the "
                         "scramble keeps the NS guard active, which hides "
                         "the seed-iteration count)")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from physicsvae_tpu.physics import model as model_mod
    model = model_mod.load_loco_model()
    targets = None
    if args.physical:
        st, targets = build_physical_states(model, args.batch,
                                            seed=args.seed)
    else:
        st = build_states(model, args.batch, seed=args.seed)
    st_np = tuple(np.asarray(a) for a in
                  (st.root_p, st.root_q, st.joint_q, st.vel))

    if args.carry:
        p_ref, v_ref = two_control_steps(REF_OVERRIDES, st_np, args.batch,
                                         targets=targets)
        results = {
            "baseline": two_control_steps({}, st_np, args.batch,
                                          targets=targets),
            "carry_sr3": two_control_steps({}, st_np, args.batch,
                                           carry_iters=3, targets=targets),
            "carry_sr2": two_control_steps({}, st_np, args.batch,
                                           carry_iters=2, targets=targets),
        }
        gate_and_report(args, results, p_ref, v_ref)
        return

    p_ref, v_ref = one_control_step(REF_OVERRIDES, st_np, args.batch)

    # Rows where even the converged reference diverges within one control
    # step are unphysical scrambles (a contact scramble can legitimately
    # blow up in 16 substeps); they carry no fidelity information and
    # would NaN-poison every percentile, so errors are compared on the
    # mutually finite subset.  Divergence-RATE differences between a
    # variant and the baseline remain a gated signal (a cadence that NaNs
    # rows the baseline survives is broken even if its finite rows agree).
    results = {}
    for name, over in VARIANTS.items():
        results[name] = one_control_step(over, st_np, args.batch)
    gate_and_report(args, results, p_ref, v_ref)


def gate_and_report(args, results, p_ref, v_ref):
    def finite_rows(pv):
        p, v = pv
        return (np.isfinite(p).all(axis=tuple(range(1, p.ndim)))
                & np.isfinite(v).all(axis=tuple(range(1, v.ndim))))

    ok_ref = finite_rows((p_ref, v_ref))
    ok_base = finite_rows(results["baseline"]) & ok_ref
    report = {"batch": args.batch, "seed": args.seed,
              "ref_finite_rows": int(ok_ref.sum()), "per_variant": {}}
    errs = {}
    for name, (p, v) in results.items():
        okv = finite_rows((p, v))
        mask = ok_base & okv
        ev = np.linalg.norm(v[mask] - v_ref[mask], axis=-1)
        ep = np.linalg.norm(p[mask] - p_ref[mask], axis=-1)
        errs[name] = (ev, int((ok_base & ~okv).sum()))
        report["per_variant"][name] = {
            "finite_rows": int(okv.sum()),
            "diverged_where_baseline_finite": errs[name][1],
            "vel_err_median": float(np.median(ev)),
            "vel_err_p95": float(np.percentile(ev, 95)),
            "vel_err_max": float(ev.max()),
            "pos_err_median": float(np.median(ep)),
            "pos_err_max": float(ep.max()),
        }
        print(f"{name:>16}: n={mask.sum()} vel err median "
              f"{np.median(ev):.5f} p95 {np.percentile(ev, 95):.5f} "
              f"max {ev.max():.5f} | pos err median {np.median(ep):.6f} | "
              f"+diverged {errs[name][1]}")

    base, _ = errs["baseline"]
    report["gates"] = {}
    ok_all = True
    div_budget = max(2, int(0.02 * args.batch))
    for name in results:
        if name == "baseline":
            continue
        ev, n_div = errs[name]
        r_med = float(np.median(ev) / max(np.median(base), 1e-12))
        r_p95 = float(np.percentile(ev, 95)
                      / max(np.percentile(base, 95), 1e-12))
        ok = r_med <= 1.5 and r_p95 <= 2.0 and n_div <= div_budget
        ok_all &= ok
        report["gates"][name] = {"median_ratio": r_med, "p95_ratio": r_p95,
                                 "extra_diverged": n_div, "ok": ok}
        print(f"GATE {name}: median ratio {r_med:.2f} (<=1.5), "
              f"p95 ratio {r_p95:.2f} (<=2.0), extra diverged {n_div} "
              f"(<={div_budget}) -> {'OK' if ok else 'FAIL'}")
    report["ok"] = ok_all
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()


# Converged-reference methodology: the reference engine (Bullet) itself
# truncates at 10 sequential-impulse iterations per substep
# (envs/env_humanoid_tracking.py:241-250), so "faithful" for a cadence
# means: no more local error than the shipping baseline's own solver
# truncation, measured against the converged solve of the SAME
# discretization.
