#!/usr/bin/env python
"""2-process multi-host dryrun (VERDICT r3 item 6).

Runs ONE full PPO training step (vmapped humanoid env rollout + GAE +
minibatch SGD with gradient pmean) on an 8-device `data` mesh two ways:

  a) 2 processes x 4 virtual CPU devices, joined via
     jax.distributed.initialize (gloo collectives) — the multi-host DCN
     path that replaces the reference's Ray head/client bootstrap
     (rllib_driver.py:87-117);
  b) 1 process x 8 virtual CPU devices — the single-controller baseline.

Both run the identical program (same mesh shape, same seeds), so the
resulting parameters must agree; any divergence beyond cross-process
reduction-order noise fails the run.

Usage:  python tools/dryrun_multihost.py            # orchestrates a+b
        (child invocations use --role, internal)
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 9733
N_GLOBAL = 8


def _child_env(n_local):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}").strip()
    return env


def run_step_and_dump(out_path):
    """Body executed in every child: one PPO step on the global 8-device
    mesh; process 0 dumps the flattened updated params."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from physicsvae_tpu.parallel.distributed import (init_distributed,
                                                     process_info)
    init_distributed()
    print("topology:", process_info(), flush=True)

    import numpy as np
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    import jax.numpy as jnp  # noqa: F401

    from physicsvae_tpu.env import make_env
    from physicsvae_tpu.parallel.mesh import make_mesh
    from physicsvae_tpu.train.ppo import PPOConfig, PPOTrainer

    assert len(jax.devices()) == N_GLOBAL, jax.devices()
    mesh = make_mesh(N_GLOBAL)

    # Warmup collective: form the gloo context while process skew is
    # seconds (compiling the full PPO program first can stagger the two
    # processes past gloo's 30 s rendezvous timeout on a loaded host).
    warm = jax.jit(shard_map(lambda x: jax.lax.psum(x, "data"), mesh,
                             in_specs=(P("data"),), out_specs=P()))
    jax.block_until_ready(warm(jnp.ones((N_GLOBAL,), jnp.float32)))
    print("warmup psum ok", flush=True)

    env = make_env("/root/reference/data/spec/loco/loco_test.yaml",
                   project_dir="/root/reference")
    cfg = PPOConfig(num_envs=2 * N_GLOBAL, rollout_length=2,
                    num_sgd_iter=2, sgd_minibatch_size=4)
    tr = PPOTrainer(env, cfg, jax.random.PRNGKey(0), mesh_axis="data")

    def train_step(params, opt_state, rng):
        # env state is created INSIDE the sharded region from the shard's
        # own seeds — no host-side global array construction, which is
        # exactly what makes the program multi-controller-safe.
        idx = jax.lax.axis_index("data")
        k_env = jax.random.fold_in(jax.random.PRNGKey(1), idx)
        rngs = jax.random.split(k_env, cfg.num_envs // N_GLOBAL)
        env_state = jax.vmap(env.reset)(rngs)
        obs = jax.vmap(env.observe)(env_state)
        rng = jax.random.fold_in(rng, idx)
        env_state, obs, rng, traj, _ = tr.rollout(params, env_state, obs,
                                                  rng)
        params, opt_state, rng, metrics = tr.update_epochs(
            params, opt_state, traj, rng)
        return params, opt_state, metrics

    sharded = jax.jit(shard_map(
        train_step, mesh, in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P())))
    params, _, metrics = sharded(tr.params, tr.opt_state,
                                 jax.random.PRNGKey(2))
    jax.block_until_ready(params)
    print("metrics:", {k: float(v) for k, v in metrics.items()}, flush=True)

    if jax.process_index() == 0:
        leaves = jax.tree.leaves(params)
        flat = np.concatenate([np.asarray(x).ravel() for x in leaves])
        np.save(out_path, flat)
        print("params dumped:", out_path, flat.shape, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="orchestrate")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.role == "child":
        run_step_and_dump(args.out)
        return 0

    import numpy as np

    tmp = "/tmp/pvae_multihost"
    os.makedirs(tmp, exist_ok=True)
    me = os.path.abspath(__file__)

    # (a) 2 processes x 4 devices, distributed.  Port is per-run (a fixed
    # port collides with an earlier run's TIME_WAIT socket).
    port = PORT + os.getpid() % 1000
    procs, logs = [], []
    for pid in range(2):
        env = _child_env(4)
        env.update(PVAE_COORDINATOR=f"localhost:{port}",
                   PVAE_NUM_PROCESSES="2", PVAE_PROCESS_ID=str(pid))
        log = open(f"{tmp}/child{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, me, "--role", "child",
             "--out", f"{tmp}/dist.npy"], env=env, cwd=REPO,
            stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=1800) for p in procs]
    for log in logs:
        log.close()
    for pid in range(2):
        with open(f"{tmp}/child{pid}.log") as f:
            body = f.read()
        print(f"--- child {pid} (rc={rcs[pid]}) ---\n" + body[-2000:],
              flush=True)
    assert rcs == [0, 0], f"distributed children failed: {rcs}"

    # (b) single process x 8 devices
    rc = subprocess.run(
        [sys.executable, me, "--role", "child",
         "--out", f"{tmp}/single.npy"],
        env=_child_env(8), cwd=REPO, timeout=1800).returncode
    assert rc == 0, f"single-process child failed: {rc}"

    a = np.load(f"{tmp}/dist.npy")
    b = np.load(f"{tmp}/single.npy")
    diff = float(np.abs(a - b).max())
    bitwise = bool((a == b).all())
    print(f"multi-host vs single-process params: max|diff|={diff:.3e} "
          f"bitwise={bitwise} over {a.size} params")
    assert diff < 1e-6, "multi-host PPO step diverged from single-process"
    print("dryrun_multihost OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
