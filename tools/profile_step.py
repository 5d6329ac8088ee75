#!/usr/bin/env python
"""Capture a jax.profiler device trace of the batched env step (VERDICT r1
item 2: attack the perf gap with data).  Writes the trace under
/root/repo/.profile/ and prints the top device ops by total duration.

Usage: python tools/profile_step.py [--batch 2048] [--steps 5]
Run alone — never concurrently with another TPU process (tunnel quirk).
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def parse_trace(logdir):
    """Aggregate device-op durations from the perfetto trace.json.gz."""
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        log("no trace.json.gz found")
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Identify device-side process ids (TPU core threads).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "XLA Op" in name or "/device:" in name}
    log(f"processes: {pid_names}")
    tot = defaultdict(float)
    cnt = defaultdict(int)
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    bytes_src = defaultdict(float)
    total_dur = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        a = e.get("args") or {}
        cat = a.get("hlo_category", "?")
        if cat in ("while", "?") and name.startswith(("jit_", "while")):
            continue  # container ops double-count their bodies
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        total_dur += dur
        src = a.get("source", "?")
        # strip the common prefix for readability
        src = src.replace("/root/repo/physicsvae_tpu/", "")
        by_src[src] += dur
        by_cat[cat] += dur
        bytes_src[src] += float(a.get("bytes_accessed", 0))
    print(f"\n=== by hlo_category (ms) ===")
    for k, ms in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms:10.2f} ms  {k}")
    print(f"\n=== by source line (ms, GB accessed) — total "
          f"{total_dur:.1f} ms ===")
    for k, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:10.2f} ms {bytes_src[k]/1e9:8.2f} GB  {k}")
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"\n=== device op totals (ms) — {len(items)} distinct ===")
    for name, ms in items[:25]:
        print(f"{ms:10.2f} ms  x{cnt[name]:<6} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--spec", type=str,
                    default="/root/reference/data/spec/loco/loco_imitation.yaml")
    ap.add_argument("--logdir", type=str, default="/root/repo/.profile")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.logdir)
        return

    from physicsvae_tpu.env import make_env

    t0 = time.perf_counter()
    env = make_env(args.spec, project_dir="/root/reference")
    log(f"[prof] env built ({time.perf_counter()-t0:.0f}s)")

    B = args.batch
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    st = jax.jit(jax.vmap(env.reset))(rngs)
    jax.block_until_ready(st)

    @jax.jit
    def run(st, actions):
        def body(carry, a):
            st = carry
            st, obs, rew, done, _ = jax.vmap(env.step_auto)(st, a)
            return st, rew
        st, rews = jax.lax.scan(body, st, actions)
        return st, rews

    actions = jnp.zeros((args.steps, B, env.dim_action))
    st2, rews = run(st, actions)
    jax.block_until_ready(rews)
    log(f"[prof] compiled+warm ({time.perf_counter()-t0:.0f}s)")

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        st2, rews = run(st, actions)
        jax.block_until_ready(rews)
    log(f"[prof] traced ({time.perf_counter()-t0:.0f}s)")

    t1 = time.perf_counter()
    st2, rews = run(st, actions)
    jax.block_until_ready(rews)
    dt = time.perf_counter() - t1
    log(f"[prof] untraced timed run {dt*1e3:.1f} ms "
        f"-> {B*args.steps/dt:.0f} steps/s")

    parse_trace(args.logdir)


if __name__ == "__main__":
    main()
