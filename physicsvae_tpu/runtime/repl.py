"""Interactive runtime loop — the headless equivalent of the reference's
GLUT keyboard surface (envs/rllib_env_imitation.py:383-460 +
env_renderer.py:105-128).

The reference binds keys in a GL window; on a headless TPU host the same
controls run as a line-oriented REPL (pipe commands in for scripting):

  a [N]     auto-play N control steps (default 30) and report reward
  r         reset the episode (fresh RSI)
  q         cycle policy eval method full -> pass_through (reference 'q')
  e         toggle exploration (reference 'e'/'E')
  L [N]     record a demo window of N steps to the replay buffer
            (reference 'L' live demo-record)
  s PATH    save the replay buffer (poses + rewards) to PATH (.npz)
  l PATH    load a replay buffer and make it current
  v PATH    render the current replay buffer to PATH (.mp4/.gif/.png)
  t KEY     toggle a render flag by the reference key binding or name
            (render_module.py:43-67 — e.g. 't 1' ground, 't 3' shadow,
            't 0' cycles follow_cam fixed/pos/pos+rot, 't fog')
  flags     list render flags and their current values
  i         print episode/runner status
  h         help
  x         exit

Usage:
  python -m physicsvae_tpu.runtime.repl --spec <yaml> --project_dir <dir>
      [--checkpoint <orbax dir>] [--eval_method full|pass_through]
"""
from __future__ import annotations

import argparse
import shlex
import sys

import numpy as np


class Replay:
    """Pose-trajectory replay buffer (reference replay record/save/load,
    envs/rllib_env_imitation.py:421-460)."""

    def __init__(self):
        self.frames = []   # (root_p, root_q, joint_q)
        self.rewards = []

    def append(self, sim, reward):
        self.frames.append((np.asarray(sim.root_p), np.asarray(sim.root_q),
                            np.asarray(sim.joint_q)))
        self.rewards.append(float(reward))

    def clear(self):
        self.frames, self.rewards = [], []

    def save(self, path):
        if not self.frames:
            raise ValueError("replay buffer empty")
        np.savez(path,
                 root_p=np.stack([f[0] for f in self.frames]),
                 root_q=np.stack([f[1] for f in self.frames]),
                 joint_q=np.stack([f[2] for f in self.frames]),
                 rewards=np.asarray(self.rewards))
        return path

    @classmethod
    def load(cls, path):
        d = np.load(path)
        r = cls()
        for t in range(d["root_p"].shape[0]):
            r.frames.append((d["root_p"][t], d["root_q"][t],
                             d["joint_q"][t]))
        r.rewards = list(d["rewards"])
        return r


class RuntimeREPL:
    def __init__(self, runner, env, record_all: bool = False):
        from .render_flags import RenderFlags
        self.runner = runner
        self.env = env
        self.replay = Replay()
        self.steps = 0
        self.flags = RenderFlags()

    def do_autoplay(self, n=30):
        rews = []
        for _ in range(int(n)):
            rew, done, _ = self.runner.one_step()
            rews.append(rew)
            self.steps += 1
            if done:
                print(f"episode done after {self.steps} steps; reset")
                self.runner.reset()
                self.steps = 0
                break
        if rews:
            print(f"played {len(rews)} steps  mean_rew={np.mean(rews):.3f}"
                  f"  ({self.runner.policy_eval_method})")

    def do_record(self, n=30):
        self.replay.clear()
        for _ in range(int(n)):
            rew, done, _ = self.runner.one_step()
            self.replay.append(self.runner.env_state.sim, rew)
            self.steps += 1
            if done:
                break
        print(f"recorded {len(self.replay.frames)} frames "
              f"mean_rew={np.mean(self.replay.rewards):.3f}")

    def do_render(self, path):
        from ..physics import fk as fk_mod
        from ..physics import state as state_mod
        from .render import render_rollout
        import jax
        import jax.numpy as jnp

        if not self.replay.frames:
            print("replay buffer empty (use 'L' or 'l' first)")
            return
        root_p = jnp.asarray(np.stack([f[0] for f in self.replay.frames]))
        root_q = jnp.asarray(np.stack([f[1] for f in self.replay.frames]))
        joint_q = jnp.asarray(np.stack([f[2] for f in self.replay.frames]))
        sim = state_mod.from_pose(self.env.model, root_p, root_q, joint_q)
        k = jax.jit(lambda s: fk_mod.fk(self.env.model, s))(sim)
        out = render_rollout(self.env.cm, np.asarray(k.body_q),
                             np.asarray(k.body_p), path,
                             fps=int(self.env.cfg.fps_con),
                             flags=self.flags)
        print("rendered:", out)

    def dispatch(self, line) -> bool:
        parts = shlex.split(line.strip())
        if not parts:
            return True
        cmd, args = parts[0], parts[1:]
        try:
            if cmd == "a":
                self.do_autoplay(*(args or [30]))
            elif cmd == "r":
                self.runner.reset()
                self.steps = 0
                print("reset")
            elif cmd == "q":
                m = self.runner.toggle_eval_method()
                print("eval method:", m)
            elif cmd == "e":
                self.runner.explore = not self.runner.explore
                print("explore:", self.runner.explore)
            elif cmd == "L":
                self.do_record(*(args or [30]))
            elif cmd == "s":
                print("saved:", self.replay.save(args[0]))
            elif cmd == "l":
                self.replay = Replay.load(args[0])
                print(f"loaded {len(self.replay.frames)} frames")
            elif cmd == "v":
                self.do_render(args[0])
            elif cmd == "t":
                name, val = self.flags.toggle(args[0])
                print(f"{name}: {val}")
            elif cmd == "flags":
                for k, v in sorted(self.flags.items()):
                    print(f"  {k} = {v}")
            elif cmd == "i":
                print(f"steps={self.steps} "
                      f"method={self.runner.policy_eval_method} "
                      f"explore={self.runner.explore} "
                      f"replay_frames={len(self.replay.frames)}")
            elif cmd == "h":
                print(__doc__)
            elif cmd == "x":
                return False
            else:
                print(f"unknown command {cmd!r} (h for help)")
        except Exception as e:  # keep the loop alive on bad input
            print(f"error: {e}")
        return True

    def run(self, stream=None):
        stream = stream if stream is not None else sys.stdin
        print("physicsvae runtime REPL — h for help")
        for line in stream:
            if not self.dispatch(line):
                break


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", required=True)
    ap.add_argument("--project_dir", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--eval_method", default="full",
                    choices=["full", "pass_through"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from ..driver import build_custom_policy, build
    from .runner import EnvRunner
    from ..train.checkpoint import load_model

    spec, env = build(args)
    _, _, vae_bundle = build_custom_policy(args, spec, env)
    if vae_bundle is None:
        raise SystemExit("REPL requires custom_model: physics_vae in the "
                         "spec (use --mode load for fcnn policies)")
    model, variables, vcfg = vae_bundle
    if args.checkpoint:
        variables = dict(variables)
        variables["params"] = load_model(args.checkpoint,
                                         like_params=variables["params"])
    runner = EnvRunner(env, model, variables,
                       rng=jax.random.PRNGKey(args.seed), explore=False)
    runner.policy_eval_method = args.eval_method
    RuntimeREPL(runner, env).run()


if __name__ == "__main__":
    main()
