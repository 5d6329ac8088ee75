"""On-device batched PPO — the ScaDiver imitation stage without Ray.

Replaces rllib PPO/DDPPO + worker actors (reference rllib_driver.py:285-298,
SURVEY.md §2.3): rollouts are a vmapped env under lax.scan with autoreset,
GAE + clipped-surrogate epochs run in the same program, and multi-chip
scale-out is data-parallel gradient psum over a `data` mesh axis (supersedes
both PPO's centralized learner and DDPPO's in-worker allreduce).

Hyperparameter parity with data/spec/loco/loco_imitation.yaml:9-37.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env.imitation import ImitationEnv
from ..models.policy import (FullyConnectedPolicy, PolicyConfig, log_prob,
                             sample_action)


@dataclasses.dataclass
class PPOConfig:
    """Defaults from loco_imitation.yaml config block."""
    gamma: float = 0.98
    lam: float = 0.95
    clip_param: float = 0.2
    vf_clip_param: float = 1000.0
    num_sgd_iter: int = 20
    lr: float = 2e-5
    sgd_minibatch_size: int = 500
    horizon: int = 900
    rollout_length: int = 128     # steps per env per iteration
    num_envs: int = 1024
    grad_clip: Optional[float] = None
    sample_std: float = 0.1
    log_std_type: str = "constant"
    vf_loss_coeff: float = 1.0
    entropy_coeff: float = 0.0
    # Adaptive-KL penalty (rllib PPO kl_coeff/kl_target; spec key at
    # data/spec/loco/loco_imitation.yaml:15).  kl_coeff == 0 disables the
    # term entirely (the loco specs ship 0.0) and skips storing the old
    # distribution params in the rollout.
    kl_coeff: float = 0.0
    kl_target: float = 0.01
    # Importance-ratio guard: clamp log(pi/pi_old) before exponentiation.
    # Inert for deterministic-logits policies (|log ratio| << 20), but
    # PhysicsVAE logits are STOCHASTIC (z reparameterized per forward,
    # rllib_model_torch.py:734-740): with action std 0.05, a z-resample
    # shift of the decoder mean makes log-ratios of O(100), and
    # exp(+-inf) * negative advantage is unbounded below in the clipped
    # surrogate -> first-iteration NaN (observed in the r5 runtime
    # fine-tune).  20 keeps exp() finite while leaving gradients intact.
    log_ratio_clip: float = 20.0


def _fcnn_policy_factory(env, cfg: "PPOConfig", rng):
    """Default policy: FullyConnectedPolicy (custom_model `fcnn`)."""
    pcfg = PolicyConfig(
        dim_state=env.dim_state, dim_action=env.dim_action,
        log_std_type=cfg.log_std_type, sample_std=cfg.sample_std)
    policy = FullyConnectedPolicy(pcfg)
    variables = policy.init({"params": rng},
                            jnp.zeros((1, env.dim_state)))

    def apply_fn(params, constants, obs, rng=None):
        return policy.apply({"params": params, "constants": constants}, obs)

    return apply_fn, variables["params"], variables.get("constants", {})


def make_physics_vae_policy(vae_cfg, variables=None, rng=None):
    """Policy factory for `custom_model: physics_vae`
    (loco_runtime_physics_vae.yaml:30-35): the PhysicsVAE forward is the
    action distribution; z is re-sampled per forward as in the reference
    (_reparameterize, rllib_model_torch.py:734-740)."""
    from ..models.physics_vae import PhysicsVAE

    model = PhysicsVAE(vae_cfg)

    def factory(env, cfg, rng_init):
        if variables is None:
            init_vars = model.init(
                {"params": rng_init},
                jnp.zeros((1, vae_cfg.dim_state)), rng=rng_init,
                sample=False)
        else:
            init_vars = variables

        def apply_fn(params, constants, obs, rng=None):
            v = {"params": params, "constants": constants}
            sample = rng is not None
            logits, aux = model.apply(v, obs, rng=rng, sample=sample)
            return logits, aux["value"]

        return apply_fn, init_vars["params"], init_vars.get("constants", {})

    return factory


def lstm_policy_factory(env, cfg: "PPOConfig", rng):
    """Policy factory for `custom_model: lstm` (the reference's LSTM layer
    zoo, rllib_model_torch.py:48-158, trained by rllib PPO via
    add_time_dimension sequence batching).

    Recurrent protocol: apply_fn threads an explicit (c, h) carry and the
    factory returns a 4th element init_state_fn(batch_size) -> carry.
    PPO stores the pre-step carry alongside each transition and updates
    with the STORED-STATE approximation: minibatch forwards restart from
    the recorded carry and gradients truncate there (the rllib
    max_seq_len analog of 1; R2D2-style stored state without burn-in).
    """
    from ..models.lstm import LSTMPolicy, LSTMPolicyConfig

    pcfg = LSTMPolicyConfig(dim_state=env.dim_state,
                            dim_action=env.dim_action,
                            log_std_type=cfg.log_std_type,
                            sample_std=cfg.sample_std)
    policy = LSTMPolicy(pcfg)
    carry0 = policy.initial_state((1,))
    variables = policy.init({"params": rng},
                            jnp.zeros((1, env.dim_state)), carry0)

    def apply_fn(params, constants, obs, rng=None, state=None):
        v = {"params": params, "constants": constants}
        return policy.apply(v, obs, state)

    def init_state_fn(batch_size):
        return policy.initial_state((batch_size,))

    return apply_fn, variables["params"], variables.get("constants", {}), \
        init_state_fn


def compute_gae(rewards, values, dones, last_value, gamma, lam):
    """Generalized advantage estimation over a (T, B) rollout."""

    def body(carry, x):
        gae, next_value = carry
        reward, value, done = x
        nonterm = 1.0 - done
        delta = reward + gamma * next_value * nonterm - value
        gae = delta + gamma * lam * nonterm * gae
        return (gae, value), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    returns = adv + values
    return adv, returns


class PPOTrainer:
    """Single-program PPO over a vmapped ImitationEnv.

    `mesh_axis`: if not None, gradients and batch statistics are psum'd over
    that named mesh axis (multi-chip data parallelism; see parallel/mesh.py).
    """

    def __init__(self, env: ImitationEnv, cfg: PPOConfig, rng,
                 mesh_axis: Optional[str] = None,
                 policy_factory=None, param_label_fn=None):
        """policy_factory(env, cfg, rng) -> (apply_fn, params, constants)
        where apply_fn(params, constants, obs, rng) -> (logits, value).
        Defaults to FullyConnectedPolicy (spec `custom_model: fcnn`); use
        make_physics_vae_policy for `custom_model: physics_vae` (the runtime
        fine-tuning stage, loco_runtime_physics_vae.yaml:30-35).

        param_label_fn(params) -> pytree of {"train","frozen"} labels for
        component freezing during PPO (e.g. frozen world model)."""
        self.env = env
        self.cfg = cfg
        # enforce the rllib episode-step cap inside the env (horizon,
        # loco_imitation.yaml:43-44)
        if cfg.horizon:
            env.horizon = int(cfg.horizon)
        rng, sub = jax.random.split(rng)
        factory = policy_factory or _fcnn_policy_factory
        out = factory(env, cfg, sub)
        if len(out) == 4:  # recurrent policy (see lstm_policy_factory)
            self._apply_fn, self.params, self.constants, \
                self._init_state_fn = out
        else:
            self._apply_fn, self.params, self.constants = out
            self._init_state_fn = None
        self.recurrent = self._init_state_fn is not None
        self.policy_state = None
        base = optax.adam(cfg.lr) if cfg.grad_clip is None else optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip), optax.adam(cfg.lr))
        if param_label_fn is not None:
            self.tx = optax.multi_transform(
                {"train": base, "frozen": optax.set_to_zero()},
                param_label_fn)
        else:
            self.tx = base
        self.opt_state = self.tx.init(self.params)
        self.rng = rng
        self.mesh_axis = mesh_axis
        self.timesteps_total = 0
        # adaptive-KL state (rllib adapts the coefficient between
        # iterations: x1.5 when mean KL > 2*target, x0.5 when < target/2)
        self.adaptive_kl = cfg.kl_coeff > 0.0
        self.kl_coeff = float(cfg.kl_coeff)

        self._rollout_jit = jax.jit(self.rollout)
        self._update_jit = jax.jit(self.update_epochs)

    # -- rollout --------------------------------------------------------

    def init_envs(self, rng):
        rngs = jax.random.split(rng, self.cfg.num_envs)
        st = jax.vmap(self.env.reset)(rngs)
        obs = jax.vmap(self.env.observe)(st)
        return st, obs

    def policy_forward(self, params, obs, rng=None, state=None):
        if self.recurrent:
            return self._apply_fn(params, self.constants, obs, rng, state)
        return self._apply_fn(params, self.constants, obs, rng)

    def rollout(self, params, env_state, obs, rng, timesteps_total=0.0,
                policy_state=None):
        """T steps of (policy -> env.step_auto) under lax.scan.

        timesteps_total feeds reward weight schedules
        (envs/env_humanoid_base.py:349-353, :973-976).
        policy_state: recurrent carry (None for feedforward policies);
        done lanes reset it to the (zero) initial state, and the pre-step
        carry is stored per transition for stored-state SGD.
        """
        T = self.cfg.rollout_length
        tt = jnp.asarray(timesteps_total, jnp.float32)

        def body(carry, _):
            st, obs, ps, rng = carry
            rng, k_act, k_fwd = jax.random.split(rng, 3)
            if self.recurrent:
                logits, value, ps2 = self.policy_forward(params, obs, k_fwd,
                                                         ps)
            else:
                logits, value = self.policy_forward(params, obs, k_fwd)
                ps2 = ps
            action = sample_action(k_act, logits, self.env.dim_action)
            lp = log_prob(logits, self.env.dim_action, action)
            st2, obs2, rew, done, info = jax.vmap(
                self.env.step_auto, in_axes=(0, 0, None))(st, action, tt)
            out = dict(obs=obs, action=action, logp=lp, value=value,
                       reward=rew, done=done,
                       ep_return=info.get("episode_return", rew),
                       ep_length=info.get("episode_length",
                                          jnp.ones_like(rew)))
            if self.adaptive_kl:
                out["logits"] = logits  # old distribution params for KL
            if self.recurrent:
                out["pstate"] = ps  # carry the policy SAW this step
                # fresh (zero) state for lanes that just reset
                mask = (1.0 - done.astype(jnp.float32))
                ps2 = jax.tree.map(
                    lambda x: x * mask[(...,) + (None,) * (x.ndim - 1)],
                    ps2)
            return (st2, obs2, ps2, rng), out

        (st, obs, ps, rng), traj = jax.lax.scan(
            body, (env_state, obs, policy_state, rng), None, length=T)
        rng, k_fwd = jax.random.split(rng)
        if self.recurrent:
            _, last_value, _ = self.policy_forward(params, obs, k_fwd, ps)
        else:
            _, last_value = self.policy_forward(params, obs, k_fwd)
        adv, ret = compute_gae(traj["reward"], traj["value"],
                               traj["done"].astype(jnp.float32), last_value,
                               self.cfg.gamma, self.cfg.lam)
        traj["advantage"] = adv
        traj["return"] = ret
        return st, obs, rng, traj, ps

    # -- update ---------------------------------------------------------

    def _loss(self, params, batch, rng, kl_coeff=0.0):
        cfg = self.cfg
        if self.recurrent:
            # stored-state forward: restart from the recorded carry,
            # truncating gradients there (rllib max_seq_len analog of 1)
            ps = jax.lax.stop_gradient(batch["pstate"])
            logits, value, _ = self.policy_forward(params, batch["obs"],
                                                   rng, ps)
        else:
            logits, value = self.policy_forward(params, batch["obs"], rng)
        lp = log_prob(logits, self.env.dim_action, batch["action"])
        dlp = lp - batch["logp"]
        if cfg.log_ratio_clip:
            dlp = jnp.clip(dlp, -cfg.log_ratio_clip, cfg.log_ratio_clip)
        ratio = jnp.exp(dlp)
        adv = batch["advantage"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        vf_err = jnp.clip(value - batch["return"],
                          -cfg.vf_clip_param, cfg.vf_clip_param)
        vf_loss = jnp.mean(vf_err ** 2)
        mean, log_std = logits[..., :self.env.dim_action], \
            logits[..., self.env.dim_action:]
        entropy = jnp.mean(jnp.sum(log_std + 0.5 * np.log(2 * np.pi * np.e),
                                   axis=-1))
        total = (policy_loss + cfg.vf_loss_coeff * vf_loss
                 - cfg.entropy_coeff * entropy)
        metrics = dict(policy_loss=policy_loss, vf_loss=vf_loss,
                       entropy=entropy)
        if self.adaptive_kl:
            # KL(old || new) of the diagonal Gaussians, as rllib's
            # torch DiagGaussian.kl (rllib PPO adds kl_coeff * KL to the
            # surrogate; spec kl_coeff/kl_target, loco_imitation.yaml:15)
            A = self.env.dim_action
            mu0 = batch["logits"][..., :A]
            ls0 = batch["logits"][..., A:]
            kl = jnp.sum(
                (log_std - ls0)
                + (jnp.exp(2 * ls0) + (mu0 - mean) ** 2)
                / (2 * jnp.exp(2 * log_std)) - 0.5, axis=-1)
            kl_mean = jnp.mean(kl)
            total = total + kl_coeff * kl_mean
            metrics["kl"] = kl_mean
        return total, metrics

    def update_epochs(self, params, opt_state, traj, rng, kl_coeff=0.0):
        cfg = self.cfg
        T, B = traj["reward"].shape
        N = T * B
        keys = ("obs", "action", "logp", "value", "reward", "done",
                "advantage", "return")
        if self.adaptive_kl:
            keys = keys + ("logits",)
        flat = {k: traj[k].reshape((N,) + traj[k].shape[2:]) for k in keys}
        if self.recurrent:
            flat["pstate"] = jax.tree.map(
                lambda v: v.reshape((N,) + v.shape[2:]), traj["pstate"])
        # advantage normalization over the full batch
        adv = flat["advantage"]
        if self.mesh_axis:
            mean = jax.lax.pmean(jnp.mean(adv), self.mesh_axis)
            var = jax.lax.pmean(jnp.mean((adv - mean) ** 2), self.mesh_axis)
        else:
            mean = jnp.mean(adv)
            var = jnp.var(adv)
        flat["advantage"] = (adv - mean) / jnp.sqrt(var + 1e-8)

        mb = min(cfg.sgd_minibatch_size, N)
        nmb = max(N // mb, 1)

        def epoch(carry, _):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            perm = jax.random.permutation(k, N)

            def minibatch(carry, xs):
                idx, k_mb = xs
                params, opt_state = carry
                batch = {k2: (jax.tree.map(lambda v: v[idx], v)
                              if k2 == "pstate" else v[idx])
                         for k2, v in flat.items()}
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(params, batch, k_mb, kl_coeff)
                if self.mesh_axis:
                    grads = jax.lax.pmean(grads, self.mesh_axis)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            idxs = perm[:nmb * mb].reshape(nmb, mb)
            rng, k = jax.random.split(rng)
            mb_keys = jax.random.split(k, nmb)
            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state), (idxs, mb_keys))
            return (params, opt_state, rng), metrics

        (params, opt_state, rng), metrics = jax.lax.scan(
            epoch, (params, opt_state, rng), None, length=cfg.num_sgd_iter)
        metrics = jax.tree.map(lambda x: jnp.mean(x), metrics)
        return params, opt_state, rng, metrics

    # -- outer loop ------------------------------------------------------

    def train_iteration(self, env_state, obs):
        self.rng, k1 = jax.random.split(self.rng)
        if self.recurrent and self.policy_state is None:
            self.policy_state = self._init_state_fn(self.cfg.num_envs)
        env_state, obs, _, traj, self.policy_state = self._rollout_jit(
            self.params, env_state, obs, k1,
            jnp.asarray(self.timesteps_total, jnp.float32),
            self.policy_state)
        self.rng, k2 = jax.random.split(self.rng)
        self.params, self.opt_state, _, metrics = self._update_jit(
            self.params, self.opt_state, traj, k2,
            jnp.asarray(self.kl_coeff, jnp.float32))
        self.timesteps_total += self.cfg.rollout_length * self.cfg.num_envs
        metrics = {k: float(v) for k, v in metrics.items()}
        if self.adaptive_kl:
            # rllib's update_kl rule between iterations
            kl = metrics["kl"]
            if kl > 2.0 * self.cfg.kl_target:
                self.kl_coeff *= 1.5
            elif kl < 0.5 * self.cfg.kl_target:
                self.kl_coeff *= 0.5
            metrics["kl_coeff"] = self.kl_coeff
        # rllib-comparable episode stats over episodes COMPLETED this rollout
        done = traj["done"]
        n_done = jnp.sum(done)
        metrics["episodes_this_iter"] = int(n_done)
        if int(n_done) > 0:
            metrics["episode_reward_mean"] = float(
                jnp.sum(jnp.where(done, traj["ep_return"], 0.0)) / n_done)
            metrics["episode_len_mean"] = float(
                jnp.sum(jnp.where(done, traj["ep_length"], 0.0)) / n_done)
        else:
            # rllib carries the running mean rather than reporting a spurious
            # 0.0 "collapse" when no episode completed this rollout.
            metrics["episode_reward_mean"] = getattr(
                self, "_last_ep_rew_mean", float("nan"))
            metrics["episode_len_mean"] = getattr(
                self, "_last_ep_len_mean", float("nan"))
        self._last_ep_rew_mean = metrics["episode_reward_mean"]
        self._last_ep_len_mean = metrics["episode_len_mean"]
        metrics["step_reward_mean"] = float(jnp.mean(traj["reward"]))
        metrics["timesteps_total"] = self.timesteps_total
        return env_state, obs, metrics

    # -- checkpoint / resume (tune auto-resume parity,
    #    rllib_driver.py:281-297 + SURVEY.md §5 checkpoint/resume) ---------

    def save_state(self, dirpath):
        import os
        import orbax.checkpoint as ocp

        os.makedirs(dirpath, exist_ok=True)
        cp = ocp.PyTreeCheckpointer()
        cp.save(os.path.join(dirpath, "params"), self.params, force=True)
        cp.save(os.path.join(dirpath, "opt_state"),
                jax.tree.map(jnp.asarray, self.opt_state), force=True)
        meta = {"timesteps_total": jnp.asarray(self.timesteps_total),
                "rng": self.rng,
                "kl_coeff": jnp.asarray(self.kl_coeff, jnp.float32)}
        cp.save(os.path.join(dirpath, "meta"), meta, force=True)
        return dirpath

    def restore_state(self, dirpath):
        import os
        import orbax.checkpoint as ocp

        cp = ocp.PyTreeCheckpointer()
        self.params = cp.restore(os.path.join(dirpath, "params"),
                                 item=self.params)
        self.opt_state = cp.restore(
            os.path.join(dirpath, "opt_state"),
            item=jax.tree.map(jnp.asarray, self.opt_state))
        meta = cp.restore(os.path.join(dirpath, "meta"))
        self.timesteps_total = int(meta["timesteps_total"])
        self.rng = jnp.asarray(meta["rng"], dtype=jnp.uint32)
        if "kl_coeff" in meta:
            self.kl_coeff = float(meta["kl_coeff"])
        return self

    def train(self, num_iterations, log_fn=print):
        self.rng, k = jax.random.split(self.rng)
        env_state, obs = self.init_envs(k)
        history = []
        for it in range(num_iterations):
            t0 = time.perf_counter()
            env_state, obs, metrics = self.train_iteration(env_state, obs)
            metrics["iter"] = it
            metrics["steps_per_sec"] = (
                self.cfg.rollout_length * self.cfg.num_envs
                / (time.perf_counter() - t0))
            history.append(metrics)
            if log_fn:
                log_fn(metrics)
        return history
