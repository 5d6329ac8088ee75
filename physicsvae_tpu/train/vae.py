"""Two-phase PhysicsVAE training (world-model pretrain -> cVAE), on-device.

Re-build of train_physics_vae.py: the same loss structure (action
reconstruction + KL + world-model state reconstruction + cycle consistency,
train_physics_vae.py:361-435), the same two-phase schedule (WM-only for the
first max_iter_world_model iterations, then freeze WM and train
encoder+decoder, :313-351), and the same multi-step lookahead BPTT rollout
through the world model.  Component freezing uses optax.multi_transform over
the per-component param labels (the TPU equivalent of set_learnable_*,
rllib_model_torch.py:930-950).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.physics_vae import (PhysicsVAE, PhysicsVAEConfig,
                                  component_label)


@dataclasses.dataclass
class VAETrainConfig:
    lr: float = 5e-4
    lr_schedule: str = "step"          # step | cosine | none
    lr_step_size: int = 50             # iterations (epochs)
    lr_gamma: float = 0.70
    batch_size: int = 256
    weight_decay: float = 0.0
    max_iter: int = 100
    max_iter_world_model: int = 0
    lookahead: int = 1
    # loss coefficients (train_physics_vae.py:281-285, 331-335)
    vae_kl_coeff: float = 1.0
    a_rec_coeff: float = 1.0
    s_rec_coeff: float = 0.0
    vae_cycle_coeff: float = 1e-3
    # Anti-collapse options (opt-in; both off reproduce the reference
    # loss exactly).  kl_anneal_iters: the KL coefficient ramps linearly
    # 0 -> vae_kl_coeff over the first N epochs of the cVAE phase
    # (beta-annealing).  kl_free_bits: per-latent-dim KL floor in nats —
    # dims whose KL is below the floor contribute the floor, so the
    # optimizer has no gradient incentive to squeeze them further
    # (Kingma et al. free bits).  r2 post-mortem: the abbreviated schedule
    # with kl_coeff=1.0 collapsed the latent (KL -> 3e-5).
    kl_anneal_iters: int = 0
    kl_free_bits: float = 0.0


def phase_coeffs(cfg: VAETrainConfig, world_phase: bool):
    """read_loss_fn_coeff (train_physics_vae.py:331-335)."""
    if world_phase:
        return dict(kl=0.0, a_rec=0.0, s_rec=1.0, cyc=0.0)
    return dict(kl=cfg.vae_kl_coeff, a_rec=cfg.a_rec_coeff,
                s_rec=cfg.s_rec_coeff, cyc=cfg.vae_cycle_coeff)


def trainable_labels(world_phase: bool):
    """Which components receive gradients in each phase
    (train_physics_vae.py:326-335, 341-351)."""
    if world_phase:
        frozen = {"task_encoder", "motor_decoder", "motor_decoder_helper",
                  "latent_prior", "value_branch"}
    else:
        frozen = {"world_model", "value_branch"}

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "frozen" if component_label(p) in frozen
            else "train", params)

    return label_fn


def make_optimizer(cfg: VAETrainConfig, world_phase: bool,
                   steps_per_epoch: int = 1):
    if cfg.lr_schedule == "step":
        # StepLR(step_size epochs, gamma): the reference steps the LR once
        # per tune iteration (= epoch), so convert update count -> epochs.
        per = max(1, cfg.lr_step_size * steps_per_epoch)
        sched = lambda count: cfg.lr * (cfg.lr_gamma ** (count // per))
    elif cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(cfg.lr, cfg.max_iter)
    else:
        sched = cfg.lr
    base = optax.adamw(sched, weight_decay=cfg.weight_decay) \
        if cfg.weight_decay > 0 else optax.adam(sched)
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()},
        trainable_labels(world_phase))


def kl_loss(prior_type, aux, free_bits: float = 0.0):
    """KL / prior losses (train_physics_vae.py:383-409).

    free_bits > 0 floors each latent dim's KL (gaussian priors only):
    sum_i max(kl_i, free_bits) — collapsed dims stop producing gradient.
    """
    def _fb(kl_per_dim):
        if free_bits > 0.0:
            kl_per_dim = jnp.maximum(kl_per_dim, free_bits)
        return jnp.mean(jnp.sum(kl_per_dim, axis=-1))

    if prior_type == "normal_zero_mean_one_std":
        mu, logvar = aux["mu"], aux["logvar"]
        return _fb(-0.5 * (1 + logvar - mu ** 2 - jnp.exp(logvar)))
    if prior_type == "normal_state_mean_one_std":
        mu1, logvar1 = aux["mu"], aux["logvar"]
        mu2 = aux["prior_mu"]
        # KL(N(mu1,var1) || N(mu2,1)) summed over dims, mean over batch
        var1 = jnp.exp(logvar1)
        return _fb(0.5 * ((mu1 - mu2) ** 2 + var1 - logvar1 - 1.0))
    if prior_type == "hypersphere_uniform":
        # alignment penalty with a random prior direction
        mu1, mu2 = aux["mu"], aux["prior_mu"]
        return jnp.mean(jnp.sum(mu1 * mu2, axis=-1))
    return 0.0


def make_loss_fn(model: PhysicsVAE, cfg: VAETrainConfig):
    mcfg = model.cfg
    dim_sb = mcfg.dim_state_body
    dim_a = mcfg.dim_action
    prior = mcfg.latent_prior_type

    def loss_fn(params, constants, x, y, rng, coeffs, kl_scale=1.0):
        """x: (B, lookahead, 2*dim_sb); y: (B, lookahead, dim_a).

        Multi-step rollout through the world model: s1 for step t+1 is the
        world model's prediction from step t (train_physics_vae.py:361-435).
        """
        variables = {"params": params, "constants": constants}
        loss_a = loss_kl = loss_s = loss_cyc = 0.0
        s1 = x[:, 0, :dim_sb]
        for t in range(cfg.lookahead):
            rng, sub, sub2 = jax.random.split(rng, 3)
            s2_gt = x[:, t, dim_sb:]
            y_gt = y[:, t]
            x_t = jnp.concatenate([s1, s2_gt], axis=-1)
            logits, aux = model.apply(variables, x_t, rng=sub)
            y_pred = logits[..., :dim_a]

            loss_a += jnp.mean((y_gt - y_pred) ** 2)
            loss_kl += kl_loss(prior, aux, cfg.kl_free_bits) if prior \
                else 0.0
            # world model supervised on ground-truth action
            if coeffs["s_rec"] > 0.0:
                s2_pred_gt = model.apply(
                    variables, s1, y_gt, method=PhysicsVAE.world)
                loss_s += jnp.mean((s2_gt - s2_pred_gt) ** 2)
            # cycle consistency through the policy's own action
            loss_cyc += jnp.mean((s2_gt - aux["future_state"]) ** 2)
            s1 = aux["future_state"]

        n = float(cfg.lookahead)
        total = (coeffs["a_rec"] * loss_a / n
                 + coeffs["kl"] * kl_scale * loss_kl / n
                 + coeffs["s_rec"] * loss_s / n
                 + coeffs["cyc"] * loss_cyc / n)
        metrics = {"loss": total, "loss_a": loss_a / n, "loss_kl": loss_kl / n,
                   "loss_s": loss_s / n, "loss_cyc": loss_cyc / n}
        return total, metrics

    return loss_fn


class ParallelCVAETrials:
    """Concurrent hyperparameter trials on one chip: the TPU-native
    equivalent of tune.grid_search running trials in parallel
    (train_physics_vae.py:264-285 + tune.run).

    All trials in a group share one architecture (same prior type /
    widths), so their training steps are the SAME program; the loss
    coefficients (vae_kl_coeff, vae_cycle_coeff) become traced per-trial
    scalars and the whole epoch is vmapped over (params, opt_state,
    coeffs).  One dispatch trains every trial — the MXU sees batch
    T x 256 instead of 256, which is where the concurrency comes from.

    cVAE phase only: the world-model phase has kl=cyc=0, so all trials
    would train an identical world model — pretrain it once (sequential
    trainer) and broadcast via `world_params`.
    """

    def __init__(self, mcfg, cfg: VAETrainConfig, combos, rng,
                 init_params=None):
        import numpy as _np

        self.model = PhysicsVAE(mcfg)
        self.cfg = cfg
        self.combos = list(combos)          # [(kl, cyc), ...]
        T = len(self.combos)
        obs = jnp.zeros((1, mcfg.dim_state))
        variables = self.model.init({"params": rng}, obs, rng=rng,
                                    sample=False)
        # init_params: a single-trial tree (e.g. fresh init with the
        # pretrained world model grafted in by checkpoint.load_component)
        params = init_params if init_params is not None \
            else variables["params"]
        self.constants = variables.get("constants", {})
        # identical init per trial (each sequential trial also inits from
        # PRNGKey(0)); coefficients are the only cross-trial difference
        self.params = jax.tree.map(lambda x: jnp.broadcast_to(
            x, (T,) + x.shape).copy(), params)
        self.kl_arr = jnp.asarray([k for k, _ in self.combos], jnp.float32)
        self.cyc_arr = jnp.asarray([c for _, c in self.combos], jnp.float32)
        self.iter = 0
        self.rng = rng
        self.loss_fn = make_loss_fn(self.model, cfg)
        self._np = _np

    def _build(self, steps_per_epoch: int):
        self.tx = make_optimizer(self.cfg, world_phase=False,
                                 steps_per_epoch=steps_per_epoch)
        self.opt_state = jax.vmap(self.tx.init)(self.params)

        def _epoch_one(params, opt_state, kl_c, cyc_c, constants, X, Y,
                       idx, rng, kl_scale):
            # same structure as VAETrainer._epoch_jit, with kl/cyc traced
            coeffs = {"kl": kl_c, "a_rec": self.cfg.a_rec_coeff,
                      "s_rec": 0.0, "cyc": cyc_c}

            def body(carry, b_idx):
                params, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                x = jnp.take(X, b_idx, axis=0)
                y = jnp.take(Y, b_idx, axis=0)
                (_, metrics), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True)(
                        params, constants, x, y, sub, coeffs, kl_scale)
                updates, opt_state = self.tx.update(grads, opt_state,
                                                    params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), metrics

            (params, opt_state, _), ms = jax.lax.scan(
                body, (params, opt_state, rng), idx)
            return params, opt_state, jax.tree.map(jnp.mean, ms)

        self._epoch_jit = jax.jit(
            jax.vmap(_epoch_one,
                     in_axes=(0, 0, 0, 0, None, None, None, None, None,
                              None)),
            donate_argnums=(0, 1))

    def train_epoch_device(self, Xd, Yd, np_rng):
        """One vmapped epoch across all trials; returns a list of
        per-trial metric dicts (same schema as VAETrainer)."""
        self.iter += 1
        n = Xd.shape[0]
        if not hasattr(self, "_epoch_jit"):
            self._build(max(1, n // self.cfg.batch_size))
        if self.cfg.kl_anneal_iters > 0:
            kl_scale = min(1.0, max(self.iter, 1) / self.cfg.kl_anneal_iters)
        else:
            kl_scale = 1.0
        nb = max(1, n // self.cfg.batch_size)
        idx = np_rng.permutation(n)[:nb * self.cfg.batch_size]
        idx = idx.reshape(nb, -1)
        self.rng, sub = jax.random.split(self.rng)
        self.params, self.opt_state, ms = self._epoch_jit(
            self.params, self.opt_state, self.kl_arr, self.cyc_arr,
            self.constants, Xd, Yd, jnp.asarray(idx), sub,
            jnp.asarray(kl_scale, jnp.float32))
        out = []
        for t in range(len(self.combos)):
            m = {k: float(v[t]) for k, v in ms.items()}
            m["iter"] = self.iter
            m["phase"] = "cvae"
            out.append(m)
        return out

    def trial_params(self, t: int):
        return jax.tree.map(lambda x: x[t], self.params)


class VAETrainer:
    """Host-side loop; each minibatch update is one jitted step.

    Mirrors TrainModel (train_physics_vae.py:313-467 + torch_models.py:109-161)
    with the phase switch at iter == max_iter_world_model.
    """

    def __init__(self, mcfg: PhysicsVAEConfig, cfg: VAETrainConfig, rng):
        self.model = PhysicsVAE(mcfg)
        self.cfg = cfg
        obs = jnp.zeros((1, mcfg.dim_state))
        variables = self.model.init({"params": rng}, obs, rng=rng,
                                    sample=False)
        self.params = variables["params"]
        self.constants = variables.get("constants", {})
        self.iter = 0
        self.world_phase = cfg.max_iter_world_model > 0
        self._build(self.world_phase)
        self.loss_fn = make_loss_fn(self.model, cfg)
        self.rng = rng

    def _build(self, world_phase: bool):
        self.tx = make_optimizer(self.cfg, world_phase,
                                 getattr(self, "_steps_per_epoch", 1))
        self.opt_state = self.tx.init(self.params)
        # coefficients are Python floats, baked in statically at trace time
        self.coeffs = phase_coeffs(self.cfg, world_phase)
        coeffs = dict(self.coeffs)

        def _step(params, opt_state, constants, x, y, rng, kl_scale):
            (loss, metrics), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(
                    params, constants, x, y, rng, coeffs, kl_scale)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self._step_jit = jax.jit(_step)

        def _epoch(params, opt_state, constants, X, Y, idx, rng, kl_scale):
            """Whole epoch in one device program: lax.scan over the shuffled
            minibatch index table.  Keeps the dataset resident on device —
            one dispatch per epoch instead of one per minibatch (the
            per-minibatch host->device transfer dominates on a tunneled
            chip)."""
            def body(carry, b_idx):
                params, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                x = jnp.take(X, b_idx, axis=0)
                y = jnp.take(Y, b_idx, axis=0)
                (_, metrics), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True)(
                        params, constants, x, y, sub, coeffs, kl_scale)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), metrics

            (params, opt_state, rng), ms = jax.lax.scan(
                body, (params, opt_state, rng), idx)
            return params, opt_state, rng, jax.tree.map(jnp.mean, ms)

        self._epoch_jit = jax.jit(_epoch, donate_argnums=(0, 1))

    def train_epoch(self, batches):
        """One tune-iteration = one epoch (torch_models.py:131-145)."""
        if self.world_phase and self.iter >= self.cfg.max_iter_world_model:
            # phase switch (train_physics_vae.py:342-350)
            self.world_phase = False
            self._build(False)
        self.iter += 1
        losses = []
        if not hasattr(self, "_steps_per_epoch"):
            self._steps_per_epoch = max(1, len(batches.X) // batches.batch_size)
            self._build(self.world_phase)
        # beta-annealing: KL coefficient ramps over the first
        # kl_anneal_iters epochs of the cVAE phase (opt-in)
        if self.cfg.kl_anneal_iters > 0 and not self.world_phase:
            in_phase = self.iter - self.cfg.max_iter_world_model
            kl_scale = min(1.0, max(in_phase, 1) / self.cfg.kl_anneal_iters)
        else:
            kl_scale = 1.0
        kl_scale = jnp.asarray(kl_scale, jnp.float32)
        for x, y in batches.epoch():
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, metrics = self._step_jit(
                self.params, self.opt_state, self.constants,
                jnp.asarray(x), jnp.asarray(y), sub, kl_scale)
            losses.append(metrics)
        mean = {k: float(np.mean([float(m[k]) for m in losses]))
                for k in losses[0]}
        mean["iter"] = self.iter
        mean["phase"] = "world_model" if self.world_phase else "cvae"
        return mean

    def eval_metrics(self, Xt, Yt):
        """Held-out metrics under the current phase's coefficients
        (torch_models.py:146-161 test epoch; fixed rng so the reparam
        noise is deterministic across epochs)."""
        if getattr(self, "_eval_phase", None) != self.world_phase:
            coeffs = dict(self.coeffs)

            def _ev(params, constants, x, y, rng):
                _, m = self.loss_fn(params, constants, x, y, rng, coeffs,
                                    1.0)
                return m

            self._eval_jit = jax.jit(_ev)
            self._eval_phase = self.world_phase
        m = self._eval_jit(self.params, self.constants, Xt, Yt,
                           jax.random.PRNGKey(1234))
        return {f"test_{k}": float(v) for k, v in m.items()}

    def train_epoch_device(self, Xd, Yd, np_rng):
        """One epoch via the scanned device program.  Xd/Yd are
        device-resident jnp arrays; np_rng drives the host-side shuffle
        (same epoch semantics as Batches.epoch)."""
        if self.world_phase and self.iter >= self.cfg.max_iter_world_model:
            self.world_phase = False
            self._build(False)
        self.iter += 1
        n = Xd.shape[0]
        if not hasattr(self, "_steps_per_epoch"):
            self._steps_per_epoch = max(1, n // self.cfg.batch_size)
            self._build(self.world_phase)
        if self.cfg.kl_anneal_iters > 0 and not self.world_phase:
            in_phase = self.iter - self.cfg.max_iter_world_model
            kl_scale = min(1.0, max(in_phase, 1) / self.cfg.kl_anneal_iters)
        else:
            kl_scale = 1.0
        nb = n // self.cfg.batch_size
        if nb >= 1:
            idx = np_rng.permutation(n)[:nb * self.cfg.batch_size]
            idx = idx.reshape(nb, self.cfg.batch_size)
        else:
            idx = np_rng.permutation(n)[None, :]
        self.rng, sub = jax.random.split(self.rng)
        self.params, self.opt_state, _, ms = self._epoch_jit(
            self.params, self.opt_state, self.constants,
            Xd, Yd, jnp.asarray(idx), sub,
            jnp.asarray(kl_scale, jnp.float32))
        mean = {k: float(v) for k, v in ms.items()}
        mean["iter"] = self.iter
        mean["phase"] = "world_model" if self.world_phase else "cvae"
        return mean
