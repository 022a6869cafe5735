"""The fused D-then-G train step — one jitted function per iteration.

The reference's hot loop is two separate ``sess.run`` calls per iteration
(D step then G step, SURVEY.md §3.1), each paying a host→device boundary
and re-sampling z. Here the whole iteration — ``n_critic`` D updates, one
G update, SN ``u`` refresh, BN stat EMA, generator EMA — is ONE
``jit``-compiled function with the input state donated, so XLA fuses
everything and the only host↔device traffic per step is the data batch
and the scalar metrics.

Semantics notes vs the reference:

- z is re-sampled for every D update and again for the G update — matching
  the reference, where ``self.z = truncated_normal(...)`` is a graph op
  re-drawn per ``sess.run`` (BigGAN_128.py:~195; SURVEY §3.1 boundary #2).
- During the D update the generator runs in train mode (cBN uses batch
  moments) but its state mutations are discarded; G state advances once
  per iteration, in the G update. (The reference advances them in both
  sess.runs — only the effective BN/EMA decay rate differs, not the math.)
- ``n_critic`` D updates per G update: the reference is 1:1
  (no flag; SURVEY §2.3), the paper uses 2:1 — configurable here; the
  batch carries a leading ``n_critic`` axis of independent real batches.
- Gradient accumulation (``grad_accum``) reaches paper-scale batches on
  small slices: ``lax.scan`` over microbatches, gradients averaged, BN
  stats threaded through (final microbatch's stats win the EMA race, as
  they would sequentially).

Sharding: under ``jit`` over a Mesh, the batch arrives sharded on
``data``; GSPMD inserts the gradient/BN-moment all-reduces over ICI. No
explicit collectives needed (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from biggan_tpu.configs.base import GANConfig
from biggan_tpu.ops.losses import (
    discriminator_loss,
    uses_gradient_penalty,
    generator_loss,
    gradient_penalty,
    orthogonal_regularization,
)
from biggan_tpu.sampling.truncation import sample_z
from biggan_tpu.training.train_state import GANTrainState, build_models, build_optimizers

_MUTABLE = ["batch_stats", "sn_u"]


def _merge(params, state):
    return {"params": params, **state}


def _sample_labels(rng, n, num_classes):
    if num_classes <= 0:
        return None
    return jax.random.randint(rng, (n,), 0, num_classes)


def _accumulate(loss_and_mut_grad, init_state, xs_list, grad_accum):
    """Run ``grad_accum`` microbatches, averaging grads, threading state.

    ``loss_and_mut_grad(state, *xs) -> ((loss, new_state), grads)``.
    Python-unrolled: grad_accum is a small static int, and unrolling lets
    XLA overlap microbatches better than a sequential scan carrying full
    gradient buffers.
    """
    grads_acc, loss_acc, st = None, 0.0, init_state
    for xs in xs_list:
        (loss, st), grads = loss_and_mut_grad(st, *xs)
        grads_acc = grads if grads_acc is None else jax.tree.map(jnp.add, grads_acc, grads)
        loss_acc = loss_acc + loss
    if grad_accum > 1:
        grads_acc = jax.tree.map(lambda g: g / grad_accum, grads_acc)
        loss_acc = loss_acc / grad_accum
    return grads_acc, loss_acc, st


def make_train_step(cfg: GANConfig, axis_name: Optional[str] = None):
    """Build the fused train step. ``axis_name`` is only for explicit-
    collective callers (shard_map/pmap); under jit-over-mesh leave None."""
    generator, discriminator = build_models(cfg)
    g_opt, d_opt = build_optimizers(cfg)
    micro = cfg.batch_size // cfg.grad_accum

    def gen_forward(g_params, g_state, z, labels):
        return generator.apply(
            _merge(g_params, g_state), z, labels, train=True,
            axis_name=axis_name, mutable=_MUTABLE,
        )

    def disc_forward(d_params, d_state, images, labels):
        return discriminator.apply(
            _merge(d_params, d_state), images, labels, train=True,
            axis_name=axis_name, mutable=_MUTABLE,
        )

    def prepare_real(real, rng):
        """uint8 batches get the fused device-side flip+normalize; float
        batches are assumed already in [-1, 1] (test/synthetic paths)."""
        from biggan_tpu.data.pipeline import device_preprocess

        if real.dtype == jnp.uint8:
            return device_preprocess(real, rng, flip=cfg.random_flip)
        if cfg.random_flip:
            coins = jax.random.bernoulli(rng, 0.5, (real.shape[0], 1, 1, 1))
            real = jnp.where(coins, real[:, :, ::-1, :], real)
        return real

    # ------------------------------------------------------------------ D
    def d_microbatch_loss(d_params, d_state, g_params, g_state, real, labels, rng):
        z_rng, label_rng, gp_rng = jax.random.split(rng, 3)
        z = sample_z(z_rng, (real.shape[0], cfg.z_dim), cfg.train_z_dist, cfg.truncation)
        fake_labels = _sample_labels(label_rng, real.shape[0], cfg.num_classes)
        fake, _ = gen_forward(g_params, g_state, z, fake_labels)  # G state discarded
        fake = jax.lax.stop_gradient(fake.astype(real.dtype))

        real_logits, d_mut = disc_forward(d_params, d_state, real, labels)
        # The fake application reuses the ORIGINAL u vectors (batch_stats
        # thread through normally): identical (W, u) inputs let XLA CSE
        # the whole spectral-norm weight pass across the two D forwards —
        # one normalization instead of two per D loss. u still advances
        # one power iteration per D update (the reference's graph-side-
        # effect cadence was two per sess.run pair — activation math given
        # u is identical; only the estimator's step rate differs).
        d_state_fake = {**d_mut, "sn_u": d_state["sn_u"]}
        fake_logits, d_mut = disc_forward(d_params, d_state_fake, fake, fake_labels)
        loss = discriminator_loss(cfg.gan_type, real_logits, fake_logits)
        if uses_gradient_penalty(cfg.gan_type):
            d_apply = lambda imgs: disc_forward(d_params, d_state, imgs, labels)[0]  # noqa: E731
            loss = loss + gradient_penalty(
                d_apply, gp_rng, real, fake, cfg.gan_type, cfg.gp_weight
            )
        return loss, d_mut

    def d_update(d_params, d_state, d_opt_state, g_params, g_state, real, labels, rng):
        """One D optimizer update over ``grad_accum`` microbatches."""
        rng, flip_rng = jax.random.split(rng)
        real = prepare_real(real, flip_rng)
        real_m = real.reshape(cfg.grad_accum, micro, *real.shape[1:])
        rngs = jax.random.split(rng, cfg.grad_accum)
        xs_list = [
            (real_m[i], None if labels is None else labels.reshape(cfg.grad_accum, micro)[i], rngs[i])
            for i in range(cfg.grad_accum)
        ]

        def loss_and_mut_grad(d_state, real_i, labels_i, rng_i):
            (loss, d_mut), grads = jax.value_and_grad(d_microbatch_loss, has_aux=True)(
                d_params, d_state, g_params, g_state, real_i, labels_i, rng_i
            )
            return (loss, d_mut), grads

        grads, loss, d_state = _accumulate(loss_and_mut_grad, d_state, xs_list, cfg.grad_accum)
        updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        gnorm = optax.global_norm(grads) if cfg.log_grad_norms else jnp.zeros(())
        return d_params, d_state, d_opt_state, loss, gnorm

    # ------------------------------------------------------------------ G
    def g_microbatch_loss(g_params, g_state, d_params, d_state, rng):
        z_rng, label_rng = jax.random.split(rng)
        z = sample_z(z_rng, (micro, cfg.z_dim), cfg.train_z_dist, cfg.truncation)
        labels = _sample_labels(label_rng, micro, cfg.num_classes)
        fake, g_mut = gen_forward(g_params, g_state, z, labels)
        fake_logits, _ = disc_forward(d_params, d_state, fake, labels)  # D state discarded
        loss = generator_loss(cfg.gan_type, fake_logits)
        if cfg.ortho_reg > 0:
            loss = loss + orthogonal_regularization(g_params, cfg.ortho_reg)
        return loss, g_mut

    def g_update(g_params, g_state, g_opt_state, d_params, d_state, rng):
        rngs = jax.random.split(rng, cfg.grad_accum)

        def loss_and_mut_grad(g_state, rng_i):
            (loss, g_mut), grads = jax.value_and_grad(g_microbatch_loss, has_aux=True)(
                g_params, g_state, d_params, d_state, rng_i
            )
            return (loss, g_mut), grads

        grads, loss, g_state = _accumulate(
            loss_and_mut_grad, g_state, [(r,) for r in rngs], cfg.grad_accum
        )
        updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        gnorm = optax.global_norm(grads) if cfg.log_grad_norms else jnp.zeros(())
        return g_params, g_state, g_opt_state, loss, gnorm

    # ------------------------------------------------- fused G+D (1 fwd)
    def fused_microbatch_loss(gp_dp, g_state, d_state, real, labels, rng):
        """Joint loss whose gradient splits exactly into (g_grads, d_grads).

        One shared G forward per microbatch: ``fake`` feeds the D loss
        through a stop-gradient and the G loss directly; the G loss sees a
        stop-gradient'd copy of the D parameters, so
        ``∂(d_loss+g_loss)/∂d = ∂d_loss/∂d`` and ``∂(·)/∂g = ∂g_loss/∂g``.
        The two D(fake) applications share identical primals (same params,
        state, input) and XLA CSEs them into one — the whole iteration
        costs one G fwd + two D fwds instead of the sequential step's two
        G fwds + three D fwds. Semantics delta vs the reference's
        sequential sess.runs (SURVEY §3.1): the G update is taken against
        the PRE-update D (simultaneous GAN updates) and reuses the D
        step's z instead of drawing a fresh one.
        """
        g_params, d_params = gp_dp
        z_rng, label_rng = jax.random.split(rng)
        z = sample_z(z_rng, (real.shape[0], cfg.z_dim), cfg.train_z_dist, cfg.truncation)
        fake_labels = _sample_labels(label_rng, real.shape[0], cfg.num_classes)
        fake, g_mut = gen_forward(g_params, g_state, z, fake_labels)
        fake = fake.astype(real.dtype)

        real_logits, d_mut = disc_forward(d_params, d_state, real, labels)
        fake_sg = jax.lax.stop_gradient(fake)
        # both fake applications must see the SAME input state (post-real):
        # SN's u advances per call, and identical primals are what lets XLA
        # CSE the two D(fake) forwards into one.
        d_state_fake_in = d_mut
        fl_d, d_mut = disc_forward(d_params, d_state_fake_in, fake_sg, fake_labels)
        d_loss = discriminator_loss(cfg.gan_type, real_logits, fl_d)
        if uses_gradient_penalty(cfg.gan_type):
            gp_rng = jax.random.fold_in(rng, 7)
            d_apply = lambda imgs: disc_forward(d_params, d_state, imgs, labels)[0]  # noqa: E731
            d_loss = d_loss + gradient_penalty(
                d_apply, gp_rng, real, fake_sg, cfg.gan_type, cfg.gp_weight
            )

        fl_g, _ = disc_forward(
            jax.lax.stop_gradient(d_params),
            jax.lax.stop_gradient(d_state_fake_in),
            fake,
            fake_labels,
        )
        g_loss = generator_loss(cfg.gan_type, fl_g)
        if cfg.ortho_reg > 0:
            g_loss = g_loss + orthogonal_regularization(g_params, cfg.ortho_reg)
        return d_loss + g_loss, (d_loss, g_loss, g_mut, d_mut)

    def fused_train_step(state: GANTrainState, batch: dict):
        import chex

        chex.assert_shape(
            batch["image"], (1, cfg.batch_size, cfg.img_size, cfg.img_size, 3)
        )
        rng = state.rng
        rng, flip_rng, step_rng = jax.random.split(rng, 3)
        real = prepare_real(batch["image"][0], flip_rng)
        labels = batch["label"][0] if "label" in batch else None

        real_m = real.reshape(cfg.grad_accum, micro, *real.shape[1:])
        rngs = jax.random.split(step_rng, cfg.grad_accum)
        xs_list = [
            (real_m[i],
             None if labels is None else labels.reshape(cfg.grad_accum, micro)[i],
             rngs[i])
            for i in range(cfg.grad_accum)
        ]

        def loss_and_mut_grad(states, real_i, labels_i, rng_i):
            g_state, d_state = states
            (_, aux), grads = jax.value_and_grad(fused_microbatch_loss, has_aux=True)(
                (state.g_params, state.d_params), g_state, d_state, real_i, labels_i, rng_i
            )
            d_loss, g_loss, g_mut, d_mut = aux
            return (jnp.stack([d_loss, g_loss]), (g_mut, d_mut)), grads

        grads, losses, (g_state, d_state) = _accumulate(
            loss_and_mut_grad, (state.g_state, state.d_state), xs_list, cfg.grad_accum
        )
        g_grads, d_grads = grads
        d_loss, g_loss = losses[0], losses[1]

        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        decay = cfg.moving_decay
        g_ema_params = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.g_ema_params, g_params
        )
        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_state=g_state,
            d_state=d_state,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            g_ema_params=g_ema_params,
            rng=rng,
        )
        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "d_grad_norm": optax.global_norm(d_grads) if cfg.log_grad_norms else jnp.zeros(()),
            "g_grad_norm": optax.global_norm(g_grads) if cfg.log_grad_norms else jnp.zeros(()),
        }
        return new_state, metrics

    # --------------------------------------------------------------- step
    def train_step(state: GANTrainState, batch: dict):
        """batch["image"]: [n_critic, batch_size, H, W, C] in [-1, 1];
        batch.get("label"): [n_critic, batch_size] int32 or absent."""
        import chex

        # trace-time shape contract (SURVEY §5 "sanitizers": chex asserts)
        chex.assert_shape(
            batch["image"], (cfg.n_critic, cfg.batch_size, cfg.img_size, cfg.img_size, 3)
        )
        if "label" in batch:
            chex.assert_shape(batch["label"], (cfg.n_critic, cfg.batch_size))
        rng = state.rng
        d_params, d_state, d_opt_state = state.d_params, state.d_state, state.d_opt_state

        d_losses, d_gnorms = [], []
        for i in range(cfg.n_critic):
            rng, d_rng = jax.random.split(rng)
            labels_i = batch["label"][i] if "label" in batch else None
            d_params, d_state, d_opt_state, d_loss, d_gnorm = d_update(
                d_params, d_state, d_opt_state,
                state.g_params, state.g_state,
                batch["image"][i], labels_i, d_rng,
            )
            d_losses.append(d_loss)
            d_gnorms.append(d_gnorm)
        d_gnorm = jnp.mean(jnp.stack(d_gnorms))  # mean over critic steps, not last

        rng, g_rng = jax.random.split(rng)
        g_params, g_state, g_opt_state, g_loss, g_gnorm = g_update(
            state.g_params, state.g_state, state.g_opt_state, d_params, d_state, g_rng
        )

        # EMA generator (ref MovingAverageOptimizer(average_decay=moving_decay),
        # BigGAN_128.py:~240): shadow = decay·shadow + (1−decay)·param.
        decay = cfg.moving_decay
        g_ema_params = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.g_ema_params, g_params
        )

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_state=g_state,
            d_state=d_state,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            g_ema_params=g_ema_params,
            rng=rng,
        )
        metrics = {
            "d_loss": jnp.mean(jnp.stack(d_losses)),
            "g_loss": g_loss,
            "d_grad_norm": d_gnorm,
            "g_grad_norm": g_gnorm,
        }
        return new_state, metrics

    if cfg.fused_gd:
        if cfg.n_critic != 1:
            raise ValueError("fused_gd requires n_critic=1 (one shared fake batch)")
        return fused_train_step
    return train_step


def jit_train_step(cfg: GANConfig, axis_name: Optional[str] = None):
    """jit with the state donated — the HBM-friendly default entry point."""
    return jax.jit(make_train_step(cfg, axis_name), donate_argnums=0)
