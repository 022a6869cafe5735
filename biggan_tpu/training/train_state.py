"""The complete training state as one explicit pytree.

Everything the reference mutates as TF graph side effects per ``sess.run``
(SURVEY.md §3.1) is a field here: SN ``u`` vectors and BN population stats
live inside ``g_state`` / ``d_state`` (flax collections), the EMA generator
is ``g_ema_params`` (ref ``tf.contrib.opt.MovingAverageOptimizer``,
BigGAN_128.py:~240), the resume counter is ``step`` (the reference encodes
it in the checkpoint *filename*, BigGAN_128.py:~400-430 — here it is just
state), and the sampling RNG is carried so runs are reproducible across
checkpoint/resume.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from biggan_tpu.configs.base import GANConfig
from biggan_tpu.models.nets import Discriminator, Generator


@flax.struct.dataclass
class GANTrainState:
    step: jax.Array  # int32 scalar
    g_params: Any
    d_params: Any
    g_state: Any  # {"batch_stats": ..., "sn_u": ...}
    d_state: Any
    g_opt_state: Any
    d_opt_state: Any
    g_ema_params: Any  # the averaged generator (sampling/eval weights)
    rng: jax.Array


def _split_variables(variables):
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    state.setdefault("batch_stats", {})
    state.setdefault("sn_u", {})
    return params, state


def build_models(cfg: GANConfig):
    from biggan_tpu import enable_compilation_cache
    from biggan_tpu.kernels.conv_pallas import set_conv_impl
    from biggan_tpu.ops.sn import set_sn_impl

    from biggan_tpu.kernels.attention_pallas import set_attn_tuning

    enable_compilation_cache()
    set_sn_impl(cfg.sn_impl)
    set_conv_impl(cfg.conv_impl)
    set_attn_tuning(score_dtype=cfg.attn_score_dtype)
    dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.norm_bwd not in ("pinned", "ref"):
        raise ValueError(f"norm_bwd must be 'pinned' or 'ref', got {cfg.norm_bwd!r}")
    opt_bwd = cfg.norm_bwd == "pinned"
    # Gradient-penalty losses differentiate through D's backward pass;
    # custom_vjp rules are first-order only, so D keeps naive-autodiff BN.
    from biggan_tpu.ops.losses import uses_gradient_penalty

    d_opt_bwd = opt_bwd and not uses_gradient_penalty(cfg.gan_type)
    generator = Generator(
        img_size=cfg.img_size,
        ch=cfg.ch,
        num_classes=cfg.num_classes,
        embed_dim=cfg.embed_dim,
        use_sn=cfg.sn,
        materialize_weights=cfg.materialize_weights,
        up_mode=cfg.g_up_mode,
        attn_impl=cfg.attn_impl,
        remat=cfg.remat,
        norm_opt_bwd=opt_bwd,
        dtype=dtype,
    )
    discriminator = Discriminator(
        img_size=cfg.img_size,
        ch=cfg.ch,
        num_classes=cfg.num_classes,
        use_sn=cfg.sn,
        materialize_weights=cfg.materialize_weights,
        use_d_norm=cfg.d_norm,
        attn_impl=cfg.attn_impl,
        remat=cfg.remat,
        norm_opt_bwd=d_opt_bwd,
        dtype=dtype,
    )
    return generator, discriminator


def build_optimizers(cfg: GANConfig):
    # ref build_model (BigGAN_128.py:~240): Adam(g_lr, β1, β2) / Adam(d_lr, β1, β2)
    mu_dtype = jnp.dtype(cfg.adam_mu_dtype)
    g_opt = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2, mu_dtype=mu_dtype)
    d_opt = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2, mu_dtype=mu_dtype)
    return g_opt, d_opt


def create_train_state(cfg: GANConfig, rng: jax.Array) -> GANTrainState:
    generator, discriminator = build_models(cfg)
    g_opt, d_opt = build_optimizers(cfg)

    g_rng, d_rng, state_rng = jax.random.split(rng, 3)
    micro = max(cfg.batch_size // cfg.grad_accum, 1)
    z = jnp.zeros((micro, cfg.z_dim), jnp.float32)
    img = jnp.zeros((micro, cfg.img_size, cfg.img_size, 3), jnp.float32)
    labels = jnp.zeros((micro,), jnp.int32) if cfg.num_classes > 0 else None

    g_vars = generator.init(g_rng, z, labels, train=True)
    d_vars = discriminator.init(d_rng, img, labels, train=True)
    g_params, g_state = _split_variables(g_vars)
    d_params, d_state = _split_variables(d_vars)

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_state=g_state,
        d_state=d_state,
        g_opt_state=g_opt.init(g_params),
        d_opt_state=d_opt.init(d_params),
        # EMA starts at init; must be a real copy — aliasing g_params'
        # buffers makes the donated train step fail with "donate the same
        # buffer twice".
        g_ema_params=jax.tree.map(jnp.copy, g_params),
        rng=state_rng,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
