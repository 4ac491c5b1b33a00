"""Training state: one pytree carrying everything a resumable run needs
(SURVEY.md §5 checkpoint row): generator/discriminator params, both Adam
states, the EMA generator, the RNG key, and the global step.

Because the networks create the FULL progressive parameter tree at init
(see models/generator.py), this state has the same tree structure at every
stage — checkpoints restore across stage boundaries with no shape surgery.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gansynth_tpu.models import Discriminator, Generator
from gansynth_tpu.utils.config import Config


@struct.dataclass
class TrainState:
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    ema_params: Any
    rng: jax.Array
    step: jax.Array  # int32 scalar, drives the progressive schedule


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Two of these are made — one for G, one for D (T4)."""
    t = config.train
    return optax.adam(t.learning_rate, b1=t.adam_beta1, b2=t.adam_beta2,
                      eps=t.adam_eps)


def create_train_state(config: Config, seed: int | None = None) -> TrainState:
    """Initialize params (stage-independent tree; init traced at stage 0),
    optimizer states, and the EMA copy (= initial G params)."""
    m = config.model
    seed = config.train.seed if seed is None else seed
    key = jax.random.key(seed)
    kg, kd, krest = jax.random.split(key, 3)

    g = Generator(m)
    d = Discriminator(m)
    z = jnp.zeros((1, m.latent_dim), jnp.float32)
    labels = jnp.zeros((1, m.num_pitches), jnp.float32)
    h, w = m.stage_resolution(0)
    img = jnp.zeros((1, h, w, m.num_channels), jnp.float32)

    g_params = g.init(kg, z, labels, 0)
    d_params = d.init(kd, img, 0)
    opt = make_optimizer(config)
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt=opt.init(g_params),
        d_opt=opt.init(d_params),
        ema_params=jax.tree.map(jnp.copy, g_params),
        rng=krest,
        step=jnp.zeros((), jnp.int32),
    )


def ema_update(ema_params: Any, new_params: Any, decay: float) -> Any:
    """T5: exponential moving average of generator variables."""
    return jax.tree.map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, new_params
    )
