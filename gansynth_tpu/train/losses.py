"""WGAN-GP + drift + auxiliary pitch-classification losses
(SURVEY.md §2.5, T1–T3).

Pure functions over network apply-fns so that the gradient penalty's
second-order gradients (grad-of-grad-of-critic) stay mechanical under
``jax.grad``. The critic apply passed in must be a pure function
``image -> (critic_scores [B], pitch_logits [B, P])``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def wgan_critic_loss(critic_real: jax.Array, critic_fake: jax.Array) -> jax.Array:
    """T1 core: E[D(fake)] - E[D(real)] (the critic minimizes this)."""
    return jnp.mean(critic_fake) - jnp.mean(critic_real)


def interpolate(
    real: jax.Array, fake: jax.Array, key: jax.Array
) -> jax.Array:
    """Per-sample uniform interpolates x_hat = real + u (fake - real)."""
    u = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    return real + u * (fake - real)


def penalty_from_grads(grads: jax.Array) -> jax.Array:
    """E[(||g||_2 - 1)^2] over per-sample gradient norms."""
    norms = jnp.sqrt(
        jnp.sum(jnp.square(grads), axis=tuple(range(1, grads.ndim))) + 1e-12
    )
    return jnp.mean(jnp.square(norms - 1.0))


def gradient_penalty(
    critic_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    real: jax.Array,
    fake: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """T1 penalty: E[(||grad_x D(x_hat)||_2 - 1)^2] on uniform interpolates.

    The gradient is taken of the SUM of critic scores w.r.t. the whole
    interpolated batch — matching the reference family's autograd
    convention, and correctly including cross-sample coupling introduced by
    minibatch-stddev. Differentiating the result w.r.t. critic params is a
    second-order gradient; JAX composes it mechanically.
    """
    interp = interpolate(real, fake, key)
    grads = jax.grad(lambda x: jnp.sum(critic_fn(x)[0]))(interp)
    return penalty_from_grads(grads)


def drift_penalty(critic_real: jax.Array) -> jax.Array:
    """T2: E[D(real)^2] (PGGAN epsilon-drift stabilizer)."""
    return jnp.mean(jnp.square(critic_real))


def pitch_cross_entropy(logits: jax.Array, labels_onehot: jax.Array) -> jax.Array:
    """T3: softmax cross-entropy against one-hot pitch labels."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels_onehot * logprobs, axis=-1))


def generator_adversarial_loss(critic_fake: jax.Array) -> jax.Array:
    """-E[D(fake)] (the generator maximizes the critic's score)."""
    return -jnp.mean(critic_fake)
