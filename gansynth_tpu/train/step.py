"""The jitted WGAN-GP training step (SURVEY.md §2.5 T1–T6, §3.1).

One call = one full iteration, entirely on device: spectral frontend on
the raw waveform batch (on-device preprocessing — no host-side Python hot
loop), one discriminator update (3 critic passes: real, fake, gradient-
penalty interpolates, with second-order gradients through the critic),
one generator update against the refreshed critic, and the EMA update.

``stage`` is baked in statically (one compile per stage, 7 total);
``alpha`` is traced so fade-in never recompiles. The function is pure
``(state, wave, pitch, alpha) -> (state, metrics)`` — under ``jax.jit``
with a replicated state and a batch-sharded wave/pitch it runs
data-parallel over any mesh with XLA inserting the gradient/stat
collectives (SURVEY.md §2.7–2.8); all batch statistics (losses, minibatch
stddev) are then global-batch statistics, identical to a single-device run
on the same global batch.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gansynth_tpu.models import Discriminator, Generator
from gansynth_tpu.models.layers import downsample_avg
from gansynth_tpu.ops.harmonic import image_pitch_logits
from gansynth_tpu.ops.spectral import wave_to_image
from gansynth_tpu.train import losses
from gansynth_tpu.train.state import TrainState, ema_update, make_optimizer
from gansynth_tpu.utils.config import Config


def real_image_for_stage(wave: jax.Array, stage: int, config: Config) -> jax.Array:
    """Frontend + progressive downsampling: wave [B, T] -> image at the
    stage's resolution (full-res mel-IF image average-pooled down)."""
    image = wave_to_image(wave, config.audio)
    factor = 1 << (config.model.num_stages - 1 - stage)
    if factor > 1:
        image = downsample_avg(image, factor)
    return image


def pitch_to_onehot(pitch: jax.Array, config: Config) -> jax.Array:
    """MIDI pitch [B] -> one-hot [B, num_pitches] (D2: pitches 24..84)."""
    idx = jnp.clip(
        pitch.astype(jnp.int32) - config.model.pitch_min,
        0,
        config.model.num_pitches - 1,
    )
    return jax.nn.one_hot(idx, config.model.num_pitches, dtype=jnp.float32)


def make_train_step(
    config: Config, stage: int
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array],
              Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the (un-jitted) step function for ``stage``. Jit it with
    ``jax.jit(step, donate_argnums=0)``; shard inputs for data parallelism.
    """
    m, t = config.model, config.train
    if t.fused_critic not in ("none", "pair", "all"):
        raise ValueError(f"unknown fused_critic {t.fused_critic!r}")
    g = Generator(m)
    d = Discriminator(m)
    opt = make_optimizer(config)

    def step_fn(
        state: TrainState, wave: jax.Array, pitch: jax.Array, alpha: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        # Deterministic per-step RNG: the state key is the run's seed; the
        # step index folds in per-iteration variation, so resume replays
        # the identical stream.
        base = jax.random.fold_in(state.rng, state.step)
        k_zd, k_interp, k_zg = jax.random.split(base, 3)

        labels = pitch_to_onehot(pitch, config)
        with jax.named_scope("spectral_frontend"):
            real = real_image_for_stage(wave.astype(jnp.float32), stage, config)
        batch = real.shape[0]

        # ----- discriminator update (T1 + T2 + T3) -----
        z_d = jax.random.normal(k_zd, (batch, m.latent_dim), jnp.float32)

        def d_loss_fn(d_params):
            fake = g.apply(state.g_params, z_d, labels, stage, alpha)
            fake = jax.lax.stop_gradient(fake)

            def critic_fn(x):
                return d.apply(d_params, x, stage, alpha)

            # The three critic passes, scheduled per t.fused_critic.
            # vmap over a stacked leading axis keeps minibatch-stddev
            # grouping per sub-batch (bitwise-equivalent statistics)
            # while presenting XLA with one fatter conv batch.
            if t.fused_critic == "pair":
                c2, l2 = jax.vmap(critic_fn)(jnp.stack([real, fake]))
                c_real, c_fake = c2[0], c2[1]
                logits_real, logits_fake = l2[0], l2[1]
                gp = losses.gradient_penalty(critic_fn, real, fake, k_interp)
            elif t.fused_critic == "all":
                interp = losses.interpolate(real, fake, k_interp)

                def scores_from_interp(x_interp):
                    c3, l3 = jax.vmap(critic_fn)(
                        jnp.stack([real, fake, x_interp])
                    )
                    return jnp.sum(c3[2]), (c3, l3)

                (_, (c3, l3)), gp_grads = jax.value_and_grad(
                    scores_from_interp, has_aux=True
                )(interp)
                c_real, c_fake = c3[0], c3[1]
                logits_real, logits_fake = l3[0], l3[1]
                gp = losses.penalty_from_grads(gp_grads)
            else:
                c_real, logits_real = critic_fn(real)
                c_fake, logits_fake = critic_fn(fake)
                gp = losses.gradient_penalty(critic_fn, real, fake, k_interp)
            wgan = losses.wgan_critic_loss(c_real, c_fake)
            drift = losses.drift_penalty(c_real)
            ce = losses.pitch_cross_entropy(logits_real, labels)
            # SURVEY.md DS2: the AC-GAN pitch head trains on real AND fake
            # batches (both at the same weight); config-gated for the
            # real-only ablation.
            ce_fake = losses.pitch_cross_entropy(logits_fake, labels)
            aux = ce + ce_fake if t.d_pitch_ce_on_fake else ce
            loss = wgan + t.gp_weight * gp + t.drift_weight * drift \
                + t.aux_pitch_weight * aux
            metrics = {
                "d_loss": loss,
                "wgan": wgan,
                "gradient_penalty": gp,
                "drift": drift,
                "d_pitch_ce": ce,
                "d_pitch_ce_fake": ce_fake,
                "critic_real": jnp.mean(c_real),
                "critic_fake": jnp.mean(c_fake),
            }
            return loss, metrics

        with jax.named_scope("discriminator_update"):
            (_, d_metrics), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.d_params)
        d_updates, d_opt = opt.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ----- generator update (fresh latents, refreshed critic) -----
        z_g = jax.random.normal(k_zg, (batch, m.latent_dim), jnp.float32)

        def g_loss_fn(g_params):
            fake = g.apply(g_params, z_g, labels, stage, alpha)
            c_fake, logits_fake = d.apply(d_params, fake, stage, alpha)
            adv = losses.generator_adversarial_loss(c_fake)
            ce = losses.pitch_cross_entropy(logits_fake, labels)
            loss = adv + t.aux_pitch_weight * ce
            metrics = {"g_loss": loss, "g_adv": adv, "g_pitch_ce": ce}
            if (
                t.pitch_consistency_weight > 0.0
                and stage >= t.pitch_consistency_min_stage
            ):
                # Parameter-free harmonic-template CE on the generated
                # image — anchors the audible fundamental to the
                # conditioned label through a classifier the generator
                # cannot watermark (ops/harmonic.py).
                pc = losses.pitch_cross_entropy(
                    image_pitch_logits(
                        fake, stage, config, t.pitch_consistency_tau
                    ),
                    labels,
                )
                loss = loss + t.pitch_consistency_weight * pc
                metrics = {**metrics, "g_loss": loss, "g_pitch_consistency": pc}
            return loss, metrics

        with jax.named_scope("generator_update"):
            (_, g_metrics), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.g_params)
        g_updates, g_opt = opt.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        ema_params = ema_update(state.ema_params, g_params, t.ema_decay)

        new_state = TrainState(
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            ema_params=ema_params,
            rng=state.rng,
            step=state.step + 1,
        )
        return new_state, {**d_metrics, **g_metrics, "alpha": alpha}

    return step_fn


def make_superstep(
    config: Config, stage: int
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array],
              Tuple[TrainState, Dict[str, jax.Array]]]:
    """K train steps fused into ONE device program via ``lax.scan``.

    ``(state, waves [K, B, T], pitches [K, B], alphas [K]) ->
    (state, metrics)`` — metrics are means over the K inner steps (plus
    the last alpha). Per-step RNG still derives from ``(state.rng,
    state.step)``, so a run chunked as K=8 supersteps is bitwise identical
    to 8 single steps. Amortizing host dispatch this way is what keeps
    training device-paced (SURVEY.md §3.1's "no host-side Python hot
    loop", applied to the dispatch boundary itself).
    """
    step_fn = make_train_step(config, stage)

    def superstep(state, waves, pitches, alphas):
        def body(s, xs):
            wave, pitch, alpha = xs
            return step_fn(s, wave, pitch, alpha)

        state, metrics = jax.lax.scan(body, state, (waves, pitches, alphas))
        out = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)
        out["alpha"] = alphas[-1]
        return state, out

    return superstep


def cached_batch_indices(
    rng: jax.Array,
    step: jax.Array,
    batch: int,
    num_examples: int,
    law: str = "shuffle",
) -> jax.Array:
    """Example indices of the cached-stream batch at global ``step`` — a
    pure function of ``(rng, step)``, so the stream is stateless and
    resume-exact under any chunking.

    ``"shuffle"``: the stream is the concatenation of per-epoch
    permutations of [0, N) (keyed off ``(rng, epoch)``) read at global
    example offset ``step * batch`` — every example appears exactly once
    per epoch. A batch straddling an epoch boundary mixes the tail of one
    permutation with the head of the next (requires ``batch <= N``).
    ``"replacement"``: uniform i.i.d. draws keyed off ``(rng, step)``.
    """
    step = jnp.asarray(step)
    if law == "replacement":
        # Distinct from the train step's internal fold_in(rng, step)
        # stream: one extra fold with a constant salt.
        k = jax.random.fold_in(jax.random.fold_in(rng, step), 0x5A17)
        return jax.random.randint(k, (batch,), 0, num_examples)
    offset = step * batch
    pos = offset + jnp.arange(batch, dtype=step.dtype)
    epoch = pos // num_examples
    rank = pos % num_examples

    def perm_for(e):
        k = jax.random.fold_in(jax.random.fold_in(rng, 0x5E0F), e)
        return jax.random.permutation(k, num_examples)

    e0 = offset // num_examples
    # At most two epochs appear in one batch (batch <= N): gather from
    # this epoch's permutation and the next, select by position.
    return jnp.where(
        epoch == e0, perm_for(e0)[rank], perm_for(e0 + 1)[rank]
    )


def make_cached_superstep(
    config: Config, stage: int, num_examples: int, mesh=None
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array],
              Tuple[TrainState, Dict[str, jax.Array]]]:
    """Superstep over a DEVICE-RESIDENT dataset: zero host transfer/step.

    ``(state, all_waves [N, T], all_pitches [N], alphas [K])`` — each
    inner step draws its batch via :func:`cached_batch_indices`, a pure
    function of ``(state.rng, state.step)``, so the data stream is
    STATELESS: resume at step ``s`` replays the identical batches with no
    iterator state to persist. ``config.train.cached_stream`` picks the
    law: ``"shuffle"`` (per-epoch permutations — reference shuffle-epoch
    semantics, the default) or ``"replacement"`` (uniform i.i.d., the
    round-2 behavior, kept for continuations of older runs).

    Intended for datasets that fit in HBM (fixtures, subsets); the
    streaming ingest path covers the rest. The per-stage batch override
    (``stage_batch_sizes``) applies — ``stage`` is static per compile.

    With ``mesh`` set, the gathered per-step batch is constrained onto
    the mesh's batch axes, so the step's compute runs data-parallel
    regardless of how the dataset itself is laid out (replicated or
    example-sharded — see ``parallel.cache_sharding``); jit via
    ``jit_cached_superstep_for_mesh``. The index math is replicated, so
    the batch CONTENT is identical to the single-device stream.
    """
    step_fn = make_train_step(config, stage)
    batch = config.train.batch_for_stage(stage)
    law = config.train.cached_stream
    if law not in ("shuffle", "replacement"):
        raise ValueError(f"unknown cached_stream {law!r}")
    if law == "shuffle" and batch > num_examples:
        # The two-permutation gather covers at most 2 epochs per batch.
        raise ValueError(
            f"cached_stream='shuffle' needs batch ({batch}) <= dataset "
            f"size ({num_examples}); use 'replacement' or a smaller batch"
        )
    batch_spec = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n = mesh.devices.size
        if batch % n:
            raise ValueError(
                f"stage {stage} global batch {batch} must be divisible "
                f"by the mesh size {n}"
            )
        batch_spec = NamedSharding(
            mesh, PartitionSpec(tuple(mesh.axis_names))
        )

    def superstep(state, all_waves, all_pitches, alphas):
        def body(s, alpha):
            idx = cached_batch_indices(
                s.rng, s.step, batch, num_examples, law
            )
            wave_b, pitch_b = all_waves[idx], all_pitches[idx]
            if batch_spec is not None:
                wave_b = jax.lax.with_sharding_constraint(wave_b, batch_spec)
                pitch_b = jax.lax.with_sharding_constraint(
                    pitch_b, batch_spec
                )
            return step_fn(s, wave_b, pitch_b, alpha)

        state, metrics = jax.lax.scan(body, state, alphas)
        out = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)
        out["alpha"] = alphas[-1]
        return state, out

    return superstep
