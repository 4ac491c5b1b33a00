"""The fully-jitted latent+pitch -> waveform sampler (SURVEY.md §3.2).

One XLA program runs the whole synthesis path on device:

    z ~ N(0, I), pitch one-hot
    -> generator (EMA params) -> 128x1024x2 mel-IF image
    -> mel pseudo-inverse (S9) -> IF*pi cumsum phase (S10)
    -> inverse STFT (synthesis window OLA) -> 64000-sample waveform

This path's throughput is the north-star metric (x-real-time per chip);
``bench.py`` times it steady-state by amortizing batches inside one
``lax.scan``d program and synchronizing through a fetched scalar checksum
(``block_until_ready`` must never be used for timing on tunneled TPU
backends — it does not block there).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gansynth_tpu.models import Generator
from gansynth_tpu.models.layers import upsample_nearest
from gansynth_tpu.ops.spectral import image_to_wave
from gansynth_tpu.train.step import pitch_to_onehot
from gansynth_tpu.utils.config import Config


def _full_wave(config: Config, image: jax.Array, stage: int) -> jax.Array:
    """Image -> waveform tail shared by every sampler. Spectral synthesis
    needs the full 128x1024 grid; below the final stage, nearest-upsample
    the image first (debug/listen path — the reference's generate mode
    only runs at the final stage)."""
    factor = 1 << (config.model.num_stages - 1 - stage)
    full = upsample_nearest(image, factor) if factor > 1 else image
    return image_to_wave(full, config.audio)


def _keyed_body(config: Config, stage: int):
    """``(params, key, pitch) -> (wave, image)`` — ONE definition shared
    by the single-device and data-parallel keyed samplers, so their math
    cannot drift apart (the DP≡single-device equality tests pin it)."""
    g = Generator(config.model)

    def sample(params, key: jax.Array, pitch: jax.Array):
        z = jax.random.normal(
            key, (pitch.shape[0], config.model.latent_dim), jnp.float32
        )
        labels = pitch_to_onehot(pitch, config)
        image = g.apply(params, z, labels, stage, jnp.float32(1.0))
        return _full_wave(config, image, stage), image

    return sample


def _seeded_body(config: Config, stage: int):
    """``(params, seeds, pitch) -> wave`` — ONE definition shared by the
    single-device and data-parallel serving samplers. The serving
    contract (per-note audio a pure function of ``(params, seed_i,
    pitch_i)``) depends on both computing identical math."""
    g = Generator(config.model)

    def sample(params, seeds: jax.Array, pitch: jax.Array):
        keys = jax.vmap(jax.random.key)(seeds.astype(jnp.uint32))
        z = jax.vmap(
            lambda k: jax.random.normal(
                k, (config.model.latent_dim,), jnp.float32
            )
        )(keys)
        labels = pitch_to_onehot(pitch, config)
        image = g.apply(params, z, labels, stage, jnp.float32(1.0))
        return _full_wave(config, image, stage)

    return sample


def make_sampler(config: Config, stage: Optional[int] = None):
    """Build ``sample(params, key, pitch) -> (wave [B, 64000], image)``.

    ``params`` are generator (usually EMA) params; ``pitch`` is MIDI ints
    [B]. Stage defaults to the final 128x1024 resolution. Jitted with the
    batch size static per compile (shapes static under XLA).
    """
    stage = config.model.num_stages - 1 if stage is None else stage
    return jax.jit(_keyed_body(config, stage))


def make_seeded_sampler(config: Config, stage: Optional[int] = None):
    """Per-note-seeded sampler: ``sample(params, seeds [B] i32, pitch [B])
    -> wave [B, 64000]``.

    Each note's latent derives from ITS OWN key (``jax.random.key(seed_i)``)
    instead of one whole-batch key, so a note's audio is a pure function of
    ``(params, seed_i, pitch_i)`` — independent of batch position and of
    whatever other notes share the device program. This is what makes
    request coalescing in the serving layer (serve.py) semantics-free.
    """
    stage = config.model.num_stages - 1 if stage is None else stage
    return jax.jit(_seeded_body(config, stage))


def _latent_body(config: Config, stage: int):
    """``(params, z, labels) -> (wave, image)`` — ONE definition shared
    by the in-process latent sampler and the exported artifact's latent
    program (synth/export.py), so checkpoint-driven and artifact-driven
    interpolation render identical math."""
    g = Generator(config.model)

    def sample(params, z: jax.Array, labels: jax.Array):
        image = g.apply(
            params,
            z.astype(jnp.float32),
            labels.astype(jnp.float32),
            stage,
            jnp.float32(1.0),
        )
        factor = 1 << (config.model.num_stages - 1 - stage)
        full = upsample_nearest(image, factor) if factor > 1 else image
        return image_to_wave(full, config.audio), image

    return sample


def make_latent_sampler(config: Config, stage: Optional[int] = None):
    """Explicit-latent sampler: ``sample(params, z [B, D], labels
    [B, num_pitches]) -> (wave [B, 64000], image)``.

    The latent AND the conditioning row are caller-supplied instead of
    drawn from a key — the surface the interpolation path
    (``synth/interpolate.py``, ``cli interpolate``) renders through:
    slerp'd latents and soft (lerp'd one-hot) pitch labels batch through
    ONE jitted generator call.
    """
    stage = config.model.num_stages - 1 if stage is None else stage
    return jax.jit(_latent_body(config, stage))


def make_dp_sampler(config: Config, mesh, stage: Optional[int] = None):
    """Data-parallel sampler over a mesh: params replicated, the pitch
    batch and output waveforms sharded on the batch axis — latent->audio
    serving scales across a slice with zero code changes to the model
    (SURVEY.md §2.7). Returns ``sample(params, key, pitch)``.
    """
    from gansynth_tpu.parallel.sharding import (
        batch_sharding,
        replicated_sharding,
    )

    stage = config.model.num_stages - 1 if stage is None else stage
    rep, shard = replicated_sharding(mesh), batch_sharding(mesh)
    body = _keyed_body(config, stage)

    return jax.jit(
        lambda params, key, pitch: body(params, key, pitch)[0],
        in_shardings=(rep, None, shard),
        out_shardings=shard,
    )


def make_dp_seeded_sampler(config: Config, mesh, stage: Optional[int] = None):
    """Data-parallel per-note-seeded sampler: the serving sampler
    (``make_seeded_sampler``'s contract) over a mesh — params replicated,
    seeds/pitches/waveforms sharded on the batch axis.

    A note's audio stays a pure function of ``(params, seed_i, pitch_i)``
    (its latent derives from its own key), so coalescing AND device
    placement are both semantics-free: the serving layer can batch
    arbitrary requests across the slice. Byte-stability is per
    (rung, placement) — within one mesh-sharded service a note's bytes
    are exact per rung, but the sharded program is a different XLA
    specialization than the single-device one and may differ from it in
    the last float bits (~1e-4 relative, measured).
    """
    from gansynth_tpu.parallel.sharding import (
        batch_sharding,
        replicated_sharding,
    )

    stage = config.model.num_stages - 1 if stage is None else stage
    rep, shard = replicated_sharding(mesh), batch_sharding(mesh)

    return jax.jit(
        _seeded_body(config, stage),
        in_shardings=(rep, shard, shard),
        out_shardings=shard,
    )


class Sampler:
    """Convenience wrapper holding config + generator params (C3 path:
    restore EMA params from checkpoint, then ``sampler(key, pitches)``)."""

    def __init__(self, config: Config, params, stage: Optional[int] = None):
        self.config = config
        self.params = params
        self._sample = make_sampler(config, stage)

    def __call__(self, key: jax.Array, pitch) -> Tuple[jax.Array, jax.Array]:
        pitch = jnp.asarray(pitch, jnp.int32)
        return self._sample(self.params, key, pitch)
