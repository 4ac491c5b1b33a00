"""The outer training loop (SURVEY.md §2.5 T6, §7 step 4).

Python drives only the schedule and the infeed; every step is one jitted
device program. One compiled step function per (stage) — 7 compiles over a
full run — cached in a dict; fade alpha is a traced argument. Resume
restores the full state pytree and recomputes (stage, alpha) from the
restored step, so a restart lands exactly where it left off.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gansynth_tpu.parallel.sharding import (
    jit_train_step_for_mesh,
    make_mesh,
    replicated_sharding,
    shard_train_inputs,
)
from gansynth_tpu.train.schedule import ProgressiveSchedule
from gansynth_tpu.train.state import TrainState, create_train_state
from gansynth_tpu.train.step import make_train_step
from gansynth_tpu.utils.config import Config


def _dump_samples(
    config, state, stage: int, step: int, workdir: str, logger=None
) -> None:
    """Periodic EMA-generator artifacts (SURVEY.md §5): sample the
    configured pitches at the CURRENT stage, write wavs, and emit
    TensorBoard audio/spectrogram summaries when a logger is attached."""
    import os

    from gansynth_tpu.synth.sampler import make_sampler
    from gansynth_tpu.utils.audio_io import write_wav

    sample = make_sampler(config, stage)
    pitches = jnp.asarray(config.train.sample_pitches, jnp.int32)
    key = jax.random.fold_in(jax.random.key(config.train.seed), step)
    waves, images = sample(state.ema_params, key, pitches)
    out_dir = os.path.join(workdir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    for pitch, wave in zip(config.train.sample_pitches, np.asarray(waves)):
        write_wav(
            os.path.join(out_dir, f"step{step:08d}_pitch{pitch}.wav"),
            wave,
            config.audio.sample_rate,
        )
    if logger is not None:
        logger.log_artifacts(step, waves, images, config.audio.sample_rate)


def train(
    config: Config,
    data_iter: Iterator[Tuple[np.ndarray, np.ndarray]],
    *,
    num_steps: Optional[int] = None,
    workdir: Optional[str] = None,
    state: Optional[TrainState] = None,
    mesh: Optional[object] = None,
    use_mesh: bool = False,
    checkpointer: Optional[object] = None,
    on_metrics: Optional[Callable[[int, int, Dict], None]] = None,
) -> TrainState:
    """Run (or resume) training; returns the final state.

    data_iter yields (wave [B, 64000] f32, pitch [B] int) numpy batches.
    """
    schedule = ProgressiveSchedule(
        num_stages=config.model.num_stages,
        fade_steps=config.train.fade_steps,
        stable_steps=config.train.stable_steps,
    )
    logger = None
    if workdir is not None:
        from gansynth_tpu.utils.logging import MetricLogger

        logger = MetricLogger(workdir)
        if checkpointer is None:
            from gansynth_tpu.utils.checkpoint import Checkpointer

            checkpointer = Checkpointer(f"{workdir}/checkpoints")

    if state is None:
        state = create_train_state(config)
        if checkpointer is not None and checkpointer.latest_step() is not None:
            state, _ = checkpointer.restore(state)

    if use_mesh and mesh is None:
        mesh = make_mesh()
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
        # Double-buffered sharded infeed: keep batches transferred ahead of
        # the step so host decode overlaps device compute (SURVEY.md §7
        # step 5; mitigates hard-part 4).
        from gansynth_tpu.data.nsynth import prefetch_to_mesh

        data_iter = prefetch_to_mesh(data_iter, mesh, depth=2)

    step_fns: Dict[int, Callable] = {}

    def get_step_fn(stage: int):
        if stage not in step_fns:
            fn = make_train_step(config, stage)
            step_fns[stage] = (
                jit_train_step_for_mesh(fn, mesh)
                if mesh is not None
                else jax.jit(fn, donate_argnums=0)
            )
        return step_fns[stage]

    start = int(state.step)
    end = schedule.total_steps() if num_steps is None else start + num_steps
    t_last = time.perf_counter()
    steps_since_log = 0

    for step_idx in range(start, end):
        stage, alpha = schedule.stage_and_alpha(step_idx)
        wave, pitch = next(data_iter)
        if mesh is not None and not hasattr(wave, "sharding"):
            state, wave, pitch = shard_train_inputs(mesh, state, wave, pitch)
        state, metrics = get_step_fn(stage)(
            state, jnp.asarray(wave), jnp.asarray(pitch), jnp.float32(alpha)
        )
        steps_since_log += 1

        new_step = step_idx + 1
        if logger is not None and (
            new_step % config.train.log_every == 0 or new_step == end
        ):
            jax.block_until_ready(metrics)
            now = time.perf_counter()
            metrics = dict(metrics)
            metrics["steps_per_sec"] = steps_since_log / max(now - t_last, 1e-9)
            t_last, steps_since_log = now, 0
            logger.log(new_step, metrics, stage=stage)
        if on_metrics is not None:
            on_metrics(new_step, stage, metrics)
        if checkpointer is not None and (
            new_step % config.train.checkpoint_every == 0 or new_step == end
        ):
            checkpointer.save(new_step, state)
        if (
            workdir is not None
            and config.train.sample_every
            and new_step % config.train.sample_every == 0
        ):
            _dump_samples(config, state, stage, new_step, workdir, logger)

    if checkpointer is not None:
        checkpointer.wait()
    if logger is not None:
        logger.close()
    return state
