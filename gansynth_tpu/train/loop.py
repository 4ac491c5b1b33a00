"""The outer training loop (SURVEY.md §2.5 T6, §7 step 4).

Python drives only the schedule and the infeed; every step is one jitted
device program. Step functions are cached per ``(stage, fused, released)``
— one compile per stage, times two when an anchor-release schedule splits
a stage into pre/post-release loss programs (DESIGN.md §4g); fade alpha is
a traced argument, so fade-in never recompiles. Resume restores the full
state pytree and recomputes (stage, alpha, release phase) from the
restored step, so a restart lands exactly where it left off.

With ``config.train.unroll > 1`` the loop fuses K consecutive steps into
ONE device program (``make_superstep``'s ``lax.scan``), amortizing host
dispatch; with ``device_dataset`` set, the whole (small) dataset lives in
HBM and each inner step samples its batch on device — zero host transfer
per step and a stateless, resume-exact data stream.

Throughput telemetry synchronizes by FETCHING a scalar metric before
reading the clock — on tunneled TPU backends ``block_until_ready`` does
not actually block (see bench.py), so a fetch is the only device-true
barrier.

Graceful stop (preemption-style): a ``STOP`` file in the workdir (written
by ``cli stop``) makes the loop checkpoint at the next superstep boundary
and return cleanly — exit 0 under ``cli supervise``, which therefore does
not restart. The file is one-shot (consumed when honored); a file already
present at startup is honored at the first boundary (never silently
discarded — it may be a live request that raced a supervised child's
spawn). Multi-host runs OR-reduce the per-host file checks at
log-cadence crossings so every process stops at the same step — the
operator's ``cli stop`` may be executed on ANY host of the pod.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gansynth_tpu.parallel.sharding import (
    jit_superstep_for_mesh,
    jit_train_step_for_mesh,
    make_mesh,
    replicate_on_mesh,
    shard_host_local_chunk,
    shard_train_inputs,
)
from gansynth_tpu.train.schedule import schedule_from_config
from gansynth_tpu.train.state import TrainState, create_train_state
from gansynth_tpu.train.step import (
    make_cached_superstep,
    make_superstep,
    make_train_step,
)
from gansynth_tpu.utils.config import Config


def _dump_samples(
    config, state, sample, step: int, workdir: str, logger=None
) -> None:
    """Periodic EMA-generator artifacts (SURVEY.md §5): sample the
    configured pitches at the CURRENT stage, write wavs, and emit
    TensorBoard audio/spectrogram summaries when a logger is attached.

    ``sample`` is a stage-bound sampler from ``make_sampler`` — built ONCE
    per stage by the caller (the same dict-cache pattern as ``step_fns``):
    ``make_sampler`` returns a fresh ``jax.jit`` each call, so rebuilding
    it here would recompile the whole synthesis program on every dump."""
    import os

    from gansynth_tpu.utils.audio_io import write_wav
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


def _crossed(prev: int, new: int, every: int) -> bool:
    """True when (prev, new] contains a multiple of ``every``."""
    return every > 0 and new // every > prev // every


def _maybe_inject_stall(spec: str, step: int) -> None:
    """Fault injection for the supervisor's stall-detection test (see
    train/supervisor.py): ``spec`` is ``"<step>:<flagfile>"`` — hang the
    loop once ``step`` reaches ``<step>``, unless ``<flagfile>`` already
    exists (it is created on the way into the hang, so a supervised
    RESTART runs past it — a transient wedge, like the real one)."""
    at, flag = spec.split(":", 1)
    if step >= int(at) and not os.path.exists(flag):
        with open(flag, "w") as f:
            f.write(str(step))
        while True:  # simulated wedged device dispatch: never returns
            time.sleep(3600)


def train(
    config: Config,
    data_iter: Optional[Iterator[Tuple[np.ndarray, np.ndarray]]],
    *,
    num_steps: Optional[int] = None,
    workdir: Optional[str] = None,
    state: Optional[TrainState] = None,
    mesh: Optional[object] = None,
    use_mesh: bool = False,
    checkpointer: Optional[object] = None,
    on_metrics: Optional[Callable[[int, int, Dict], None]] = None,
    device_dataset: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    data_position: int = 0,
    data_factory: Optional[Callable[[int, int, int], Iterator]] = None,
) -> TrainState:
    """Run (or resume) training; returns the final state.

    data_iter yields (wave [B, 64000] f32, pitch [B] int) numpy batches;
    it may be None when ``device_dataset`` (all_waves [N, T], all_pitches
    [N]) supplies an HBM-resident dataset, or when ``data_factory``
    supplies per-stage streams.

    ``data_factory(stage, global_batch, skip_batches)`` builds the data
    stream for one ladder stage — required when
    ``config.train.stage_batch_sizes`` varies the batch across stages (a
    fixed-batch ``data_iter`` cannot change shape mid-stream). Each
    stage's stream is independent; on (re)entering a stage the loop
    requests the stream already advanced ``skip_batches`` = steps into
    that stage, so resume is exact with no cross-stage position
    arithmetic.

    Data-iterator resume (SURVEY.md §5): the stream position IS the global
    step (one batch per step), so on resume the loop fast-forwards
    ``data_iter`` by ``restored_step - data_position`` batches —
    ``data_position`` declares how far the caller already advanced it
    (e.g. via ``make_nsynth_iterator(skip_batches=...)``, which skips in
    tf.data's C++ threadpool; or pass ``data_position=int(state.step)``
    for an in-process continuation of a live iterator). The
    ``device_dataset`` path needs none of this — its batch sampling is a
    pure function of (rng, step).
    """
    schedule = schedule_from_config(config)
    unroll = max(1, int(config.train.unroll))
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
    if device_dataset is not None:
        # Keep the cache on host until the placement decision — a pod
        # process must not round-trip 100s of MiB through its default
        # device before slicing out its contribution.
        all_waves = np.asarray(device_dataset[0], np.float32)
        all_pitches = np.asarray(device_dataset[1], np.int32)
        num_examples = int(all_waves.shape[0])
        if mesh is None:
            all_waves = jnp.asarray(all_waves)
            all_pitches = jnp.asarray(all_pitches)
        else:
            # Mesh-resident cache: place the dataset per
            # config.train.device_cache_layout ("replicate" = full copy
            # per device, "shard" = example axis split across the mesh)
            # and let the cached superstep constrain each gathered batch
            # onto the data axis — the stateless zero-host-transfer
            # stream, data-parallel.
            from gansynth_tpu.parallel.sharding import cache_sharding

            layout = config.train.device_cache_layout
            if layout == "shard" and num_examples % mesh.devices.size:
                raise ValueError(
                    f"device_cache_layout='shard' needs the dataset size "
                    f"({num_examples}) divisible by the mesh size "
                    f"({mesh.devices.size}); pad/trim the cache or use "
                    "'replicate'"
                )
            placement = cache_sharding(mesh, layout)
            if jax.process_count() == 1:
                all_waves = jax.device_put(all_waves, placement)
                all_pitches = jax.device_put(all_pitches, placement)
            else:
                # Multi-host: every process decodes the IDENTICAL full
                # dataset (the cache fill is unsharded and seed-
                # deterministic) and contributes its piece — the whole
                # array under "replicate", its contiguous example-range
                # under "shard" (mesh device order groups by process, so
                # each process's addressable shards are one contiguous
                # range, same assembly contract as
                # shard_host_local_batch).
                np_w = np.asarray(all_waves)
                np_p = np.asarray(all_pitches)
                if layout == "shard":
                    per = num_examples // jax.process_count()
                    lo = jax.process_index() * per
                    np_w, np_p = np_w[lo:lo + per], np_p[lo:lo + per]
                all_waves = jax.make_array_from_process_local_data(
                    placement, np_w
                )
                all_pitches = jax.make_array_from_process_local_data(
                    placement, np_p
                )
    elif data_iter is None and data_factory is None:
        raise ValueError("pass data_iter, data_factory, or device_dataset")
    if (
        config.train.stage_batch_sizes is not None
        and device_dataset is None
        and data_factory is None
    ):
        raise ValueError(
            "stage_batch_sizes needs data_factory (a fixed-batch "
            "data_iter cannot change shape across stages) or "
            "device_dataset"
        )
    if data_iter is not None:
        behind = int(state.step) - data_position
        if behind < 0:
            raise ValueError(
                f"data_position {data_position} is ahead of the restored "
                f"step {int(state.step)}"
            )
        for _ in range(behind):
            next(data_iter)
    if mesh is not None:
        state = replicate_on_mesh(mesh, state)
        if unroll == 1 and data_iter is not None:
            # Double-buffered sharded infeed: keep batches transferred
            # ahead of the step so host decode overlaps device compute
            # (SURVEY.md §7 step 5; mitigates hard-part 4). With unroll>1
            # the fused program amortizes the dispatch instead and chunks
            # are assembled/sharded below.
            from gansynth_tpu.data.nsynth import prefetch_to_mesh

            data_iter = prefetch_to_mesh(data_iter, mesh, depth=2)

    # One-run anchor->release schedule (DESIGN.md §4g): at the release
    # step the loss weights change, which is a compile boundary exactly
    # like a stage change — the step-fn cache keys on the phase and the
    # chunk length clamps at the boundary. Phase is a pure function of
    # the global step, so resume needs no extra state.
    release_step = config.train.pitch_consistency_release_step
    if release_step is not None:
        # Flag validation (round-3 advisor): a negative release silently
        # means "released from step 0", and releasing with no anchor set
        # still flips d_pitch_ce_on_fake — away from DS2 parity — which
        # the flag's name does not suggest. Fail loudly on both.
        if release_step < 0:
            raise ValueError(
                f"pitch_consistency_release_step {release_step} is "
                "negative (would mean 'released from step 0')"
            )
        if config.train.pitch_consistency_weight == 0.0:
            raise ValueError(
                "pitch_consistency_release_step is set but "
                "pitch_consistency_weight is 0 — there is no anchor to "
                "release, and the release would still turn off the "
                "AC-GAN fake-batch pitch CE (a change to D's objective). "
                "Set --pitch-consistency > 0, or drop the release flag "
                "and use the d_pitch_ce_on_fake config field directly."
            )
    released_config = config.released() if release_step is not None else None

    step_fns: Dict[Tuple[int, bool, bool], Callable] = {}
    sampler_fns: Dict[int, Callable] = {}

    def get_sampler(stage: int):
        if stage not in sampler_fns:
            from gansynth_tpu.synth.sampler import make_sampler

            sampler_fns[stage] = make_sampler(config, stage)
        return sampler_fns[stage]

    def get_step_fn(stage: int, fused: bool, released: bool):
        key = (stage, fused, released)
        if key not in step_fns:
            cfg = released_config if released else config
            if device_dataset is not None:
                fn = make_cached_superstep(
                    cfg, stage, num_examples, mesh=mesh
                )
                if mesh is not None:
                    from gansynth_tpu.parallel.sharding import (
                        jit_cached_superstep_for_mesh,
                    )

                    step_fns[key] = jit_cached_superstep_for_mesh(
                        fn, mesh, config.train.device_cache_layout
                    )
                else:
                    step_fns[key] = jax.jit(fn, donate_argnums=0)
            elif not fused:
                fn = make_train_step(cfg, stage)
                step_fns[key] = (
                    jit_train_step_for_mesh(fn, mesh)
                    if mesh is not None
                    else jax.jit(fn, donate_argnums=0)
                )
            else:
                fn = make_superstep(cfg, stage)
                step_fns[key] = (
                    jit_superstep_for_mesh(fn, mesh)
                    if mesh is not None
                    else jax.jit(fn, donate_argnums=0)
                )
        return step_fns[key]

    start = int(state.step)
    end = schedule.total_steps() if num_steps is None else start + num_steps
    if release_step is not None and release_step > end and start < end:
        import warnings

        # Not an error: a resumed continuation may legitimately carry a
        # release scheduled past this invocation's end (and stopping a
        # run EXACTLY at the release step is the manual two-phase
        # pattern, so == end stays silent). But a typo'd step (e.g.
        # 2480000 for 248000) would otherwise never release, silently.
        warnings.warn(
            f"pitch_consistency_release_step {release_step} is at/past "
            f"this run's final step {end} — the anchor will NOT release "
            "during this invocation (typo?)",
            stacklevel=2,
        )
    t_last = time.perf_counter()
    steps_since_log = 0
    stall_spec = os.environ.get("GANSYNTH_TRAIN_STALL")

    # Graceful stop (preemption-style): a STOP file in the workdir makes
    # the loop checkpoint at the next superstep boundary and return
    # cleanly (exit 0 under `cli supervise`, which therefore does NOT
    # restart — the supervisor treats a zero exit as "done"). The file is
    # a one-shot request: it is consumed when honored, so a later resume
    # runs normally. `cli stop --model-dir DIR` writes it.
    stop_path = os.path.join(workdir, "STOP") if workdir is not None else None
    if stop_path and os.path.exists(stop_path):
        import warnings

        # A pre-existing file is HONORED (stop at the first boundary,
        # with a checkpoint), not discarded: a request written between a
        # supervised child's spawn and this scan (operator `cli stop`,
        # supervisor SIGTERM — which writes exactly once) is
        # indistinguishable from a stale leftover, and silently deleting
        # a live request makes `stop --wait` report success while the
        # run continues. A genuinely stale file just costs one clean
        # boundary-checkpoint run that resumes normally afterwards.
        warnings.warn(
            f"STOP file {stop_path} already present at startup — this "
            "run will checkpoint and exit at its first superstep "
            "boundary (remove the file first if that is not intended)",
            stacklevel=2,
        )

    def _stop_requested(prev: int, new: int) -> bool:
        if stop_path is None:
            return False
        if jax.process_count() == 1:
            return os.path.exists(stop_path)
        # Multi-host: every process must take the SAME decision at the
        # SAME step or the SPMD programs desync. Evaluate only at
        # deterministic step crossings (log cadence bounds the stop
        # latency) and OR-reduce the per-host file checks — `cli stop`
        # may be executed on ANY host of the pod (its filesystem is the
        # only one the operator can reach), so process 0's view alone
        # would silently ignore a request written elsewhere and leave
        # its `--wait` reporting "no live run is polling it".
        if not _crossed(prev, new, max(config.train.log_every, 1)):
            return False
        from jax.experimental import multihost_utils

        flag = np.int32(os.path.exists(stop_path))
        return bool(multihost_utils.process_allgather(flag).max())

    def _stage_start(step: int) -> int:
        for _, seg_start, seg_end in schedule.stage_boundaries():
            if step < seg_end:
                return seg_start
        return seg_start  # past the ladder: final stage's segment

    factory_stage = None
    step_idx = start
    while step_idx < end:
        stage, _ = schedule.stage_and_alpha(step_idx)
        if data_factory is not None and stage != factory_stage:
            # Per-stage stream: built already advanced to this step's
            # position within the stage (exact resume, any batch size).
            data_iter = data_factory(
                stage,
                config.train.batch_for_stage(stage),
                step_idx - _stage_start(step_idx),
            )
            if mesh is not None and unroll == 1:
                from gansynth_tpu.data.nsynth import prefetch_to_mesh

                data_iter = prefetch_to_mesh(data_iter, mesh, depth=2)
            factory_stage = stage
        k = min(unroll, end - step_idx,
                schedule.steps_until_stage_change(step_idx))
        released = release_step is not None and step_idx >= release_step
        if release_step is not None and not released:
            k = min(k, release_step - step_idx)
        alphas = np.asarray(
            [schedule.stage_and_alpha(step_idx + i)[1] for i in range(k)],
            np.float32,
        )

        if device_dataset is not None:
            state, metrics = get_step_fn(stage, True, released)(
                state, all_waves, all_pitches, jnp.asarray(alphas)
            )
        elif k == 1 and unroll == 1:
            wave, pitch = next(data_iter)
            if mesh is not None and not hasattr(wave, "sharding"):
                state, wave, pitch = shard_train_inputs(
                    mesh, state, wave, pitch
                )
            state, metrics = get_step_fn(stage, False, released)(
                state, jnp.asarray(wave), jnp.asarray(pitch),
                jnp.float32(alphas[0]),
            )
        else:
            batches = [next(data_iter) for _ in range(k)]
            waves = np.stack([np.asarray(b[0]) for b in batches])
            pitches = np.stack([np.asarray(b[1]) for b in batches])
            if mesh is not None:
                waves, pitches = shard_host_local_chunk(mesh, waves, pitches)
            state, metrics = get_step_fn(stage, True, released)(
                state, jnp.asarray(waves), jnp.asarray(pitches),
                jnp.asarray(alphas),
            )
        steps_since_log += k

        new_step = step_idx + k
        if logger is not None and (
            _crossed(step_idx, new_step, config.train.log_every)
            or new_step == end
        ):
            # Device-true sync: FETCH one scalar (block_until_ready does
            # not block on tunneled backends) before reading the clock.
            metrics = dict(metrics)
            metrics["d_loss"] = float(jax.device_get(metrics["d_loss"]))
            now = time.perf_counter()
            metrics["steps_per_sec"] = steps_since_log / max(now - t_last, 1e-9)
            t_last, steps_since_log = now, 0
            logger.log(new_step, metrics, stage=stage)
        if on_metrics is not None:
            on_metrics(new_step, stage, metrics)
        stop_now = _stop_requested(step_idx, new_step)
        if checkpointer is not None and (
            _crossed(step_idx, new_step, config.train.checkpoint_every)
            or new_step == end
            or stop_now
        ):
            checkpointer.save(new_step, state)
            if workdir is not None:
                # Durable compact artifact alongside the full checkpoint:
                # the EMA generator alone (all that generate/evaluate/serve
                # need), small enough to archive with the run.
                from gansynth_tpu.utils.checkpoint import save_ema_npz

                save_ema_npz(
                    f"{workdir}/ema.npz", state.ema_params, new_step,
                    stage=schedule.stage_and_alpha(max(new_step - 1, 0))[0],
                )
        if (
            workdir is not None
            and config.train.sample_every
            and _crossed(step_idx, new_step, config.train.sample_every)
        ):
            _dump_samples(
                config, state, get_sampler(stage), new_step, workdir, logger
            )
        if stall_spec:
            _maybe_inject_stall(stall_spec, new_step)
        step_idx = new_step
        if stop_now:
            # One-shot: consume the request on WHICHEVER host(s) hold the
            # file (any host's STOP participates in the OR-reduce above).
            if os.path.exists(stop_path):
                os.remove(stop_path)
            print(
                f"graceful stop: STOP file honored at step {new_step}; "
                "checkpointed and exiting cleanly",
                flush=True,
            )
            break

    if checkpointer is not None:
        checkpointer.wait()
    if logger is not None:
        logger.close()
    return state
