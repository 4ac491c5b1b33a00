"""Data-parallel sharding over a TPU slice (SURVEY.md §2.7–2.8, §7 step 5).

The communication "backend" of this framework is deliberately thin — the
TPU-native replacement for per-rank NCCL code is GSPMD partitioning:

- a 1-D ``data`` mesh over all devices (``jax.make_mesh``),
- parameters/optimizer/EMA state replicated (``P()``),
- the (wave, pitch) batch sharded on its leading axis (``P('data')``),
- ``jax.jit`` with those shardings; XLA inserts the gradient all-reduces
  and the cross-replica collectives for global batch statistics (losses,
  minibatch stddev) over ICI automatically.

Because every reduction in the step is a global-batch mean, the sharded
step is numerically equivalent to a single-device step on the same global
batch — asserted by tests/test_parallel.py on an 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over ``devices`` (default: all).

    Axis type Auto: the step function is written sharding-agnostic and
    GSPMD infers intermediate shardings / inserts collectives (explicit
    mode would require reshard annotations at every replicated/sharded
    meeting point, e.g. latents x labels).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    return jax.make_mesh(
        (len(devices),),
        ("data",),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def make_multislice_mesh(
    num_slices: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D ``(replica, data)`` mesh for multi-slice data parallelism.

    Within a slice the ``data`` axis rides ICI; across slices the
    ``replica`` axis rides DCN. The batch shards over BOTH axes (see
    :func:`batch_sharding`), so the training step is unchanged — XLA
    emits a hierarchical gradient all-reduce (reduce-scatter/all-gather
    over ICI, the small cross-slice sum over DCN). On real multi-slice
    hardware the device grid comes from
    ``mesh_utils.create_hybrid_device_mesh`` (which groups devices by
    ``slice_index`` so the fat axis stays on ICI); elsewhere (CPU tests,
    single slice) a plain reshape stands in.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % num_slices:
        raise ValueError(f"{n} devices do not divide {num_slices} slices")
    per_slice = n // num_slices
    # Real multi-slice hardware carries slice_index metadata per device;
    # decide the grid source EXPLICITLY instead of catching a broad
    # exception — a genuine topology/config error must surface, not
    # silently degrade to a reshape whose replica axis straddles ICI/DCN.
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) > 1:
        if len(slice_ids) != num_slices:
            raise ValueError(
                f"devices span {len(slice_ids)} slices but num_slices="
                f"{num_slices}"
            )
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (num_slices, 1), devices=devices
        )
    else:  # no slice metadata (CPU tests / single physical slice)
        import numpy as np

        if devices[0].platform != "cpu":
            import warnings

            warnings.warn(
                "make_multislice_mesh: no multi-slice metadata on "
                f"{devices[0].platform} devices; using a plain reshape — "
                "the replica axis may not align with DCN boundaries",
                stacklevel=2,
            )
        grid = np.array(devices).reshape(num_slices, per_slice)
    return Mesh(
        grid,
        ("replica", "data"),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
    )


def _batch_axes(mesh: Mesh):
    """Every mesh axis participates in batch sharding (pure DP)."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over all mesh axes."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_inputs(mesh: Mesh, state, wave, pitch):
    """Place state replicated and the batch sharded on the mesh.

    The global batch size must divide the mesh size. Returns device
    arrays; pass them to the jitted step.
    """
    n = mesh.devices.size
    if wave.shape[0] % n:
        raise ValueError(
            f"global batch {wave.shape[0]} must divide mesh size {n}"
        )
    rep, shard = replicated_sharding(mesh), batch_sharding(mesh)
    state = jax.device_put(state, rep)
    return state, jax.device_put(wave, shard), jax.device_put(pitch, shard)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host pod-slice setup: one call per process before any JAX op.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server (pass nothing); elsewhere pass them explicitly. After this,
    ``jax.devices()`` spans the whole slice and :func:`make_mesh` builds a
    global data mesh — the rest of the framework is unchanged.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicate_on_mesh(mesh: Mesh, tree):
    """Place a pytree fully replicated on ``mesh``, multi-process-safe.

    Single-process: a plain ``device_put``. Multi-process: a global mesh
    contains non-addressable devices, which ``device_put`` rejects — each
    process instead contributes its (identical) full value per leaf via
    ``make_array_from_process_local_data``. Typed PRNG keys round-trip
    through their raw key data (the assembly API moves plain arrays).
    """
    import numpy as np

    rep = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)

    def put(leaf):
        is_key = jax.dtypes.issubdtype(
            getattr(leaf, "dtype", None), jax.dtypes.prng_key
        )
        data = jax.random.key_data(leaf) if is_key else leaf
        out = jax.make_array_from_process_local_data(rep, np.asarray(data))
        return jax.random.wrap_key_data(out) if is_key else out

    return jax.tree.map(put, tree)


def shard_host_local_batch(mesh: Mesh, wave, pitch):
    """Assemble a GLOBAL batch from per-process host-local shards.

    In multi-host training each process decodes only its slice of the
    global batch (``make_nsynth_iterator(..., num_shards=jax.process_count(),
    shard_index=jax.process_index())``); this stitches those local arrays
    into global jax.Arrays with the mesh's batch sharding. In a
    single-process run it degrades to a plain sharded device_put.
    """
    import numpy as np

    sharding = batch_sharding(mesh)
    wave_g = jax.make_array_from_process_local_data(sharding, np.asarray(wave))
    pitch_g = jax.make_array_from_process_local_data(
        sharding, np.asarray(pitch)
    )
    return wave_g, pitch_g


def jit_train_step_for_mesh(step_fn: Callable, mesh: Mesh):
    """Jit a ``(state, wave, pitch, alpha) -> (state, metrics)`` step with
    explicit DP shardings (donating the state buffer)."""
    rep, shard = replicated_sharding(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, shard, shard, None),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def chunk_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a stacked multi-step chunk [K, B, ...]: the scan axis
    K replicated, the batch axis sharded over all mesh axes."""
    return NamedSharding(mesh, P(None, _batch_axes(mesh)))


def shard_host_local_chunk(mesh: Mesh, waves, pitches):
    """Multi-step analog of :func:`shard_host_local_batch`: assemble
    global [K, B, ...] chunks from per-process [K, B_local, ...] slices
    (single-process: a plain sharded device_put)."""
    import numpy as np

    sharding = chunk_sharding(mesh)
    waves_g = jax.make_array_from_process_local_data(
        sharding, np.asarray(waves)
    )
    pitches_g = jax.make_array_from_process_local_data(
        sharding, np.asarray(pitches)
    )
    return waves_g, pitches_g


def cache_sharding(mesh: Mesh, layout: str) -> NamedSharding:
    """Sharding for the HBM-resident (--device-cache) dataset [N, ...]:
    ``"replicate"`` keeps a full copy per device (communication-free batch
    gather), ``"shard"`` splits the example axis over the mesh (per-device
    HBM scales the cacheable dataset; the gather costs one O(B*T)
    collective per step). See TrainConfig.device_cache_layout."""
    if layout == "replicate":
        return replicated_sharding(mesh)
    if layout == "shard":
        return NamedSharding(mesh, P(_batch_axes(mesh)))
    raise ValueError(f"unknown device_cache_layout {layout!r}")


def jit_cached_superstep_for_mesh(
    superstep_fn: Callable, mesh: Mesh, layout: str
):
    """Jit a cached-dataset K-step program ``(state, all_waves [N, T],
    all_pitches [N], alphas [K]) -> (state, metrics)`` with DP shardings:
    replicated state, the dataset placed per ``layout``, and the per-step
    gathered batch forced onto the ``data`` axis inside the program (the
    superstep built with ``make_cached_superstep(..., mesh=mesh)``)."""
    rep = replicated_sharding(mesh)
    cache = cache_sharding(mesh, layout)
    return jax.jit(
        superstep_fn,
        in_shardings=(rep, cache, cache, None),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def jit_superstep_for_mesh(superstep_fn: Callable, mesh: Mesh):
    """Jit a fused K-step program ``(state, waves [K, B, T], pitches
    [K, B], alphas [K]) -> (state, metrics)`` with DP shardings: the scan
    carries a replicated state; every inner step's batch math shards over
    ``data`` exactly as the single-step program does."""
    rep, chunk = replicated_sharding(mesh), chunk_sharding(mesh)
    return jax.jit(
        superstep_fn,
        in_shardings=(rep, chunk, chunk, None),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )
