"""Orbax checkpointing of the full training state (SURVEY.md §5).

A checkpoint carries ``{g_params, d_params, g_opt, d_opt, ema_params,
rng, step}`` — everything needed to resume ``(step, stage, alpha)``
exactly, since stage/alpha are pure functions of ``step`` via the
schedule. Because the parameter tree is stage-independent (see
models/generator.py), restores work across stage boundaries with no shape
surgery.

Typed PRNG keys are converted to raw key data on save and re-wrapped on
restore (orbax serializes plain arrays).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from gansynth_tpu.train.state import TrainState


def _unwrap_keys(state: TrainState) -> TrainState:
    return state.replace(rng=jax.random.key_data(state.rng))


def _wrap_keys(state: TrainState) -> TrainState:
    # No np.asarray: stays a device array (host transfers of small non-f32
    # arrays can be pathologically slow through tunneled TPU backends).
    return state.replace(rng=jax.random.wrap_key_data(state.rng))


def save_ema_npz(
    path: str, ema_params, step: int, stage: Optional[int] = None,
    dtype: Optional[str] = None,
) -> str:
    """Export the EMA generator alone as one ``.npz`` (compact, durable).

    A full TrainState checkpoint carries both optimizers and both networks
    (~7x the generator's size); sampling/evaluation (SURVEY.md §3.2, C3)
    need only the EMA params, so this is the artifact worth archiving with
    a finished run. Keys are '/'-joined pytree paths; the checkpoint step
    rides along as ``__step__`` and (when known) the trained progressive
    stage as ``__stage__`` — restoring tools then need no schedule config
    to sample at the right resolution.

    ``dtype`` (e.g. ``"float16"``) down-casts floating leaves on export,
    halving the archive; :func:`load_ema_npz` re-casts to the template's
    dtypes, so restore is transparent. Half-precision params perturb the
    synthesized audio below the bf16 activation noise already present at
    inference — fine for distribution artifacts, keep ``None`` (full
    precision) for checkpoints a finetune might resume from.
    """
    import numpy as np

    cast = np.dtype(dtype) if dtype is not None else None
    flat, _ = jax.tree_util.tree_flatten_with_path(ema_params)
    arrays = {}
    for kp, leaf in flat:
        arr = np.asarray(leaf)
        if cast is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(cast)
        arrays[jax.tree_util.keystr(kp)] = arr
    arrays["__step__"] = np.asarray(step, np.int64)
    if stage is not None:
        arrays["__stage__"] = np.asarray(stage, np.int64)
    # Atomic replace: the loop rewrites this path on every checkpoint, and
    # restore tools PREFER it when no full checkpoint dir is present — a
    # crash mid-write must not leave a truncated archive behind.
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_ema_npz(
    path: str, template
) -> Tuple[object, int, Optional[int]]:
    """Inverse of :func:`save_ema_npz`: rebuild the EMA param pytree in the
    structure of ``template`` (e.g. ``create_train_state(cfg).ema_params``).
    Returns ``(ema_params, step, stage-or-None)``."""
    import numpy as np

    with np.load(path) as data:
        step = int(data["__step__"])
        stage = int(data["__stage__"]) if "__stage__" in data else None
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for kp, leaf in flat:
            key = jax.tree_util.keystr(kp)
            if key not in data:
                raise KeyError(f"{path} is missing param {key!r}")
            arr = data[key]
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"{key!r}: checkpoint shape {arr.shape} != template "
                    f"shape {leaf.shape} (config mismatch?)"
                )
            leaves.append(jax.numpy.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), step, stage


class Checkpointer:
    """Thin orbax CheckpointManager wrapper for TrainState."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, *, wait: bool = False) -> None:
        self._mgr.save(
            step, args=ocp.args.StandardSave(_unwrap_keys(state))
        )
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template: TrainState, step: Optional[int] = None
    ) -> Tuple[TrainState, int]:
        """Restore into the (abstract) structure of ``template``."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, _unwrap_keys(template)
        )
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return _wrap_keys(restored), step

    def wait(self) -> None:
        """Block until pending async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
