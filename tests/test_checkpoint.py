"""Checkpoint/resume tests (SURVEY.md §5): save -> restore equivalence,
resume mid-run determinism, cross-device-count restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gansynth_tpu.train import create_train_state, make_train_step
from gansynth_tpu.utils.checkpoint import Checkpointer
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=2),
)


def tiny_batch():
    rng = np.random.default_rng(0)
    wave = (0.1 * rng.standard_normal((2, 64000))).astype(np.float32)
    pitch = np.array([50, 60], dtype=np.int32)
    return jnp.asarray(wave), jnp.asarray(pitch)


def assert_states_equal(a, b):
    la = jax.tree.leaves(a, is_leaf=lambda x: hasattr(x, "dtype"))
    lb = jax.tree.leaves(b, is_leaf=lambda x: hasattr(x, "dtype"))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x, y = jax.random.key_data(x), jax.random.key_data(y)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path):
    state = create_train_state(CFG, seed=0)
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(0, state, wait=True)
    template = create_train_state(CFG, seed=123)  # different values, same tree
    restored, step = ckpt.restore(template)
    assert step == 0
    assert_states_equal(state, restored)


def test_resume_bitwise_equals_straight_run(tmp_path):
    """train 2 steps == train 1, checkpoint, restore, train 1 (SURVEY §5)."""
    wave, pitch = tiny_batch()
    step = jax.jit(make_train_step(CFG, 1))

    s = create_train_state(CFG, seed=0)
    s_direct, _ = step(s, wave, pitch, jnp.float32(1.0))
    s_direct, _ = step(s_direct, wave, pitch, jnp.float32(1.0))

    s2 = create_train_state(CFG, seed=0)
    s2, _ = step(s2, wave, pitch, jnp.float32(1.0))
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(1, s2, wait=True)
    restored, at = ckpt.restore(create_train_state(CFG, seed=9))
    assert at == 1
    s_resumed, _ = step(restored, wave, pitch, jnp.float32(1.0))
    assert_states_equal(s_direct, s_resumed)


def test_latest_step_and_missing(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "empty"))
    assert ckpt.latest_step() is None
    with pytest.raises(FileNotFoundError):
        ckpt.restore(create_train_state(CFG, seed=0))


def test_ema_npz_roundtrip(tmp_path):
    """Compact EMA export == in-memory EMA params; step+stage ride along."""
    from gansynth_tpu.utils.checkpoint import load_ema_npz, save_ema_npz

    state = create_train_state(CFG, seed=0)
    path = str(tmp_path / "ema.npz")
    save_ema_npz(path, state.ema_params, 1234, stage=5)
    template = create_train_state(CFG, seed=7).ema_params
    loaded, step, stage = load_ema_npz(path, template)
    assert step == 1234 and stage == 5
    assert_states_equal(state.ema_params, loaded)
    save_ema_npz(path, state.ema_params, 8)  # stage unknown
    _, step, stage = load_ema_npz(path, template)
    assert step == 8 and stage is None


def test_ema_npz_float16_export(tmp_path):
    """dtype="float16" halves the archive; restore re-casts to the
    template's float32 within half-precision tolerance."""
    import os

    from gansynth_tpu.utils.checkpoint import load_ema_npz, save_ema_npz

    state = create_train_state(CFG, seed=0)
    full = str(tmp_path / "ema32.npz")
    half = str(tmp_path / "ema16.npz")
    save_ema_npz(full, state.ema_params, 7, stage=2)
    save_ema_npz(half, state.ema_params, 7, stage=2, dtype="float16")
    assert os.path.getsize(half) < 0.75 * os.path.getsize(full)
    template = create_train_state(CFG, seed=9).ema_params
    loaded, step, stage = load_ema_npz(half, template)
    assert step == 7 and stage == 2
    for ref, got in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(loaded)
    ):
        assert got.dtype == ref.dtype  # template dtype, not f16
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=1e-3, atol=1e-3
        )


def test_ema_npz_shape_mismatch_rejected(tmp_path):
    from gansynth_tpu.utils.checkpoint import load_ema_npz, save_ema_npz

    state = create_train_state(CFG, seed=0)
    path = str(tmp_path / "ema.npz")
    save_ema_npz(path, state.ema_params, 0)
    other = Config(
        model=ModelConfig(latent_dim=4, fmap_base=64, fmap_max=16, fmap_min=8),
        train=TrainConfig(batch_size=2),
    )
    template = create_train_state(other, seed=0).ema_params
    with pytest.raises(ValueError):
        load_ema_npz(path, template)


def test_stage_auto_uses_persisted_train_config(tmp_path, capsys):
    """A run's compressed schedule is persisted with it; `--stage auto`
    derives the TRAINED stage from that file, not from the caller's flags
    (regression: evaluating the fidelity run without repeating its
    --stage-*-steps flags sampled at stage 0 and scored garbage)."""
    import json

    from gansynth_tpu.cli import main as cli_main

    model_dir = tmp_path / "run"
    flags = ["--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
             "--config", str(tmp_path / "cfg.json")]
    (tmp_path / "cfg.json").write_text('{"model": {"fmap_min": 8}}')
    rc = cli_main([
        "train", "--model-dir", str(model_dir), "--synthetic",
        "--batch-size", "2", "--num-steps", "5",
        "--stage-fade-steps", "0,1,1,1,1,1,1",
        "--stage-stable-steps", "1,1,1,1,1,1,1",
        "--checkpoint-every", "5", "--log-every", "0",
    ] + flags)
    assert rc == 0
    assert json.load(open(model_dir / "train_config.json"))[
        "train"]["stage_fade_steps"] == [0, 1, 1, 1, 1, 1, 1]
    # evaluate WITHOUT the schedule flags: stage must come from the file
    # (step 5 on the 0,1/1,1... schedule = stage 2), not the 800k default
    # schedule (which would say stage 0).
    capsys.readouterr()
    rc = cli_main(["generate", "--model-dir", str(model_dir),
                   "--output-dir", str(tmp_path / "w"), "--pitches", "60",
                   ] + flags)
    assert rc == 0
    out = capsys.readouterr().out
    assert "sampling at stage 2" in out


def test_cli_export_ema_and_generate_from_npz(tmp_path):
    """cli export-ema writes the archive; generate/evaluate restore from it
    when no full checkpoint dir is present (the committed-run path)."""
    import os

    from gansynth_tpu.cli import main as cli_main

    state = create_train_state(CFG, seed=0)
    model_dir = tmp_path / "run"
    ckpt = Checkpointer(str(model_dir / "checkpoints"))
    ckpt.save(3, state, wait=True)
    flags = ["--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
             "--config", str(tmp_path / "cfg.json")]
    (tmp_path / "cfg.json").write_text('{"model": {"fmap_min": 8}}')
    assert cli_main(["export-ema", "--model-dir", str(model_dir)] + flags) == 0
    assert (model_dir / "ema.npz").exists()

    # Strip the full checkpoint; generation must fall back to the npz.
    import shutil

    archived = tmp_path / "archived"
    os.makedirs(archived)
    shutil.copy(model_dir / "ema.npz", archived / "ema.npz")
    out = tmp_path / "wavs"
    rc = cli_main([
        "generate", "--model-dir", str(archived), "--output-dir", str(out),
        "--pitches", "60", "--stage", "1",
    ] + flags)
    assert rc == 0
    assert any(p.suffix == ".wav" for p in out.iterdir())


def test_restore_across_device_counts(tmp_path):
    """A checkpoint written from a single-device state restores onto a mesh
    (and the loop re-places it); tree structure is device-layout-free."""
    from gansynth_tpu.parallel import make_mesh, replicated_sharding

    state = create_train_state(CFG, seed=0)
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(5, state, wait=True)
    restored, _ = ckpt.restore(create_train_state(CFG, seed=1))
    mesh = make_mesh()
    placed = jax.device_put(restored, replicated_sharding(mesh))
    assert jax.tree.leaves(placed.g_params)[0].sharding.is_fully_replicated
    assert_states_equal(state, placed)
