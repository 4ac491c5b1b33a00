"""Portable serving artifact (`synth/export.py`): serialized-StableHLO
sampler round trips — audio within specialization noise, symbolic batch,
metadata, and the
`export-model` CLI surface."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gansynth_tpu.cli import main as cli_main
from gansynth_tpu.synth.export import (
    GSX_MAGIC,
    load_sampler_artifact,
    save_sampler_artifact,
)
from gansynth_tpu.synth.sampler import make_seeded_sampler
from gansynth_tpu.train import create_train_state
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=2),
)
STAGE = 2  # 8 x 64 image -> full synthesis tail; fast on CPU


@pytest.fixture(scope="module")
def params():
    return create_train_state(CFG, seed=0).ema_params


@pytest.fixture(scope="module")
def artifact(params, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gsx") / "sampler.gsx")
    save_sampler_artifact(path, CFG, params, step=123, stage=STAGE)
    return path


def test_roundtrip_matches_in_process_sampler(params, artifact):
    """The deserialized program agrees with the in-process sampler to
    1e-3 relative, and is itself deterministic. Agreement is NOT
    bitwise: the AOT-lowered module is a different XLA specialization
    of the same math (measured 3.6e-5 relative here) — the same
    last-bits delta class the DP sampler documents."""
    loaded = load_sampler_artifact(artifact)
    seeds = np.arange(3, dtype=np.int32)
    pitch = np.array([30, 60, 84], np.int32)
    direct = np.asarray(
        make_seeded_sampler(CFG, STAGE)(
            params, jnp.asarray(seeds), jnp.asarray(pitch)
        )
    )
    got = np.asarray(loaded(seeds, pitch))
    assert got.shape == (3, CFG.audio.audio_length)
    scale = max(1.0, float(np.max(np.abs(direct))))
    assert float(np.max(np.abs(direct - got))) <= 1e-3 * scale
    np.testing.assert_array_equal(got, np.asarray(loaded(seeds, pitch)))


def test_symbolic_batch_serves_any_size(artifact):
    """Default export carries a symbolic batch dim: the serving layer's
    coalescing rungs all call ONE artifact."""
    loaded = load_sampler_artifact(artifact)
    for n in (1, 5):
        wave = loaded(
            np.arange(n, dtype=np.int32), np.full((n,), 60, np.int32)
        )
        assert wave.shape == (n, CFG.audio.audio_length)
        assert np.isfinite(np.asarray(wave)).all()


def test_per_note_purity_across_cobatches(artifact):
    """The seeded-sampler serving contract survives export: within one
    batch shape (one XLA specialization), a note's audio is EXACTLY
    independent of batch position and co-batched notes; across batch
    shapes it agrees to specialization noise (~1e-4 relative)."""
    loaded = load_sampler_artifact(artifact)
    a = np.asarray(loaded(
        np.array([3, 7, 11], np.int32), np.array([60, 48, 72], np.int32)
    ))
    b = np.asarray(loaded(
        np.array([7, 5, 9], np.int32), np.array([48, 30, 84], np.int32)
    ))
    np.testing.assert_array_equal(a[1], b[0])
    solo = np.asarray(loaded(np.array([7], np.int32),
                             np.array([48], np.int32)))[0]
    scale = max(1.0, float(np.max(np.abs(a[1]))))
    assert float(np.max(np.abs(solo - a[1]))) <= 1e-3 * scale


def test_metadata_and_config_roundtrip(artifact):
    loaded = load_sampler_artifact(artifact)
    assert loaded.step == 123
    assert loaded.stage == STAGE
    assert loaded.sample_rate == CFG.audio.sample_rate
    assert set(loaded.platforms) == {"cpu", "tpu"}
    assert loaded.meta["batch"] == "symbolic"
    # The full effective config rides in the header for provenance and
    # rebuilds exactly (lists re-tuple through with_overrides) — except
    # synthesis_kernel, which export pins to the portable 'xla' lowering
    # (export.py _portable_config; the default 'auto' would bake a
    # non-serializable Mosaic custom call when traced on a TPU backend).
    got = loaded.config()
    assert got.audio.synthesis_kernel == "xla"
    pinned = dataclasses.replace(
        CFG, audio=dataclasses.replace(CFG.audio, synthesis_kernel="xla")
    )
    assert got == pinned


@pytest.mark.parametrize("kernel", ["auto", "pallas"])
def test_export_pins_portable_synthesis_kernel(params, tmp_path, kernel):
    """Exporting under synthesis_kernel='auto'/'pallas' must produce a
    pure-StableHLO artifact (header says 'xla') that loads and runs —
    on a TPU-backed export process, tracing those kernels unpinned would
    bake a Mosaic tpu_custom_call that cannot lower for 'cpu' and is
    not on jax.export's stable custom-call allowlist."""
    cfg = dataclasses.replace(
        CFG, audio=dataclasses.replace(CFG.audio, synthesis_kernel=kernel)
    )
    path = str(tmp_path / f"{kernel}.gsx")
    save_sampler_artifact(path, cfg, params, step=1, stage=STAGE)
    loaded = load_sampler_artifact(path)
    assert loaded.config().audio.synthesis_kernel == "xla"
    wave = loaded(np.array([0], np.int32), np.array([60], np.int32))
    assert np.isfinite(np.asarray(wave)).all()


def test_static_batch_rejects_other_sizes(params, tmp_path):
    path = str(tmp_path / "static.gsx")
    save_sampler_artifact(path, CFG, params, step=1, stage=STAGE, batch=2)
    loaded = load_sampler_artifact(path)
    assert loaded.meta["batch"] == 2
    wave = loaded(np.arange(2, dtype=np.int32), np.full((2,), 60, np.int32))
    assert wave.shape == (2, CFG.audio.audio_length)
    with pytest.raises(Exception):
        loaded(np.arange(3, dtype=np.int32), np.full((3,), 60, np.int32))


def test_mismatched_seed_pitch_shapes_raise(artifact):
    loaded = load_sampler_artifact(artifact)
    with pytest.raises(ValueError, match="must match"):
        loaded(np.arange(2, dtype=np.int32), np.full((3,), 60, np.int32))
    with pytest.raises(ValueError, match="rank-1"):
        loaded(np.zeros((2, 2), np.int32), np.zeros((2, 2), np.int32))


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.gsx")
    with open(path, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_sampler_artifact(path)


def test_truncated_header_rejected(tmp_path, artifact):
    with open(artifact, "rb") as f:
        blob = f.read()
    path = str(tmp_path / "trunc.gsx")
    with open(path, "wb") as f:
        f.write(GSX_MAGIC + blob[len(GSX_MAGIC):len(GSX_MAGIC) + 2])
    with pytest.raises(ValueError, match="truncated"):
        load_sampler_artifact(path)


def test_corrupt_header_length_fails_fast(tmp_path, artifact):
    """A bit-rotted length field must raise cleanly, not attempt a
    multi-GiB read."""
    import struct

    with open(artifact, "rb") as f:
        blob = f.read()
    path = str(tmp_path / "corrupt.gsx")
    with open(path, "wb") as f:
        f.write(GSX_MAGIC + struct.pack(">I", 0xFFFFFFFF)
                + blob[len(GSX_MAGIC) + 4:])
    with pytest.raises(ValueError, match="exceeds file size"):
        load_sampler_artifact(path)


def test_cli_export_model_check(params, tmp_path):
    """`export-model --check` on an archived run (ema.npz, no full
    checkpoint): writes the .gsx next to the model and verifies the
    round trip itself within the specialization-noise bound (exit 0)."""
    from gansynth_tpu.utils.checkpoint import save_ema_npz

    model_dir = str(tmp_path / "run")
    os.makedirs(model_dir)
    save_ema_npz(
        os.path.join(model_dir, "ema.npz"), params, step=7, stage=STAGE
    )
    with open(os.path.join(model_dir, "train_config.json"), "w") as f:
        json.dump(dataclasses.asdict(CFG), f)
    rc = cli_main(["export-model", "--model-dir", model_dir, "--check"])
    assert rc == 0
    out = os.path.join(model_dir, "sampler.gsx")
    assert os.path.exists(out)
    loaded = load_sampler_artifact(out)
    assert loaded.step == 7 and loaded.stage == STAGE


# ---- format-v2 lifecycle (programs table, latent entry point) ----


def _rewrite_header(src, dst, mutate):
    """Rewrite an artifact's JSON header through ``mutate(meta) -> meta``,
    keeping the program bytes verbatim."""
    import struct

    with open(src, "rb") as f:
        assert f.read(len(GSX_MAGIC)) == GSX_MAGIC
        (hlen,) = struct.unpack(">I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        tail = f.read()
    header = json.dumps(mutate(meta), sort_keys=True).encode("utf-8")
    with open(dst, "wb") as f:
        f.write(GSX_MAGIC + struct.pack(">I", len(header)) + header + tail)
    return dst


def test_future_version_rejected_with_upgrade_hint(tmp_path, artifact):
    """A file from a NEWER package version must fail with a readable
    upgrade hint, never a deserialize crash on bytes this loader cannot
    interpret."""
    path = _rewrite_header(
        artifact, str(tmp_path / "future.gsx"),
        lambda m: {**m, "version": 99},
    )
    with pytest.raises(ValueError, match="newer.*upgrade"):
        load_sampler_artifact(path)


def test_v1_artifact_still_loads(tmp_path, artifact):
    """Round-4 artifacts (version 1: no programs table, seeded program as
    the file tail) keep loading and serving."""
    path = _rewrite_header(
        artifact, str(tmp_path / "v1.gsx"),
        lambda m: {k: v for k, v in m.items() if k != "programs"}
        | {"version": 1},
    )
    loaded = load_sampler_artifact(path)
    assert not loaded.has_latent
    wave = loaded(np.array([3], np.int32), np.array([60], np.int32))
    assert np.isfinite(np.asarray(wave)).all()
    with pytest.raises(ValueError, match="no latent program"):
        loaded.latent(np.zeros((1, CFG.model.latent_dim), np.float32),
                      np.zeros((1, CFG.model.num_pitches), np.float32))


def test_truncated_program_bytes_rejected(tmp_path, artifact):
    with open(artifact, "rb") as f:
        blob = f.read()
    path = str(tmp_path / "cut.gsx")
    with open(path, "wb") as f:
        f.write(blob[:-64])  # drop the seeded program's tail
    with pytest.raises(ValueError, match="truncated"):
        load_sampler_artifact(path)


@pytest.fixture(scope="module")
def latent_artifact(params, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gsx_latent") / "sampler.gsx")
    save_sampler_artifact(
        path, CFG, params, step=123, stage=STAGE, with_latent=True
    )
    return path


def test_latent_program_matches_in_process(params, artifact,
                                           latent_artifact):
    """The shipped latent program renders the same audio as the
    in-process `make_latent_sampler` (shared `_latent_body`), within the
    AOT-specialization noise bound; the seeded program is unaffected."""
    from gansynth_tpu.synth.sampler import make_latent_sampler

    loaded = load_sampler_artifact(latent_artifact)
    assert loaded.has_latent
    rng = np.random.default_rng(0)
    z = rng.normal(size=(3, CFG.model.latent_dim)).astype(np.float32)
    labels = np.zeros((3, CFG.model.num_pitches), np.float32)
    labels[np.arange(3), [0, 10, 20]] = 1.0
    direct, _ = make_latent_sampler(CFG, STAGE)(params, z, labels)
    direct = np.asarray(direct)
    got = np.asarray(loaded.latent(z, labels))
    rel = np.linalg.norm(direct - got) / (np.linalg.norm(direct) + 1e-30)
    assert rel < 1e-3
    # Seeded entry point still present and callable from the same file.
    wave = loaded(np.arange(2, dtype=np.int32), np.full((2,), 60, np.int32))
    assert wave.shape == (2, CFG.audio.audio_length)


def test_latent_shape_validation(latent_artifact):
    loaded = load_sampler_artifact(latent_artifact)
    with pytest.raises(ValueError, match="rank-2"):
        loaded.latent(np.zeros((CFG.model.latent_dim,), np.float32),
                      np.zeros((CFG.model.num_pitches,), np.float32))


def test_with_latent_size_budget(artifact, latent_artifact):
    """Constants are inlined per program, so --with-latent costs about
    one more copy of the weights+matrices — the documented ~2x budget
    (export.py docstring). Pin it is neither free nor runaway."""
    seeded = os.path.getsize(artifact)
    both = os.path.getsize(latent_artifact)
    assert 1.3 * seeded < both < 3.0 * seeded


def test_cli_interpolate_from_exported(latent_artifact, artifact, tmp_path,
                                       capsys):
    out = str(tmp_path / "morph")
    rc = cli_main([
        "interpolate", "--from-exported", latent_artifact,
        "--output-dir", out, "--pitch", "50", "--pitch-b", "70",
        "--steps", "3",
    ])
    assert rc == 0
    wavs = sorted(os.listdir(out))
    assert "morph.wav" in wavs and len(wavs) == 4
    # A seeded-only artifact is a usage error with a re-export hint.
    rc = cli_main([
        "interpolate", "--from-exported", artifact, "--output-dir", out,
    ])
    assert rc == 2
    assert "--with-latent" in capsys.readouterr().err
    # Corrupt artifacts map to exit 2, not a traceback.
    junk = str(tmp_path / "junk.gsx")
    with open(junk, "wb") as f:
        f.write(b"garbage")
    rc = cli_main(["interpolate", "--from-exported", junk,
                   "--output-dir", out])
    assert rc == 2
    # Neither --model-dir nor --from-exported is a usage error.
    assert cli_main(["interpolate", "--output-dir", out]) == 2
