"""Config system tests: derived properties, overrides, CLI --config."""

import dataclasses
import json

import numpy as np
import pytest

from gansynth_tpu.utils.config import AudioConfig, Config, ModelConfig, scale


class TestAudioConfig:
    def test_derived_geometry(self):
        cfg = AudioConfig()
        assert cfg.padded_length == 67072
        assert cfg.pad_left + cfg.pad_right == 3072
        assert cfg.num_rfft_bins == 1025
        assert cfg.overlap_factor == 4

    def test_hashable_and_eq(self):
        assert AudioConfig() == AudioConfig()
        assert hash(AudioConfig()) == hash(AudioConfig())
        assert AudioConfig() != dataclasses.replace(AudioConfig(), frame_step=256)


class TestModelConfig:
    def test_stage_ladder(self):
        cfg = ModelConfig()
        assert cfg.stage_resolution(0) == (2, 16)
        assert cfg.stage_resolution(6) == (128, 1024)
        assert cfg.final_resolution == (128, 1024)
        widths = [cfg.stage_channels(s) for s in range(7)]
        assert widths == [256, 256, 256, 256, 256, 128, 64]
        assert all(w >= cfg.fmap_min for w in widths)


class TestOverrides:
    def test_with_overrides(self):
        cfg = Config().with_overrides(
            {"model": {"latent_dim": 12}, "train": {"batch_size": 3},
             "audio": {"idft_mode": "fft"}}
        )
        assert cfg.model.latent_dim == 12
        assert cfg.train.batch_size == 3
        assert cfg.audio.idft_mode == "fft"
        # untouched fields keep defaults
        assert cfg.model.num_pitches == 61

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown model config keys"):
            Config().with_overrides({"model": {"latnet_dim": 1}})
        with pytest.raises(ValueError, match="unknown config section"):
            Config().with_overrides({"models": {}})

    def test_cli_config_file(self, tmp_path, capsys):
        from gansynth_tpu.cli import main as cli_main

        path = tmp_path / "c.json"
        path.write_text(json.dumps({"model": {"latnet_dim": 8}}))
        with pytest.raises(ValueError, match="unknown model config keys"):
            cli_main(["train", "--model-dir", str(tmp_path / "m"),
                      "--synthetic", "--num-steps", "1",
                      "--config", str(path)])


def test_dump_config_roundtrips_through_config_flag(tmp_path, capsys):
    """--dump-config prints the EFFECTIVE config as JSON that --config
    accepts back unchanged (reproducibility contract)."""
    from gansynth_tpu.cli import main as cli_main

    with pytest.raises(SystemExit) as exc:
        cli_main(["train", "--model-dir", str(tmp_path / "m"), "--synthetic",
                  "--batch-size", "4", "--compute-dtype", "bfloat16",
                  "--dump-config"])
    assert exc.value.code == 0
    dumped = capsys.readouterr().out
    parsed = json.loads(dumped)
    assert parsed["train"]["batch_size"] == 4
    assert parsed["model"]["compute_dtype"] == "bfloat16"
    cfg = Config().with_overrides(parsed)
    assert cfg.train.batch_size == 4
    assert cfg.model.compute_dtype == "bfloat16"
    # tuple fields serialize as JSON lists; compare in JSON space
    assert json.loads(json.dumps(dataclasses.asdict(cfg))) == parsed


def test_scale_roundtrip():
    x = np.linspace(-5, 5, 11)
    np.testing.assert_allclose(
        scale(scale(x, -5, 5, -1, 1), -1, 1, -5, 5), x, atol=1e-12
    )
