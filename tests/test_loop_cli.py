"""Integration smoke (SURVEY.md §4 item 5, driver config 4 in miniature):
the training loop end-to-end on synthetic fixtures — progressive schedule,
checkpointing, resume, metric logging — and the CLI surface."""

import json
import os

import numpy as np
import pytest

import jax

from gansynth_tpu.cli import main as cli_main
from gansynth_tpu.data import make_nsynth_iterator, write_synthetic_tfrecords
from gansynth_tpu.train.loop import train
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

pytest.importorskip("tensorflow")

TINY = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(
        batch_size=4,
        fade_steps=3,
        stable_steps=3,
        checkpoint_every=4,
        log_every=2,
    ),
)


@pytest.fixture(scope="module")
def tfrecord(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "notes.tfrecord"
    return write_synthetic_tfrecords(str(path), num_examples=16, seed=0)


def data_iter(tfrecord, batch=4):
    return make_nsynth_iterator(
        [tfrecord], TINY, batch_size=batch, acoustic_only=False, seed=0
    )


class TestLoop:
    def test_loop_crosses_stage_boundary(self, tfrecord, tmp_path):
        workdir = str(tmp_path / "run")
        # 8 steps: stage 0 for 3, then stage 1 fade (3) + stabilize start
        state = train(
            TINY, data_iter(tfrecord), num_steps=8, workdir=workdir
        )
        assert int(state.step) == 8
        # metrics were logged
        lines = open(os.path.join(workdir, "metrics.jsonl")).read().splitlines()
        records = [json.loads(l) for l in lines]
        assert any(r["stage"] == 1 for r in records)
        assert all(np.isfinite(r["d_loss"]) for r in records)
        assert "steps_per_sec" in records[-1]
        # checkpoints exist
        assert os.path.isdir(os.path.join(workdir, "checkpoints"))

    def test_loop_resumes_from_checkpoint(self, tfrecord, tmp_path):
        workdir = str(tmp_path / "resume")
        train(TINY, data_iter(tfrecord), num_steps=4, workdir=workdir)
        # fresh call restores step 4 and continues
        state = train(TINY, data_iter(tfrecord), num_steps=2, workdir=workdir)
        assert int(state.step) == 6

    def test_resume_replays_data_stream(self, tfrecord, tmp_path):
        """SURVEY.md §5 checkpoint row (data-iterator state): a resumed
        run must see the SAME batch stream as the uninterrupted run — not
        the stream head. The loop fast-forwards a fresh iterator to the
        restored step (position == batch count == step)."""
        losses_full = []
        train(
            TINY, data_iter(tfrecord), num_steps=6,
            workdir=str(tmp_path / "full"),
            on_metrics=lambda s, st, m: losses_full.append(
                float(np.asarray(m["d_loss"]))
            ),
        )

        workdir = str(tmp_path / "interrupted")
        train(TINY, data_iter(tfrecord), num_steps=3, workdir=workdir)
        losses_resumed = []
        train(
            TINY, data_iter(tfrecord), num_steps=3, workdir=workdir,
            on_metrics=lambda s, st, m: losses_resumed.append(
                float(np.asarray(m["d_loss"]))
            ),
        )
        np.testing.assert_allclose(
            losses_resumed, losses_full[3:], rtol=1e-6,
            err_msg="resumed stream != uninterrupted stream",
        )

        # ... and the stream-head replay (the pre-fix behavior, simulated
        # by claiming the fresh iterator is already positioned) diverges.
        workdir2 = str(tmp_path / "head")
        train(TINY, data_iter(tfrecord), num_steps=3, workdir=workdir2)
        losses_head = []
        train(
            TINY, data_iter(tfrecord), num_steps=3, workdir=workdir2,
            data_position=3,
            on_metrics=lambda s, st, m: losses_head.append(
                float(np.asarray(m["d_loss"]))
            ),
        )
        assert not np.allclose(losses_head, losses_full[3:], rtol=1e-6)

    def test_loop_dumps_audio_samples(self, tfrecord, tmp_path):
        import dataclasses

        cfg = dataclasses.replace(
            TINY,
            train=dataclasses.replace(
                TINY.train, sample_every=2, sample_pitches=(40, 70)
            ),
        )
        workdir = str(tmp_path / "dump")
        train(cfg, data_iter(tfrecord), num_steps=2, workdir=workdir)
        wavs = sorted(os.listdir(os.path.join(workdir, "samples")))
        assert wavs == ["step00000002_pitch40.wav", "step00000002_pitch70.wav"]
        from gansynth_tpu.utils.audio_io import read_wav

        audio, sr = read_wav(os.path.join(workdir, "samples", wavs[0]))
        assert sr == 16000 and audio.shape == (64000,)
        # TensorBoard audio/image summaries were written alongside
        tb_files = []
        for root, _, files in os.walk(os.path.join(workdir, "tb")):
            tb_files.extend(f for f in files if "tfevents" in f)
        assert tb_files

    def test_smoke_training_learns_pitch(self, tfrecord):
        """Integration smoke (SURVEY.md §4 item 5): a short run on the
        synthetic fixtures must show learning — the discriminator's
        auxiliary pitch head is a supervised task, so its cross-entropy
        falls reliably even while the adversarial losses oscillate."""
        import dataclasses

        cfg = dataclasses.replace(
            TINY,
            train=dataclasses.replace(
                TINY.train, fade_steps=1000, stable_steps=1000
            ),  # stay at stage 0 for the whole smoke
        )
        ces = []
        train(
            cfg,
            data_iter(tfrecord, batch=8),
            num_steps=100,
            on_metrics=lambda step, stage, m: ces.append(
                float(m["d_pitch_ce"])
            ),
        )
        assert len(ces) == 100
        assert all(np.isfinite(ces))
        early = np.mean(ces[:10])
        late = np.mean(ces[-10:])
        # measured trajectory at this config: ~4.01 -> ~3.6 over 100 steps,
        # monotonic; require a clear fraction of that
        assert late < early - 0.15, (early, late)

    def test_per_stage_batches_via_factory(self, tfrecord, tmp_path):
        """stage_batch_sizes drives per-stage streams: the loop asks the
        factory for (stage, that stage's batch, steps-into-stage), and a
        resumed run replays the identical trajectory."""
        import dataclasses

        cfg = dataclasses.replace(
            TINY,
            train=dataclasses.replace(
                TINY.train, stage_batch_sizes=(8, 2, 2, 2, 2, 2, 2)
            ),
        )
        calls = []

        def factory(stage, batch, skip):
            calls.append((stage, batch, skip))
            return make_nsynth_iterator(
                [tfrecord], cfg, batch_size=batch, acoustic_only=False,
                seed=100 + stage, skip_batches=skip,
            )

        losses_full = []
        train(
            cfg, None, num_steps=6, data_factory=factory,
            workdir=str(tmp_path / "full"),
            on_metrics=lambda s, st, m: losses_full.append(
                float(np.asarray(m["d_loss"]))
            ),
        )
        # stage 0 entered fresh (batch 8), stage 1 entered at its start
        assert calls == [(0, 8, 0), (1, 2, 0)]

        calls.clear()
        workdir = str(tmp_path / "interrupted")
        train(cfg, None, num_steps=4, data_factory=factory, workdir=workdir)
        losses_resumed = []
        train(
            cfg, None, num_steps=2, data_factory=factory, workdir=workdir,
            on_metrics=lambda s, st, m: losses_resumed.append(
                float(np.asarray(m["d_loss"]))
            ),
        )
        # the resumed run re-enters stage 1 one step in
        assert calls[-1] == (1, 2, 1)
        np.testing.assert_allclose(
            losses_resumed, losses_full[4:], rtol=1e-6,
            err_msg="resumed per-stage stream != uninterrupted stream",
        )

    def test_stage_batches_need_factory(self, tfrecord):
        import dataclasses

        cfg = dataclasses.replace(
            TINY,
            train=dataclasses.replace(
                TINY.train, stage_batch_sizes=(4,) * 7
            ),
        )
        with pytest.raises(ValueError, match="stage_batch_sizes"):
            train(cfg, data_iter(tfrecord), num_steps=1)

    def test_loop_on_mesh(self, tfrecord):
        state = train(TINY, data_iter(tfrecord, batch=8), num_steps=2,
                      use_mesh=True)
        assert int(state.step) == 2
        assert jax.tree.leaves(state.g_params)[0].sharding.is_fully_replicated


class TestCLI:
    def test_fixtures_and_roundtrip(self, tmp_path, capsys):
        out = str(tmp_path / "fx.tfrecord")
        assert cli_main(["fixtures", "--output", out, "--num-examples", "4"]) == 0
        assert os.path.exists(out)
        rc = cli_main(["roundtrip", "--pitch", "60",
                       "--output", str(tmp_path / "rt.wav")])
        assert rc == 0
        captured = capsys.readouterr().out
        assert "SNR" in captured
        assert os.path.exists(tmp_path / "rt.wav")

    def test_train_then_generate(self, tfrecord, tmp_path, capsys):
        model_dir = str(tmp_path / "m")
        rc = cli_main([
            "train", "--model-dir", model_dir, "--data", tfrecord,
            "--synthetic", "--num-steps", "2", "--batch-size", "2",
            "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
            "--fade-steps", "3", "--stable-steps", "3",
            "--checkpoint-every", "2", "--log-every", "1",
        ])
        assert rc == 0
        out_dir = str(tmp_path / "wavs")
        rc = cli_main([
            "generate", "--model-dir", model_dir, "--output-dir", out_dir,
            "--pitches", "48", "72", "--latent-dim", "8",
            "--fmap-base", "64", "--fmap-max", "16",
        ])
        assert rc == 0
        wavs = sorted(os.listdir(out_dir))
        assert wavs == ["sample_0_pitch48.wav", "sample_0_pitch72.wav"]

    def test_train_requires_data(self, tmp_path, capsys):
        rc = cli_main(["train", "--model-dir", str(tmp_path / "x")])
        assert rc == 2

    def test_generate_restores_model_flags_from_run(self, tfrecord,
                                                    tmp_path, capsys):
        """A run trained with non-default model flags restores for
        generate WITHOUT repeating them — the persisted train_config.json
        is the restore template (round-2 advisor finding)."""
        model_dir = str(tmp_path / "m2")
        rc = cli_main([
            "train", "--model-dir", model_dir, "--data", tfrecord,
            "--synthetic", "--num-steps", "2", "--batch-size", "2",
            "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
            "--fade-steps", "3", "--stable-steps", "3",
            "--checkpoint-every", "2", "--log-every", "1",
        ])
        assert rc == 0
        out_dir = str(tmp_path / "wavs2")
        # no --latent-dim/--fmap-* here: they come from train_config.json
        rc = cli_main([
            "generate", "--model-dir", model_dir, "--output-dir", out_dir,
            "--pitches", "60",
        ])
        assert rc == 0
        assert sorted(os.listdir(out_dir)) == ["sample_0_pitch60.wav"]

    def test_cli_stage_batch_sizes(self, tfrecord, tmp_path):
        model_dir = str(tmp_path / "sbs")
        rc = cli_main([
            "train", "--model-dir", model_dir, "--data", tfrecord,
            "--synthetic", "--num-steps", "4", "--batch-size", "2",
            "--stage-batch-sizes", "4,2,2,2,2,2,2",
            "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
            "--fade-steps", "3", "--stable-steps", "3",
            "--checkpoint-every", "4", "--log-every", "1",
        ])
        assert rc == 0
        cfg = json.load(open(os.path.join(model_dir, "train_config.json")))
        assert cfg["train"]["stage_batch_sizes"] == [4, 2, 2, 2, 2, 2, 2]
