"""Real-data validation gate (`cli validate-data`, VERDICT-r4 item 7).

No real NSynth data exists on this machine, so the gate itself must be
proven on fixtures: a clean file passes every check, a malformed file
fails the schema check with a readable problem list, a file the training
filters would empty fails loudly, and the CLI maps these to exit codes.
"""

import json

import numpy as np
import pytest

from gansynth_tpu.cli import main as cli_main
from gansynth_tpu.data import write_synthetic_tfrecords
from gansynth_tpu.data.validate import validate_data

pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def tfrecord(tmp_path_factory):
    path = tmp_path_factory.mktemp("validate") / "notes.tfrecord"
    return write_synthetic_tfrecords(
        str(path), num_examples=24, pitches=range(24, 85, 3), seed=0
    )


def _write_records(path, records):
    import tensorflow as tf

    def int_feat(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(value=v))

    with tf.io.TFRecordWriter(str(path)) as w:
        for audio, pitch, source in records:
            feat = {
                "audio": tf.train.Feature(
                    float_list=tf.train.FloatList(value=audio.tolist())
                ),
                "pitch": int_feat([pitch]),
                "velocity": int_feat([100]),
                "instrument_family": int_feat([3]),
                "instrument_source": int_feat([source]),
                "qualities": int_feat([0] * 10),
            }
            w.write(
                tf.train.Example(
                    features=tf.train.Features(feature=feat)
                ).SerializeToString()
            )
    return str(path)


class TestGate:
    def test_clean_fixture_passes(self, tfrecord):
        report = validate_data(
            [tfrecord], max_examples=24, throughput_seconds=0.5,
            run_train_check=False,
        )
        assert report["ok"] is True
        assert report["schema_ok"] and not report["schema_problems"]
        assert report["examples_scanned"] == 24
        # Fixtures are all acoustic + in [24, 84]: nothing filtered.
        assert report["trainable_acoustic_in_range"] == 24
        assert report["decode_ok"]
        assert report["decode_headroom_vs_chip"] > 1
        # Distributions are populated and consistent with the scan.
        assert sum(report["pitch_histogram"].values()) == 24
        assert set(report["source_histogram"]) == {"0"}
        json.dumps(report)  # the report must be JSON-serializable

    def test_full_gate_runs_superstep_and_roundtrip(self, tfrecord):
        report = validate_data(
            [tfrecord], max_examples=8, throughput_seconds=0.2,
            train_stage=2, run_train_check=True,
        )
        assert report["ok"] is True, report.get("train_check_error")
        assert report["train_check_ok"]
        assert report["train_params_moved"]
        assert np.isfinite(report["train_d_loss"])
        # Fixture notes are harmonic stacks: the mel-IF roundtrip keeps
        # them well above the noise floor.
        assert report["roundtrip_snr_db_median"] > 5.0

    def test_short_audio_fails_schema(self, tmp_path, tfrecord):
        bad = _write_records(
            tmp_path / "short.tfrecord",
            [(np.zeros(100, np.float32), 60, 0)],
        )
        report = validate_data(
            [bad], max_examples=4, throughput_seconds=0.2,
            run_train_check=False,
        )
        assert report["ok"] is False
        assert not report["schema_ok"]
        assert any("audio length" in p for p in report["schema_problems"])

    def test_non_finite_audio_fails_schema(self, tmp_path):
        audio = np.zeros(64000, np.float32)
        audio[7] = np.nan
        bad = _write_records(tmp_path / "nan.tfrecord", [(audio, 60, 0)])
        report = validate_data(
            [bad], max_examples=4, throughput_seconds=0.2,
            run_train_check=False,
        )
        assert report["ok"] is False
        assert any("non-finite" in p for p in report["schema_problems"])

    def test_zero_trainable_examples_fails(self, tmp_path):
        """A file the acoustic+pitch filters would empty must fail the
        gate even when every record is schema-clean (source=1 is
        electronic; training would silently see no data)."""
        audio = np.zeros(64000, np.float32)
        bad = _write_records(
            tmp_path / "electronic.tfrecord",
            [(audio, 60, 1), (audio, 70, 1)],
        )
        report = validate_data(
            [bad], max_examples=4, throughput_seconds=0.2,
            run_train_check=False,
        )
        assert report["schema_ok"]  # records themselves are fine
        assert report["trainable_acoustic_in_range"] == 0
        assert "warning" in report
        assert report["ok"] is False

    def test_decode_error_reported_not_raised(self, tmp_path):
        """A file tf.data's batch pipeline rejects mid-iteration surfaces
        as decode_ok=False with the exception text, not a crashed gate."""
        bad = _write_records(
            tmp_path / "mixed.tfrecord",
            [(np.zeros(100, np.float32), 60, 0)],
        )
        report = validate_data(
            [bad], max_examples=4, throughput_seconds=0.2,
            run_train_check=False,
        )
        assert report["ok"] is False
        assert not report["decode_ok"] or not report["schema_ok"]


class TestCLI:
    def test_missing_file_exits_2(self, capsys):
        rc = cli_main(["validate-data", "--data", "/nonexistent.tfrecord"])
        assert rc == 2
        assert "no such file" in capsys.readouterr().err

    def test_ok_file_exits_0_and_prints_report(self, tfrecord, tmp_path,
                                                capsys):
        out = tmp_path / "report.json"
        rc = cli_main([
            "validate-data", "--data", tfrecord, "--max-examples", "24",
            "--throughput-seconds", "0.2", "--skip-train-check",
            "--output", str(out),
        ])
        captured = capsys.readouterr()
        assert rc == 0
        assert "validate-data: OK" in captured.out
        report = json.loads(out.read_text())
        assert report["ok"] is True
        # --skip-train-check really skips the device compile.
        assert "train_check_ok" not in report

    def test_failing_file_exits_1(self, tmp_path, capsys):
        bad = _write_records(
            tmp_path / "short.tfrecord",
            [(np.zeros(100, np.float32), 60, 0)],
        )
        rc = cli_main([
            "validate-data", "--data", bad, "--throughput-seconds", "0.2",
            "--skip-train-check",
        ])
        assert rc == 1
        assert "FAILED" in capsys.readouterr().err
