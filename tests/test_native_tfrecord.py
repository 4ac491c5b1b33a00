"""Native C++ TFRecord reader: exact equivalence with the tf.data path,
CRC corruption detection, and pipeline semantics."""

import numpy as np
import pytest

from gansynth_tpu.data import make_nsynth_iterator, write_synthetic_tfrecords
from gansynth_tpu.data.native_tfrecord import (
    NativeTFRecordError,
    make_native_iterator,
    read_examples,
)
from gansynth_tpu.utils.config import Config, TrainConfig

pytest.importorskip("tensorflow")  # fixtures are written with TF

CFG = Config(train=TrainConfig(batch_size=4))


@pytest.fixture(scope="module")
def tfrecord(tmp_path_factory):
    path = tmp_path_factory.mktemp("native") / "notes.tfrecord"
    return write_synthetic_tfrecords(
        str(path), num_examples=24, pitches=range(20, 90, 3), seed=0
    )


class TestRawReader:
    def test_matches_tf_parse_exactly(self, tfrecord):
        """Full D1 schema round-trip: every field the reference parser
        declares comes back byte-equal through BOTH readers."""
        from gansynth_tpu.data.nsynth import make_nsynth_example_iterator

        native = list(read_examples(tfrecord))
        assert len(native) == 24
        tf_side = list(make_nsynth_example_iterator([tfrecord], CFG))
        assert len(tf_side) == 24
        for ex, nat in zip(tf_side, native):
            np.testing.assert_array_equal(ex["audio"], nat.audio)
            assert int(ex["pitch"]) == nat.pitch
            assert int(ex["velocity"]) == nat.velocity
            assert int(ex["instrument_family"]) == nat.instrument_family
            assert int(ex["instrument_source"]) == nat.instrument_source
            np.testing.assert_array_equal(ex["qualities"], nat.qualities)
        # Fixtures write non-degenerate metadata — the equality above must
        # not be vacuous.
        assert len({n.velocity for n in native}) > 1
        assert len({n.instrument_family for n in native}) > 1
        assert any(n.qualities.any() for n in native)
        assert all(n.qualities.shape == (10,) for n in native)

    def test_absent_metadata_reads_minus_one(self, tmp_path):
        """Records missing the metadata Int64Lists parse with -1 scalars
        and empty qualities (matches tf.io defaults in _feature_spec)."""
        import tensorflow as tf

        path = tmp_path / "minimal.tfrecord"
        audio = np.linspace(-1, 1, 100, dtype=np.float32)
        feat = {
            "audio": tf.train.Feature(
                float_list=tf.train.FloatList(value=audio.tolist())
            ),
            "pitch": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[60])
            ),
        }
        with tf.io.TFRecordWriter(str(path)) as w:
            w.write(
                tf.train.Example(
                    features=tf.train.Features(feature=feat)
                ).SerializeToString()
            )
        (ex,) = list(read_examples(str(path), audio_length=100))
        assert ex.pitch == 60
        assert ex.velocity == -1
        assert ex.instrument_family == -1
        assert ex.instrument_source == -1
        assert ex.qualities.size == 0
        np.testing.assert_array_equal(ex.audio, audio)

    def test_crc_corruption_detected(self, tfrecord, tmp_path):
        data = bytearray(open(tfrecord, "rb").read())
        data[200] ^= 0xFF  # flip a payload byte
        bad = tmp_path / "corrupt.tfrecord"
        bad.write_bytes(bytes(data))
        with pytest.raises(NativeTFRecordError, match="CRC"):
            list(read_examples(str(bad)))
        # without verification the corruption passes through (or fails
        # parse) — exercise the flag
        try:
            list(read_examples(str(bad), verify_crc=False))
        except NativeTFRecordError:
            pass

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            list(read_examples("/nonexistent/x.tfrecord"))

    @staticmethod
    def _frame_record(payload: bytes) -> bytes:
        """TFRecord framing with garbage CRCs (read with verify_crc=False)."""
        import struct

        return (
            struct.pack("<Q", len(payload)) + b"\x00\x00\x00\x00"
            + payload + b"\x00\x00\x00\x00"
        )

    @staticmethod
    def _ld(field: int, payload: bytes) -> bytes:
        """Length-delimited protobuf field."""
        out = bytes([(field << 3) | 2])
        n = len(payload)
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out + payload

    def test_oversized_length_varint_is_error_not_oob(self, tmp_path):
        """A sub-message length varint pointing past the buffer must fail
        parsing cleanly (the cursor clamps; no out-of-bounds read) — the
        exact shape reachable with valid CRCs or verify_crc=0."""
        # Example.features(1) claims a huge length with few bytes behind it.
        evil = bytes([0x0A, 0xFF, 0xFF, 0xFF, 0xFF, 0x7F]) + b"\x00" * 8
        path = tmp_path / "evil.tfrecord"
        path.write_bytes(self._frame_record(evil))
        with pytest.raises(NativeTFRecordError, match="malformed"):
            list(read_examples(str(path), verify_crc=False))

    def test_oversized_packed_floats_is_error_not_oob(self, tmp_path):
        """Same attack one level deeper: the packed-floats list inside
        features.audio overruns its framing."""
        floatlist = bytes([0x0A, 0xFF, 0xFF, 0xFF, 0x7F]) + b"\x00" * 8
        feature = self._ld(2, floatlist)            # Feature.float_list
        entry = self._ld(1, b"audio") + self._ld(2, feature)
        example = self._ld(1, self._ld(1, entry))   # Example.features.map
        path = tmp_path / "evil2.tfrecord"
        path.write_bytes(self._frame_record(example))
        with pytest.raises(NativeTFRecordError, match="malformed"):
            list(read_examples(str(path), verify_crc=False))


class TestNativePipeline:
    def test_matches_tf_pipeline_unshuffled(self, tfrecord):
        tf_batches = list(
            make_nsynth_iterator(
                [tfrecord], CFG, shuffle=False, repeat=False, acoustic_only=True
            )
        )
        native_batches = list(
            make_native_iterator(
                [tfrecord], CFG, shuffle=False, repeat=False, acoustic_only=True
            )
        )
        assert len(tf_batches) == len(native_batches) > 0
        for (wa, pa), (wb, pb) in zip(tf_batches, native_batches):
            np.testing.assert_array_equal(wa, wb)
            np.testing.assert_array_equal(pa, pb)

    def test_family_filter_matches_tf(self, tfrecord):
        """instrument_family filtering: both pipelines keep the same
        examples, and only families in the allow-set survive."""
        from gansynth_tpu.data.nsynth import make_nsynth_example_iterator

        fams = (0, 3, 7)
        kwargs = dict(
            shuffle=False, repeat=False, acoustic_only=True, families=fams
        )
        tf_batches = list(
            make_nsynth_iterator([tfrecord], CFG, batch_size=1, **kwargs)
        )
        native_batches = list(
            make_native_iterator([tfrecord], CFG, batch_size=1, **kwargs)
        )
        assert len(tf_batches) == len(native_batches) > 0
        for (wa, pa), (wb, pb) in zip(tf_batches, native_batches):
            np.testing.assert_array_equal(wa, wb)
            np.testing.assert_array_equal(pa, pb)
        # Cross-check the kept set against the raw schema stream.
        lo, hi = CFG.model.pitch_min, CFG.model.pitch_max
        expect = [
            int(ex["pitch"])
            for ex in make_nsynth_example_iterator([tfrecord], CFG)
            if int(ex["instrument_family"]) in fams
            and int(ex["instrument_source"]) == 0
            and lo <= int(ex["pitch"]) <= hi
        ]
        got = [int(p[0]) for _, p in tf_batches]
        assert got == expect

    def test_partial_final_batch_kept(self, tfrecord):
        """drop_remainder=False (the --device-cache fill contract): both
        pipelines keep the tail examples in a final short batch."""
        total = sum(
            1 for i, p in enumerate(range(20, 90, 3)) if 24 <= p <= 84
        )
        assert total % 8 != 0  # the fixture really has a partial tail
        kwargs = dict(
            batch_size=8, shuffle=False, repeat=False,
            acoustic_only=True, drop_remainder=False,
        )
        for make in (make_nsynth_iterator, make_native_iterator):
            batches = list(make([tfrecord], CFG, **kwargs))
            sizes = [len(p) for _, p in batches]
            assert sum(sizes) == total
            assert sizes[-1] == total % 8
            assert all(s == 8 for s in sizes[:-1])

    def test_pitch_filter_and_shuffle(self, tfrecord):
        it = make_native_iterator(
            [tfrecord], CFG, shuffle=True, repeat=True, shuffle_buffer=8, seed=1
        )
        seen = np.concatenate([next(it)[1] for _ in range(6)])
        assert (seen >= 24).all() and (seen <= 84).all()

    def test_sharding_partitions(self, tfrecord):
        all_pitches = []
        for shard in range(2):
            it = make_native_iterator(
                [tfrecord], CFG, batch_size=1, shuffle=False, repeat=False,
                num_shards=2, shard_index=shard,
            )
            all_pitches.append(np.concatenate([p for _, p in it]))
        merged = sorted(np.concatenate(all_pitches).tolist())
        single = sorted(
            np.concatenate([
                p for _, p in make_native_iterator(
                    [tfrecord], CFG, batch_size=1, shuffle=False, repeat=False
                )
            ]).tolist()
        )
        assert merged == single
