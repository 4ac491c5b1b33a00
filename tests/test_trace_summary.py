"""Tests for scripts/trace_summary.py (per-op xplane summarizer).

Builds a synthetic XSpace protobuf — one device plane, one host plane —
with known event durations, writes it as `*.xplane.pb` the way
`jax.profiler.trace` lays traces out, and checks:

- device-plane filtering (host events excluded when device planes exist),
- the `name.N` / `name_N` suffix folding that aggregates XLA's
  per-instance fusion labels,
- the all-planes fallback for CPU-backend traces (no device plane).
"""

import importlib.util
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "trace_summary", ROOT / "scripts" / "trace_summary.py"
)
trace_summary = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(trace_summary)

xplane_pb2 = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2"
)


def _plane(space, name, events):
    """Add a plane with {op_name: [durations_ps]} events."""
    plane = space.planes.add()
    plane.name = name
    line = plane.lines.add()
    for i, (op, durs) in enumerate(events.items(), start=1):
        plane.event_metadata[i].id = i
        plane.event_metadata[i].name = op
        for d in durs:
            ev = line.events.add()
            ev.metadata_id = i
            ev.duration_ps = d
    return plane


def _write(tmp_path, space, name="host0.xplane.pb"):
    sub = tmp_path / "plugins" / "profile" / "run1"
    sub.mkdir(parents=True, exist_ok=True)
    (sub / name).write_bytes(space.SerializeToString())


def test_fold_name():
    assert trace_summary.fold_name("fusion.3") == "fusion"
    assert trace_summary.fold_name("fusion_12") == "fusion"
    assert trace_summary.fold_name("fusion.3_2") == "fusion"
    assert trace_summary.fold_name("conv2d") == "conv2d"


def test_device_plane_filtering_and_aggregation(tmp_path, capsys):
    space = xplane_pb2.XSpace()
    _plane(space, "/device:TPU:0", {
        "fusion.1": [1_000_000, 2_000_000],
        "fusion.2": [3_000_000],
        "conv_general_dilated": [10_000_000],
    })
    _plane(space, "Host Threads", {"np.asarray": [99_000_000_000]})
    _write(tmp_path, space)

    assert trace_summary.summarize(str(tmp_path), top=10) == 0
    out = capsys.readouterr().out
    # host plane excluded: the 99 ms host event must not appear
    assert "np.asarray" not in out
    # fusion.1 + fusion.2 folded into one 6 us line
    assert "fusion" in out and "conv_general_dilated" in out
    lines = [l for l in out.splitlines() if l.startswith("fusion")]
    assert len(lines) == 1
    assert "0.006" in lines[0]


def test_all_planes_fallback_without_device_plane(tmp_path, capsys):
    space = xplane_pb2.XSpace()
    _plane(space, "/host:CPU", {"thunk": [5_000_000]})
    _write(tmp_path, space)

    assert trace_summary.summarize(str(tmp_path), top=10) == 0
    out = capsys.readouterr().out
    assert "thunk" in out


def test_empty_dir_errors(tmp_path):
    assert trace_summary.summarize(str(tmp_path), top=10) == 1
