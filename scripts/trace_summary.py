"""Per-op summary of a jax.profiler trace (VERDICT-r4 item 2: the §2c
per-op table was round-2 vintage; this makes regenerating it a command).

Parses the xplane protobuf the profiler writes (no TensorBoard needed),
sums event durations per op name on the DEVICE planes, folds XLA's
``name.N`` / ``name_N`` duplication suffixes, and prints the top sinks
with their share of total device time. The op names are XLA fusion
labels — read them together with the component timings from
scripts/profile_train_step.py (which writes the trace this consumes).

    python scripts/profile_train_step.py --trace-dir /tmp/gansynth_trace
    python scripts/trace_summary.py /tmp/gansynth_trace --top 30
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xspaces(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True)
    )
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


_SUFFIX = re.compile(r"[._]\d+$")


def fold_name(name: str) -> str:
    """Fold XLA's per-instance suffixes so repeated fusions aggregate."""
    out = _SUFFIX.sub("", name)
    return _SUFFIX.sub("", out)  # name.3_2 -> name


def summarize(trace_dir, top=30, device_only=True):
    spaces = load_xspaces(trace_dir)
    if not spaces:
        print(f"no *.xplane.pb under {trace_dir}", file=sys.stderr)
        return 1
    totals = collections.Counter()
    plane_names = []
    for _, xs in spaces:
        for plane in xs.planes:
            is_device = (
                "TPU" in plane.name or "GPU" in plane.name
                or "/device:" in plane.name
            ) and "Host" not in plane.name
            if device_only and not is_device:
                continue
            plane_names.append(plane.name)
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[fold_name(name)] += ev.duration_ps
    if not totals:
        # Fall back to every plane (CPU-backend traces name planes
        # differently) so the tool still answers on test traces.
        return summarize(trace_dir, top=top, device_only=False) \
            if device_only else 1
    grand = sum(totals.values())
    print(f"planes: {sorted(set(plane_names))}")
    print(f"total device time {grand / 1e12 * 1e3:.2f} ms "
          f"(sum over {len(totals)} folded op names)\n")
    print(f"{'op (folded)':60s} {'ms':>9s} {'share':>7s}")
    for name, ps in totals.most_common(top):
        print(f"{name[:60]:60s} {ps / 1e12 * 1e3:9.3f} {ps / grand:7.1%}")
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()
    return summarize(args.trace_dir, top=args.top)


if __name__ == "__main__":
    sys.exit(main())
