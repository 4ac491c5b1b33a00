"""Training watchdog: stall detection + restart-from-checkpoint
(SURVEY.md §5 failure-detection row).

The observed failure mode on this hardware is a wedged device dispatch —
the training process stops completing steps but never exits (one real
instance: the round-2 fidelity run hung at step 333.5k and had to be
noticed by a human). The loop cannot save itself from inside: the Python
thread is blocked in a C++ device call. Recovery must be process-level —
exactly what the framework's resume contract is built for (checkpoints
restore `(state, stage, alpha, data position)` bitwise, so a kill +
restart replays the lost tail and continues).

:class:`Supervisor` runs ``python -m gansynth_tpu.cli train ...`` as a
child process and watches the run's ``metrics.jsonl`` as a heartbeat
(the loop appends to it every ``log_every`` steps, synchronized through
a fetched device scalar — so file growth proves steps are COMPLETING on
device, not merely being dispatched). Checkpoint-directory activity
counts as a heartbeat too: a durable orbax save can take many seconds
(during which metrics are silent but the run is demonstrably alive) and
the final save happens AFTER the last metrics line — without this
signal a slow-host run could be killed while committing its result.
When every heartbeat goes stale — no change for ``max(min_stall_s,
stall_factor × median recent interval)`` — the child is killed and
restarted from the latest checkpoint, up to ``max_restarts`` times.
Compile phases (startup, first entry into each stage) emit no
heartbeat, so the pre-first-heartbeat window uses the larger
``startup_grace_s``; stage-boundary recompiles must fit inside
``min_stall_s`` (warm persistent-cache compiles do).

Fault injection for tests: ``GANSYNTH_TRAIN_STALL="<step>:<flagfile>"``
makes the training loop hang once it reaches ``<step>`` unless
``<flagfile>`` exists (it is created on the way into the hang), so a
supervised restart proceeds past it — simulating a transient wedge.
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time
from typing import Callable, Optional, Sequence


class Supervisor:
    """Watchdog wrapper around the ``train`` CLI subcommand."""

    def __init__(
        self,
        train_argv: Sequence[str],
        model_dir: str,
        *,
        min_stall_s: float = 300.0,
        stall_factor: float = 8.0,
        startup_grace_s: float = 1800.0,
        max_restarts: int = 3,
        poll_s: float = 0.5,
        log: Callable[[str], None] = print,
        child_env: Optional[dict] = None,
    ):
        self.train_argv = list(train_argv)
        self.model_dir = model_dir
        self.min_stall_s = float(min_stall_s)
        self.stall_factor = float(stall_factor)
        self.startup_grace_s = float(startup_grace_s)
        self.max_restarts = int(max_restarts)
        self.poll_s = float(poll_s)
        self.log = log
        self.child_env = child_env
        self.restarts = 0
        self.stalls_detected = 0

    # -- child lifecycle ---------------------------------------------------

    def _spawn(self) -> subprocess.Popen:
        cmd = [sys.executable, "-m", "gansynth_tpu.cli", "train",
               *self.train_argv]
        env = dict(os.environ if self.child_env is None else self.child_env)
        return subprocess.Popen(cmd, env=env)

    @staticmethod
    def _kill(proc: subprocess.Popen) -> None:
        """Terminate, escalate to SIGKILL — by HANDLE only (never by
        process-name pattern: a wedged dispatch ignores SIGTERM)."""
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)

    # -- heartbeat ---------------------------------------------------------

    def _stall_limit(self, saw_heartbeat: bool, intervals) -> float:
        if not saw_heartbeat:
            return self.startup_grace_s
        if intervals:
            return max(
                self.min_stall_s,
                self.stall_factor * statistics.median(intervals[-20:]),
            )
        return max(self.min_stall_s, self.startup_grace_s)

    def _signal(self):
        """Liveness snapshot: metrics.jsonl size + checkpoint-dir state
        (top-level entry names/mtimes — orbax commits a save by renaming
        a tmp dir into place, which changes both). Any change = beat."""
        metrics = os.path.join(self.model_dir, "metrics.jsonl")
        size = os.path.getsize(metrics) if os.path.exists(metrics) else 0
        ckpts = os.path.join(self.model_dir, "checkpoints")
        entries = ()
        if os.path.isdir(ckpts):
            try:
                entries = tuple(sorted(
                    (e.name, e.stat().st_mtime_ns)
                    for e in os.scandir(ckpts)
                ))
            except OSError:
                pass  # a rename raced the scan; next poll resolves it
        return size, entries

    def _watch(self, proc: subprocess.Popen) -> str:
        """Block until the child exits ('exit') or stalls ('stall' — the
        child has been killed). Heartbeat = metrics.jsonl growth or
        checkpoint-directory activity (see _signal)."""
        last_sig = self._signal()
        last_beat = time.monotonic()
        saw_heartbeat = False
        intervals = []
        while True:
            if proc.poll() is not None:
                return "exit"
            sig = self._signal()
            now = time.monotonic()
            if sig != last_sig:
                if saw_heartbeat:
                    intervals.append(now - last_beat)
                last_sig, last_beat = sig, now
                saw_heartbeat = True
            elif now - last_beat > self._stall_limit(
                saw_heartbeat, intervals
            ):
                self.stalls_detected += 1
                self.log(
                    f"supervisor: heartbeat stale for "
                    f"{now - last_beat:.1f}s "
                    f"(limit {self._stall_limit(saw_heartbeat, intervals):.1f}s"
                    f"); killing the wedged run"
                )
                self._kill(proc)
                return "stall"
            time.sleep(self.poll_s)

    # -- main --------------------------------------------------------------

    def run(self) -> int:
        """Supervise until the training child exits 0 (returns 0) or the
        restart budget is exhausted (returns the child's last nonzero
        code, or 1 after a final stall)."""
        while True:
            proc = self._spawn()
            outcome = self._watch(proc)
            if outcome == "exit" and proc.returncode == 0:
                return 0
            why = (
                "stalled"
                if outcome == "stall"
                else f"exited {proc.returncode}"
            )
            if self.restarts >= self.max_restarts:
                self.log(
                    f"supervisor: child {why}; restart budget "
                    f"({self.max_restarts}) exhausted — giving up"
                )
                return proc.returncode or 1
            self.restarts += 1
            self.log(
                f"supervisor: child {why}; restarting from the latest "
                f"checkpoint ({self.restarts}/{self.max_restarts})"
            )


def model_dir_from_argv(argv: Sequence[str]) -> str:
    """Extract ``--model-dir`` from a forwarded train argv."""
    argv = list(argv)
    for i, a in enumerate(argv):
        if a == "--model-dir" and i + 1 < len(argv):
            return argv[i + 1]
        if a.startswith("--model-dir="):
            return a.split("=", 1)[1]
    raise ValueError("supervised train args must include --model-dir")
