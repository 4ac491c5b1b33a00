"""Graceful stop (preemption-style shutdown, SURVEY.md §5 failure-
detection/checkpointing rows): a STOP file in the workdir makes the
training loop checkpoint at the next superstep boundary and return
cleanly, so `cli supervise` sees exit 0 and does not restart. The file
is one-shot (consumed when honored); a resume afterwards replays the
exact stream, so stop+resume equals the uninterrupted run.

The multi-host path (process-0 decision broadcast at log-cadence
crossings) shares all the code below except the broadcast itself, which
`tests/test_multiprocess.py`'s pod harness covers structurally.
"""

import os

import numpy as np
import pytest

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
        checkpoint_every=100,  # far cadence: any mid-run save is the stop's
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


def test_stop_file_checkpoints_and_exits(tfrecord, tmp_path):
    workdir = str(tmp_path / "run")
    stop_path = os.path.join(workdir, "STOP")

    def request_stop(step, stage, metrics):
        if step >= 4:
            open(stop_path, "w").close()

    state = train(
        TINY, data_iter(tfrecord), num_steps=12, workdir=workdir,
        on_metrics=request_stop,
    )
    stopped_at = int(state.step)
    assert stopped_at < 12  # honored before the requested horizon
    assert stopped_at >= 4  # ... but not before the request
    # the stop saved a checkpoint at the boundary even off-cadence
    from gansynth_tpu.utils.checkpoint import Checkpointer

    assert Checkpointer(f"{workdir}/checkpoints").latest_step() == stopped_at
    # and the compact EMA artifact rode along
    assert os.path.exists(os.path.join(workdir, "ema.npz"))
    # one-shot: the request was consumed
    assert not os.path.exists(stop_path)


def test_startup_stop_file_is_honored_not_discarded(tfrecord, tmp_path):
    """A STOP file already present when train() starts is a request that
    may have raced a supervised child's spawn (cli stop / supervisor
    SIGTERM write it exactly once) — it must be HONORED at the first
    boundary, never silently deleted (which would make `stop --wait`
    report success while the run continues)."""
    workdir = str(tmp_path / "preexisting")
    os.makedirs(workdir)
    open(os.path.join(workdir, "STOP"), "w").close()
    with pytest.warns(UserWarning, match="already present at startup"):
        state = train(TINY, data_iter(tfrecord), num_steps=9, workdir=workdir)
    stopped_at = int(state.step)
    assert stopped_at < 9  # stopped at the first boundary, not the horizon
    from gansynth_tpu.utils.checkpoint import Checkpointer

    assert Checkpointer(f"{workdir}/checkpoints").latest_step() == stopped_at
    assert not os.path.exists(os.path.join(workdir, "STOP"))  # consumed


def test_resume_after_stop_matches_uninterrupted(tfrecord, tmp_path):
    """Stop + resume must see the SAME batch stream and land on the same
    numbers as the uninterrupted run (the loop.py resume contract)."""
    losses_full = []
    train(
        TINY, data_iter(tfrecord), num_steps=8,
        workdir=str(tmp_path / "full"),
        on_metrics=lambda s, st, m: losses_full.append(
            (s, float(np.asarray(m["d_loss"])))
        ),
    )

    workdir = str(tmp_path / "stopped")
    stop_path = os.path.join(workdir, "STOP")

    def request_stop(step, stage, metrics):
        if step >= 4:
            open(stop_path, "w").close()

    state = train(
        TINY, data_iter(tfrecord), num_steps=8, workdir=workdir,
        on_metrics=request_stop,
    )
    stopped_at = int(state.step)
    assert stopped_at < 8
    losses_resumed = []
    state = train(
        TINY, data_iter(tfrecord), num_steps=8 - stopped_at, workdir=workdir,
        on_metrics=lambda s, st, m: losses_resumed.append(
            (s, float(np.asarray(m["d_loss"])))
        ),
    )
    assert int(state.step) == 8
    tail_full = [x for x in losses_full if x[0] > stopped_at]
    np.testing.assert_allclose(
        [l for _, l in losses_resumed],
        [l for _, l in tail_full],
        rtol=2e-5,
    )


class TestCliStop:
    def test_writes_stop_file(self, tmp_path, capsys):
        d = str(tmp_path / "run")
        os.makedirs(d)
        assert cli_main(["stop", "--model-dir", d]) == 0
        assert os.path.exists(os.path.join(d, "STOP"))
        assert "stop requested" in capsys.readouterr().out

    def test_missing_model_dir(self, tmp_path, capsys):
        assert cli_main(
            ["stop", "--model-dir", str(tmp_path / "nope")]
        ) == 2

    def test_wait_times_out_when_nothing_polls(self, tmp_path, capsys):
        d = str(tmp_path / "dead")
        os.makedirs(d)
        assert cli_main(["stop", "--model-dir", d, "--wait", "1.2"]) == 1
        assert "no live run" in capsys.readouterr().out

    def test_wait_returns_when_consumed(self, tmp_path, capsys):
        import threading

        d = str(tmp_path / "live")
        os.makedirs(d)
        stop_path = os.path.join(d, "STOP")

        def consume():
            # a stand-in for the training loop honoring the request
            while not os.path.exists(stop_path):
                pass
            os.remove(stop_path)

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        assert cli_main(["stop", "--model-dir", d, "--wait", "10"]) == 0
        t.join(timeout=5)
        assert "stop honored" in capsys.readouterr().out


class TestSupervisorStop:
    """SIGTERM to the supervisor == graceful preemption (supervisor.py):
    it writes the STOP file, the child checkpoints and exits 0, and the
    supervisor returns 0 without restarting."""

    TRAIN_ARGV = [
        "--synthetic", "--num-steps", "4000", "--batch-size", "2",
        "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
        "--fade-steps", "5000", "--stable-steps", "5000",
        "--checkpoint-every", "1000", "--log-every", "1",
    ]

    @staticmethod
    def _cpu_env():
        import tests.test_supervisor as ts

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "GANSYNTH_PLATFORM": "cpu",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": ts.REPO_ROOT + os.pathsep
            + env.get("PYTHONPATH", ""),
        })
        return env

    def test_sigterm_stops_without_restart(self, tmp_path):
        import signal
        import subprocess
        import sys
        import time

        model_dir = str(tmp_path / "run")
        proc = subprocess.Popen(
            [sys.executable, "-m", "gansynth_tpu.cli", "supervise",
             "--stall-timeout", "120", "--startup-grace", "900",
             "--stop-grace", "300", "--",
             "--model-dir", model_dir, *self.TRAIN_ARGV],
            env=self._cpu_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        metrics = os.path.join(model_dir, "metrics.jsonl")
        deadline = time.time() + 600
        while time.time() < deadline and (
            not os.path.exists(metrics) or os.path.getsize(metrics) == 0
        ):
            assert proc.poll() is None, proc.communicate()[0]
            time.sleep(0.5)
        assert os.path.exists(metrics), "child never produced a heartbeat"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out
        assert "stop requested" in out, out
        assert "graceful stop: STOP file honored" in out, out
        assert "restarting" not in out, out
        assert not os.path.exists(os.path.join(model_dir, "STOP"))
        from gansynth_tpu.utils.checkpoint import Checkpointer

        assert Checkpointer(f"{model_dir}/checkpoints").latest_step()

    def test_wedged_child_is_killed_past_stop_grace(self, tmp_path):
        """A child too wedged to honor STOP (the watchdog's raison
        d'etre) is killed after stop_grace_s and NOT restarted."""
        from gansynth_tpu.train.supervisor import Supervisor

        model_dir = str(tmp_path / "run")
        flag = str(tmp_path / "stall.flag")
        env = self._cpu_env()
        env["GANSYNTH_TRAIN_STALL"] = f"2:{flag}"
        msgs = []
        sup = Supervisor(
            ["--model-dir", model_dir, *self.TRAIN_ARGV],
            model_dir,
            min_stall_s=600.0, startup_grace_s=900.0,  # watchdog quiet
            max_restarts=3, poll_s=0.2, stop_grace_s=8.0,
            log=lambda m: msgs.append(m), child_env=env,
        )
        import threading
        import time

        def stop_once_wedged():
            deadline = time.time() + 600
            while time.time() < deadline and not os.path.exists(flag):
                time.sleep(0.2)
            sup.request_stop()

        t = threading.Thread(target=stop_once_wedged, daemon=True)
        t.start()
        rc = sup.run()
        t.join(timeout=10)
        assert rc == 1, msgs
        assert sup.restarts == 0, msgs
        assert any("did not honor STOP" in m for m in msgs), msgs
        assert any("not restarting" in m for m in msgs), msgs
