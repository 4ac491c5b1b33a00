"""Watchdog supervisor (SURVEY.md §5 failure-detection row): a training
child wedged mid-run — the failure mode actually observed in the round-2
fidelity run, which hung at step 333.5k until a human noticed — is
detected via metrics-heartbeat staleness, killed, and restarted from the
latest checkpoint, and the supervised run completes."""

import json
import os

import pytest

from gansynth_tpu.train.supervisor import Supervisor, model_dir_from_argv

pytest.importorskip("tensorflow")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_model_dir_from_argv():
    assert model_dir_from_argv(["--model-dir", "/x", "--foo"]) == "/x"
    assert model_dir_from_argv(["--foo", "--model-dir=/y"]) == "/y"
    with pytest.raises(ValueError):
        model_dir_from_argv(["--foo", "bar"])


def test_supervisor_recovers_from_injected_stall(tmp_path):
    """End-to-end: child 1 trains to step 4 (checkpointing at 2 and 4),
    then hangs (injected transient wedge). The supervisor detects the
    stale heartbeat, kills it, restarts; child 2 resumes from step 4 and
    finishes. The metrics stream shows one contiguous step sequence —
    proof the restart resumed rather than starting over."""
    model_dir = str(tmp_path / "run")
    flag = str(tmp_path / "stall.flag")
    train_argv = [
        "--model-dir", model_dir, "--synthetic",
        "--num-steps", "6", "--batch-size", "2",
        "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
        "--fade-steps", "1000", "--stable-steps", "1000",  # stay at stage 0
        "--checkpoint-every", "2", "--log-every", "1",
    ]
    env = dict(os.environ)
    env.update({
        # Children must stay off the single-tenant TPU tunnel: the env
        # var alone cannot override the sitecustomize-registered backend,
        # so the CLI honors GANSYNTH_PLATFORM through the config API.
        "GANSYNTH_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "GANSYNTH_TRAIN_STALL": f"4:{flag}",
        "PYTHONPATH": REPO_ROOT + os.pathsep + env.get("PYTHONPATH", ""),
    })
    msgs = []
    sup = Supervisor(
        train_argv, model_dir,
        min_stall_s=15.0, stall_factor=8.0, startup_grace_s=900.0,
        max_restarts=2, poll_s=0.2,
        log=lambda m: msgs.append(m), child_env=env,
    )
    rc = sup.run()
    assert rc == 0, msgs
    assert sup.stalls_detected == 1, msgs
    assert sup.restarts == 1, msgs
    assert os.path.exists(flag)  # the wedge really fired
    lines = [
        json.loads(l)
        for l in open(os.path.join(model_dir, "metrics.jsonl"))
    ]
    steps = [r["step"] for r in lines]
    # --num-steps is resume-relative ("6 MORE steps"): child 1 logged
    # 1..4 then wedged; child 2 resumed from the latest DURABLE
    # checkpoint (4, or 2 if the async save of 4 had not committed when
    # the kill landed) and logged 6 more contiguous steps. A
    # restart-from-zero would repeat step 1.
    assert steps[:4] == [1, 2, 3, 4], steps
    tail = steps[4:]
    assert tail[0] in (3, 5), steps          # resume point + 1
    assert tail == list(range(tail[0], tail[0] + 6)), steps


def test_signal_tracks_metrics_and_checkpoint_activity(tmp_path):
    """The liveness snapshot changes on metrics growth AND on checkpoint
    directory activity (an orbax save committing mid-silence must count
    as a heartbeat — a slow durable save is not a stall)."""
    model_dir = str(tmp_path)
    sup = Supervisor([], model_dir, log=lambda m: None)
    s0 = sup._signal()
    with open(os.path.join(model_dir, "metrics.jsonl"), "a") as f:
        f.write('{"step": 1}\n')
    s1 = sup._signal()
    assert s1 != s0  # metrics growth beats
    ckpt = os.path.join(model_dir, "checkpoints")
    os.makedirs(os.path.join(ckpt, "tmp-5"))
    s2 = sup._signal()
    assert s2 != s1  # a new checkpoint entry beats
    os.rename(os.path.join(ckpt, "tmp-5"), os.path.join(ckpt, "5"))
    s3 = sup._signal()
    assert s3 != s2  # the orbax commit rename beats
    assert sup._signal() == s3  # quiescent -> stable snapshot


def test_supervisor_gives_up_after_budget(tmp_path):
    """A child that exits nonzero immediately burns the restart budget
    and the supervisor returns its code instead of looping forever."""
    model_dir = str(tmp_path / "nodata")
    os.makedirs(model_dir)
    env = dict(os.environ)
    env.update({
        "GANSYNTH_PLATFORM": "cpu",
        "PYTHONPATH": REPO_ROOT + os.pathsep + env.get("PYTHONPATH", ""),
    })
    msgs = []
    # no --data/--synthetic -> cmd_train exits 2 without touching jax
    sup = Supervisor(
        ["--model-dir", model_dir], model_dir,
        min_stall_s=5.0, max_restarts=1, poll_s=0.1,
        log=lambda m: msgs.append(m), child_env=env,
    )
    rc = sup.run()
    assert rc == 2
    assert sup.restarts == 1
    assert any("exited 2" in m for m in msgs)
