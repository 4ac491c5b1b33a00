"""Multi-PROCESS execution of the pod path (SURVEY.md §4 item 4).

tests/test_multihost.py exercises the composed primitives in one process;
this spawns a real 2-process JAX "pod" on CPU (2 local devices each, 4
global) via jax.distributed, so the ``process_count() > 1`` branches —
``shard_host_local_batch``'s make_array_from_process_local_data assembly
and ``prefetch_to_mesh``'s multi-host infeed — actually execute, driven
through the public ``train(..., use_mesh=True)`` loop.

The equivalence oracle: global-batch statistics make the DP step
device-count- and process-count-independent, so the 2-process run must
match a single-process single-device run on the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def pod_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pod")
    port = _free_port()
    nprocs = 2
    procs, outs = [], []
    for pid in range(nprocs):
        out = str(tmp / f"proc{pid}.json")
        outs.append(out)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nprocs), str(port), out],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("pod worker timed out")
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    return results


class TestMultiProcessPod:
    def test_pod_topology(self, pod_results):
        for r in pod_results:
            assert r["process_count"] == 2
            assert r["num_devices"] == 4
            assert r["step"] == 2

    def test_processes_agree(self, pod_results):
        a, b = pod_results
        assert a["g_param_checksum"] == pytest.approx(
            b["g_param_checksum"], rel=1e-6
        )
        for ma, mb in zip(a["metrics"], b["metrics"]):
            for k in ma:
                assert ma[k] == pytest.approx(mb[k], rel=1e-5, abs=1e-6), k

    def test_cached_stream_in_pod(self, pod_results):
        """--device-cache in a pod: both HBM layouts run, processes
        agree, and the two layouts produce the same trained params (the
        gathered batch content is layout-independent)."""
        a, b = pod_results
        for layout in ("replicate", "shard"):
            assert a["cached_checksums"][layout] == pytest.approx(
                b["cached_checksums"][layout], rel=1e-6
            ), layout
        assert a["cached_checksums"]["replicate"] == pytest.approx(
            a["cached_checksums"]["shard"], rel=1e-4
        )

    def test_graceful_stop_broadcast(self, pod_results):
        """Only process 1 sees the STOP file (an operator's `cli stop`
        can land on any pod host); the OR-reduce must stop
        BOTH processes at the same step, and consume the request."""
        a, b = pod_results
        assert a["stop_step"] == b["stop_step"]
        assert 2 <= a["stop_step"] < 50
        assert a["stop_consumed"] and b["stop_consumed"]

    def test_matches_single_process(self, pod_results):
        """2-process DP ≡ single-device on the same global batch."""
        import jax
        import jax.numpy as jnp

        from gansynth_tpu.train import create_train_state, make_train_step
        from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

        config = Config(
            model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16,
                              fmap_min=8),
            train=TrainConfig(batch_size=4),
        )
        rng = np.random.default_rng(123)  # the worker's stream
        t = np.arange(config.audio.audio_length) / config.audio.sample_rate
        state = create_train_state(config, seed=0)
        step = jax.jit(make_train_step(config, 0))
        ref = []
        for _ in range(2):
            freqs = rng.uniform(110, 1500, 4)
            waves = np.sin(2 * np.pi * freqs[:, None] * t).astype(np.float32)
            pitch = rng.integers(24, 85, 4).astype(np.int32)
            state, metrics = step(
                state, jnp.asarray(waves), jnp.asarray(pitch),
                jnp.float32(1.0),
            )
            ref.append({k: float(np.asarray(v)) for k, v in metrics.items()})
        pod = pod_results[0]["metrics"]
        for mr, mp in zip(ref, pod):
            for k in ("d_loss", "wgan", "g_loss", "d_pitch_ce"):
                assert mr[k] == pytest.approx(mp[k], rel=2e-4, abs=2e-5), k
