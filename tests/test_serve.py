"""Synthesis server tests: real HTTP requests against a live server on an
ephemeral port (serving layer, beyond the reference's CLI-only path)."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
import wave as wavmod

import numpy as np
import pytest

from gansynth_tpu.serve import SynthesisService, make_server
from gansynth_tpu.train.state import create_train_state
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=2),
)


@pytest.fixture(scope="module")
def server():
    state = create_train_state(CFG, seed=0)
    service = SynthesisService(CFG, state.ema_params, stage=2, max_batch=4)
    srv = make_server(service, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["num_pitches"] == 61
    assert info["max_batch"] == 4
    # batch ladder + measured warm latencies are advertised
    assert info["batch_ladder"] == [1, 4]
    assert set(info["warm_latency_s"]) == {"1", "4"}
    assert all(v > 0 for v in info["warm_latency_s"].values())


def test_batch_ladder_rung_selection():
    state = create_train_state(CFG, seed=0)
    service = SynthesisService(CFG, state.ema_params, stage=1, max_batch=16)
    assert service.batch_ladder == (1, 4, 16)
    assert service.rung_for(1) == 1
    assert service.rung_for(2) == 4
    assert service.rung_for(4) == 4
    assert service.rung_for(5) == 16
    assert service.rung_for(16) == 16
    with pytest.raises(ValueError):
        service.rung_for(17)
    # a 1-note request really runs the 1-note program (output still valid)
    w = service.synthesize([60], seed=3)
    assert w.shape == (1, 64000) and np.isfinite(w).all()


def test_synthesize_wav(server):
    with post(server + "/synthesize", {"pitches": [48, 72], "seed": 1}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    with wavmod.open(io.BytesIO(body)) as f:
        assert f.getframerate() == 16000
        assert f.getnframes() == 2 * 64000  # two notes concatenated


def test_synthesize_json(server):
    with post(server + "/synthesize",
              {"pitches": [60], "format": "json"}) as r:
        obj = json.loads(r.read())
    assert obj["num_notes"] == 1
    wav = base64.b64decode(obj["wav_base64"])
    with wavmod.open(io.BytesIO(wav)) as f:
        assert f.getnframes() == 64000


def test_determinism_per_seed(server):
    bodies = []
    for _ in range(2):
        with post(server + "/synthesize", {"pitches": [40], "seed": 7}) as r:
            bodies.append(r.read())
    assert bodies[0] == bodies[1]


def test_coalescing_merges_waiting_requests():
    """Requests queued together execute as ONE device batch, and the
    coalesced result for a (seed, index) note is byte-stable."""
    from gansynth_tpu.serve import SynthesisService, _Request

    state = create_train_state(CFG, seed=0)
    service = SynthesisService(CFG, state.ema_params, stage=1, max_batch=4)

    def run_coalesced():
        reqs = [_Request([100 + i], [40 + i]) for i in range(3)]
        with service._cond:
            service._queue.extend(reqs)  # enqueue silently, then wake once
            service._queued_notes += 3
            service._cond.notify()
        for r in reqs:
            assert r.done.wait(timeout=120)
            assert r.error is None
        return np.concatenate([r.result for r in reqs])

    before = service.device_batches
    a = run_coalesced()
    assert service.device_batches == before + 1  # one program, 3 requests
    assert service.coalesced_batches >= 1
    assert service.requests_served >= 3
    b = run_coalesced()
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 64000) and np.isfinite(a).all()


def test_backpressure_and_stall_recovery():
    """The observed failure mode (a wedged device dispatch) fails fast:
    queued clients get a timeout instead of blocking forever, overflow
    beyond the queue bound is rejected, and the service recovers once the
    device un-wedges (late results discarded, fresh requests served)."""
    import time

    from gansynth_tpu.serve import RequestTimeoutError, ServiceOverloadedError

    state = create_train_state(CFG, seed=0)
    service = SynthesisService(
        CFG, state.ema_params, stage=1, max_batch=4,
        max_queue_notes=4, request_timeout_s=1.0,
    )
    gate = threading.Event()
    real_run = service._run_device

    def stalled(seeds, pitches):  # simulated wedged dispatch
        assert gate.wait(timeout=120)
        return real_run(seeds, pitches)

    service._run_device = stalled

    outcome = {}

    def client(name, pitches):
        try:
            outcome[name] = service.synthesize(pitches, seed=1)
        except Exception as e:
            outcome[name] = e

    ta = threading.Thread(target=client, args=("a", [60] * 4))
    ta.start()
    for _ in range(500):  # until A is in flight (inside the device call)
        if service._in_flight_notes == 4:
            break
        time.sleep(0.01)
    assert service._in_flight_notes == 4
    tb = threading.Thread(target=client, args=("b", [61] * 4))
    tb.start()
    for _ in range(500):  # until B is queued behind the stalled call
        if service._queued_notes == 4:
            break
        time.sleep(0.01)
    assert service._queued_notes == 4
    # C overflows the bounded queue -> immediate rejection, not a hang.
    with pytest.raises(ServiceOverloadedError):
        service.synthesize([62], seed=2)
    assert service.requests_rejected == 1
    # A (in flight) and B (queued) both fail by timeout, not forever.
    ta.join(timeout=60)
    tb.join(timeout=60)
    assert isinstance(outcome["a"], RequestTimeoutError)
    assert isinstance(outcome["b"], RequestTimeoutError)
    assert service.requests_timed_out == 2
    # Un-wedge: A's late result is discarded (client already failed), B's
    # abandoned request is dropped, and a fresh request is served.
    gate.set()
    for _ in range(3000):  # batcher drains A's late result + abandoned B
        if service._queued_notes == 0 and service._in_flight_notes == 0:
            break
        time.sleep(0.01)
    w = service.synthesize([63], seed=3, timeout_s=120)
    assert w.shape == (1, 64000) and np.isfinite(w).all()
    assert service._queued_notes == 0


def test_http_429_and_504():
    """HTTP mapping of the backpressure errors on a live server."""
    state = create_train_state(CFG, seed=0)
    service = SynthesisService(
        CFG, state.ema_params, stage=1, max_batch=4,
        max_queue_notes=2, request_timeout_s=0.5,
    )
    gate = threading.Event()
    real_run = service._run_device
    service._run_device = lambda s, p: (gate.wait(120) and None) or real_run(s, p)
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # First request goes in flight and stalls -> 504 on timeout.
        with pytest.raises(urllib.error.HTTPError) as exc:
            post(url + "/synthesize", {"pitches": [60]})
        assert exc.value.code == 504
        # Fill the (2-note) queue in the background...
        t = threading.Thread(
            target=lambda: client_expect(url, [61, 62], 504))
        t.start()
        for _ in range(500):
            if service._queued_notes == 2:
                break
            import time
            time.sleep(0.01)
        # ...so the next note overflows -> 429.
        with pytest.raises(urllib.error.HTTPError) as exc:
            post(url + "/synthesize", {"pitches": [63]})
        assert exc.value.code == 429
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            info = json.loads(r.read())
        assert info["requests_rejected"] >= 1
        assert info["max_queue_notes"] == 2
        assert info["determinism"] == "per-rung"
        t.join(timeout=60)
    finally:
        gate.set()
        srv.shutdown()


def client_expect(url, pitches, code):
    try:
        post(url + "/synthesize", {"pitches": pitches})
    except urllib.error.HTTPError as e:
        assert e.code == code


def test_concurrent_clients(server):
    """Many simultaneous 1-note requests all succeed (and may coalesce)."""
    results, errors = {}, []

    def client(i):
        try:
            with post(server + "/synthesize",
                      {"pitches": [30 + i], "seed": i}) as r:
                results[i] = r.read()
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors
    assert len(results) == 6
    for body in results.values():
        with wavmod.open(io.BytesIO(body)) as f:
            assert f.getnframes() == 64000


def test_error_paths(server):
    for payload, frag in [
        ({"pitches": []}, "non-empty"),
        ({"pitches": [60] * 5}, "at most"),
        ({"pitches": [200]}, "outside"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            post(server + "/synthesize", payload)
        assert exc.value.code == 400
        assert frag in json.loads(exc.value.read())["error"]
    # Malformed JSON must hit the JSONDecodeError branch (which subclasses
    # ValueError — ordering in the handler matters) and return the fixed
    # message, not a decoder traceback string.
    req = urllib.request.Request(
        server + "/synthesize", data=b"{not json!",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400
    assert json.loads(exc.value.read())["error"] == "invalid JSON body"
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert exc.value.code == 404


class TestDataParallelServing:
    """DP serving (VERDICT r3 item 3): the coalescing batcher over the
    8-device virtual mesh, with per-note audio identical to the
    single-device service on the same rung."""

    @pytest.fixture(scope="class")
    def dp_service(self):
        from gansynth_tpu.parallel import make_mesh

        state = create_train_state(CFG, seed=0)
        return SynthesisService(
            CFG, state.ema_params, stage=2, max_batch=16, mesh=make_mesh()
        ), state

    def test_ladder_is_mesh_multiples(self, dp_service):
        service, _ = dp_service
        assert service.mesh is not None
        n = service.mesh.devices.size
        assert n == 8
        assert all(b % n == 0 for b in service.batch_ladder)
        assert service.batch_ladder == (8, 16)
        assert service.rung_for(1) == 8
        assert service.rung_for(9) == 16

    def test_per_note_audio_matches_single_device(self, dp_service):
        """Per-note audio vs the single-device service on the same rung:
        a note is a pure function of (params, seed, pitch), so DP
        placement changes nothing semantically. Byte-stability, however,
        is per (rung, placement): the sharded program is a different XLA
        specialization than the single-device batch-8 program and may
        differ in the last float bits (measured ~4e-5 relative on the
        CPU mesh) — the same caveat the service already documents for
        rung changes. Within ONE service, requests are byte-stable per
        rung (test_coalesced_dp_requests asserts exact equality)."""
        service, state = dp_service
        single = SynthesisService(
            CFG, state.ema_params, stage=2, max_batch=8
        )
        pitches = [60, 72, 48, 84, 24, 36, 55, 67]
        w_dp = service.synthesize(pitches, seed=5)
        w_single = single.synthesize(pitches, seed=5)
        assert w_dp.shape == w_single.shape == (8, 64000)
        scale = np.abs(w_single).max()
        np.testing.assert_allclose(w_dp, w_single, atol=2e-4 * scale)

    def test_coalesced_dp_requests(self, dp_service):
        """Concurrent requests coalesce into one sharded device batch and
        every client still gets its own deterministic notes."""
        service, _ = dp_service
        results = {}

        def client(tag, pitches, seed):
            results[tag] = service.synthesize(pitches, seed=seed)

        threads = [
            threading.Thread(target=client, args=(i, [60 + i], i))
            for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(results) == set(range(6))
        for i, w in results.items():
            assert w.shape == (1, 64000) and np.isfinite(w).all()
            # Re-request alone: same (seed, pitch) -> same audio,
            # regardless of what it was coalesced with.
            again = service.synthesize([60 + i], seed=i)
            np.testing.assert_array_equal(w, again)

    def test_healthz_reports_mesh(self, dp_service):
        service, _ = dp_service
        srv = make_server(service, port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
                info = json.loads(r.read())
            assert info["mesh_devices"] == 8
            assert info["max_batch"] == 16
        finally:
            srv.shutdown()


class TestExportedArtifactServing:
    """Checkpoint-free serving from a .gsx StableHLO artifact
    (synth/export.py): the AOT program replaces the in-process sampler;
    coalescing, rungs, and the HTTP surface are unchanged."""

    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        from gansynth_tpu.synth.export import save_sampler_artifact

        state = create_train_state(CFG, seed=0)
        path = str(tmp_path_factory.mktemp("gsx") / "srv.gsx")
        save_sampler_artifact(
            path, CFG, state.ema_params, step=9, stage=2
        )
        return path

    @pytest.fixture(scope="class")
    def exported_server(self, artifact):
        from gansynth_tpu.synth.export import load_sampler_artifact

        service = SynthesisService(
            CFG, None, exported=load_sampler_artifact(artifact),
            max_batch=4,
        )
        srv = make_server(service, port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def test_healthz_reports_artifact(self, exported_server):
        with urllib.request.urlopen(
            exported_server + "/healthz", timeout=30
        ) as r:
            info = json.loads(r.read())
        assert info["exported_artifact"] is True
        assert info["batch_ladder"] == [1, 4]

    def test_synthesize_and_determinism(self, exported_server):
        payload = {"pitches": [60, 72], "seed": 5, "format": "json"}
        bodies = []
        for _ in range(2):
            with post(exported_server + "/synthesize", payload) as r:
                bodies.append(r.read())
        assert bodies[0] == bodies[1]  # per-seed determinism survives
        obj = json.loads(bodies[0])
        assert obj["num_notes"] == 2
        wav = base64.b64decode(obj["wav_base64"])
        with wavmod.open(io.BytesIO(wav)) as f:
            assert f.getnframes() == 2 * CFG.audio.audio_length

    def test_matches_in_process_service(self, artifact):
        """Same seeds/pitches through the artifact service and the
        in-process one agree to specialization noise (the artifact is
        a different XLA lowering of the same program)."""
        from gansynth_tpu.synth.export import load_sampler_artifact

        state = create_train_state(CFG, seed=0)
        svc_a = SynthesisService(
            CFG, None, exported=load_sampler_artifact(artifact),
            max_batch=4,
        )
        svc_b = SynthesisService(CFG, state.ema_params, stage=2, max_batch=4)
        wa = svc_a.synthesize([60, 72], seed=5)
        wb = svc_b.synthesize([60, 72], seed=5)
        scale = max(1.0, float(np.max(np.abs(wb))))
        assert float(np.max(np.abs(wa - wb))) <= 1e-3 * scale

    def test_static_batch_artifact_rejected(self, tmp_path):
        from gansynth_tpu.synth.export import (
            load_sampler_artifact,
            save_sampler_artifact,
        )

        state = create_train_state(CFG, seed=0)
        path = str(tmp_path / "static.gsx")
        save_sampler_artifact(
            path, CFG, state.ema_params, step=1, stage=2, batch=4
        )
        with pytest.raises(ValueError, match="symbolic-batch"):
            SynthesisService(
                CFG, None, exported=load_sampler_artifact(path), max_batch=4
            )

    def test_mesh_and_artifact_exclusive(self, artifact):
        from gansynth_tpu.synth.export import load_sampler_artifact

        import jax
        from gansynth_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices())
        with pytest.raises(ValueError, match="single lowered program"):
            SynthesisService(
                CFG, None, exported=load_sampler_artifact(artifact),
                mesh=mesh, max_batch=8,
            )


class TestServeCliErrors:
    """cmd_serve usage errors: one-line stderr message, exit 2 (no
    server start, no traceback)."""

    def test_no_model_dir_and_no_artifact(self, capsys):
        from gansynth_tpu.cli import main as cli_main

        assert cli_main(["serve"]) == 2
        assert "needs --model-dir" in capsys.readouterr().err

    def test_missing_artifact_file(self, capsys):
        from gansynth_tpu.cli import main as cli_main

        assert cli_main(["serve", "--from-exported", "/nope.gsx"]) == 2
        assert "cannot serve /nope.gsx" in capsys.readouterr().err

    def test_artifact_conflicts_with_data_parallel(self, capsys, tmp_path):
        from gansynth_tpu.cli import main as cli_main

        p = tmp_path / "x.gsx"
        p.write_bytes(b"irrelevant")  # rejected before it is ever read
        rc = cli_main(["serve", "--from-exported", str(p),
                       "--data-parallel"])
        assert rc == 2
        assert "does not compose" in capsys.readouterr().err

    def test_pinned_batch_artifact_rejected(self, capsys, tmp_path):
        from gansynth_tpu.cli import main as cli_main
        from gansynth_tpu.synth.export import save_sampler_artifact

        state = create_train_state(CFG, seed=0)
        p = str(tmp_path / "pinned.gsx")
        save_sampler_artifact(p, CFG, state.ema_params, step=1, stage=1,
                              batch=2)
        assert cli_main(["serve", "--from-exported", p]) == 2
        assert "symbolic-batch" in capsys.readouterr().err
