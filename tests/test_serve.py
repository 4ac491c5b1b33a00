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
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert exc.value.code == 404
