"""Worker process for tests/test_multiprocess.py (not a test module).

Runs ONE process of a 2-process JAX CPU "pod": initializes
jax.distributed, builds the global data mesh, and drives the REAL
multi-host code path — per-process local batches assembled into global
arrays by ``shard_host_local_batch`` inside ``prefetch_to_mesh``'s
``process_count() > 1`` branch, stepped by the DP-jitted train step via
``train(..., use_mesh=True)``.

Usage: python multiprocess_worker.py <pid> <nprocs> <port> <outfile>
"""

import json
import os
import sys

# Spawned bare (not under pytest): the repo root is not implicitly on
# sys.path, only this script's directory is.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ.setdefault("JAX_THREEFRY_PARTITIONABLE", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gansynth_tpu.parallel import initialize_multihost

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * nprocs, n_global

    import numpy as np

    from gansynth_tpu.train import create_train_state
    from gansynth_tpu.train.loop import train
    from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

    config = Config(
        model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
        train=TrainConfig(batch_size=2 * nprocs, log_every=0,
                          checkpoint_every=0),
    )

    # Every process derives the same GLOBAL batch stream from the seed and
    # feeds only its local slice — the per-host ingest contract
    # (make_nsynth_iterator(..., num_shards=process_count())) in miniature,
    # but bit-deterministic for the equivalence assertion.
    def local_batches():
        rng = np.random.default_rng(123)
        t = np.arange(config.audio.audio_length) / config.audio.sample_rate
        while True:
            freqs = rng.uniform(110, 1500, config.train.batch_size)
            waves = np.sin(2 * np.pi * freqs[:, None] * t).astype(np.float32)
            pitch = rng.integers(24, 85, config.train.batch_size).astype(
                np.int32
            )
            lo, hi = pid * 2, (pid + 1) * 2
            yield waves[lo:hi], pitch[lo:hi]

    metrics_log = []
    state = train(
        config,
        local_batches(),
        num_steps=2,
        state=create_train_state(config, seed=0),
        use_mesh=True,
        on_metrics=lambda step, stage, m: metrics_log.append(
            {k: float(np.asarray(v)) for k, v in m.items()}
        ),
    )
    checksum = float(
        sum(
            float(abs(np.asarray(leaf)).sum())
            for leaf in jax.tree.leaves(state.g_params)
        )
    )

    # Mesh-resident cached stream in the pod (both HBM layouts): every
    # process builds the IDENTICAL full dataset; the loop assembles it
    # onto the global mesh and the stateless stream steps it. The
    # per-layout checksums must agree across processes AND across
    # layouts (the gathered batch content is layout-independent).
    import dataclasses

    rng = np.random.default_rng(7)
    n_examples = 2 * n_global
    t = np.arange(config.audio.audio_length) / config.audio.sample_rate
    freqs = rng.uniform(110, 1500, n_examples)
    cache_waves = np.sin(2 * np.pi * freqs[:, None] * t).astype(np.float32)
    cache_pitches = rng.integers(24, 85, n_examples).astype(np.int32)
    cached_checksums = {}
    for layout in ("replicate", "shard"):
        cfg_c = dataclasses.replace(
            config,
            train=dataclasses.replace(
                config.train, device_cache_layout=layout, unroll=2
            ),
        )
        st = train(
            cfg_c,
            None,
            num_steps=2,
            state=create_train_state(cfg_c, seed=1),
            use_mesh=True,
            device_dataset=(cache_waves, cache_pitches),
        )
        cached_checksums[layout] = float(
            sum(
                float(abs(np.asarray(leaf)).sum())
                for leaf in jax.tree.leaves(st.g_params)
            )
        )

    # Multi-host graceful stop (train/loop.py's STOP OR-reduce): only
    # process 1 sees a STOP file (each process gets its OWN workdir,
    # mirroring per-host filesystems in a real pod — and an operator's
    # `cli stop` may land on ANY host, not just process 0); the
    # log-cadence OR-reduce of the per-host file checks must stop BOTH
    # processes at the SAME step, or the SPMD programs would desync.
    class _NoCkpt:
        """Keeps this scenario free of orbax multi-host save
        coordination (not what it tests)."""

        def latest_step(self):
            return None

        def restore(self, state):
            return state, None

        def save(self, step, state):
            pass

        def wait(self):
            pass

    workdir = f"{outfile}.stopdir{pid}"
    os.makedirs(workdir, exist_ok=True)
    stop_file = os.path.join(workdir, "STOP")

    def maybe_stop(step, stage, m):
        if pid == 1 and step >= 2:
            open(stop_file, "w").close()

    cfg_s = dataclasses.replace(
        config, train=dataclasses.replace(config.train, log_every=1)
    )
    st = train(
        cfg_s,
        local_batches(),
        num_steps=50,
        state=create_train_state(cfg_s, seed=2),
        use_mesh=True,
        workdir=workdir,
        checkpointer=_NoCkpt(),
        on_metrics=maybe_stop,
    )
    stop_step = int(st.step)

    with open(outfile, "w") as f:
        json.dump(
            {
                "process_count": jax.process_count(),
                "num_devices": n_global,
                "step": int(state.step),
                "metrics": metrics_log,
                "g_param_checksum": checksum,
                "cached_checksums": cached_checksums,
                "stop_step": stop_step,
                "stop_consumed": not os.path.exists(stop_file),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
