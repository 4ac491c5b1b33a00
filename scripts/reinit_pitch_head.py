"""Phase-2 repair for the AC-GAN label-swap equilibrium (DESIGN.md §4d):
reinitialize the discriminator's pitch-head parameters inside the latest
checkpoint of a run.

Rationale: the trained head has a watermark-reading feature direction
that keeps G's pitch CE at ~0 for swapped labels even though the audio
sounds at the wrong pitch. Real-only CE (phase 1) stops MAINTAINING that
channel but cannot actively remove it while its real-batch CE is already
~0. A fresh head trained from real-CE alone must rediscover pitch from
the trunk's features — at which point G's CE spikes exactly at the
swapped labels and pulls the fundamental back.

Usage: python scripts/reinit_pitch_head.py <run_dir> [--seed 123]
Writes a new checkpoint at step+1 with only d_params/pitch_head replaced
(and the D optimizer state for that subtree zeroed via re-init).
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gansynth_tpu.train.state import create_train_state, make_optimizer
    from gansynth_tpu.utils.checkpoint import Checkpointer
    from gansynth_tpu.utils.config import Config

    with open(f"{args.run_dir}/train_config.json") as f:
        config = Config().with_overrides(json.load(f))
    ckpt = Checkpointer(f"{args.run_dir}/checkpoints")
    state, step = ckpt.restore(create_train_state(config))
    print(f"restored step {step}", flush=True)

    d_params = jax.device_get(state.d_params)
    head = d_params["params"]["pitch_head"]
    kernel = head["kernel"]
    key = jax.random.key(args.seed)
    # EqualizedDense stores unit-variance weights and rescales by the He
    # constant at call time; fresh init = standard normal (same law as
    # nn.initializers used at create_train_state time) and zero bias.
    head["kernel"] = jax.random.normal(key, kernel.shape, kernel.dtype)
    if "bias" in head:
        head["bias"] = jnp.zeros_like(head["bias"])

    # Reset the D optimizer wholesale: Adam moments for a reinitialized
    # subtree are stale, and the simplest consistent state is a fresh
    # optimizer (momentum-free Adam with b1=0 recovers in a few steps).
    opt = make_optimizer(config)
    new_state = state.replace(d_params=d_params, d_opt=opt.init(d_params))
    ckpt.save(step + 1, new_state, wait=True)
    print(f"wrote checkpoint {step + 1} with a fresh pitch head", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
