from gansynth_tpu.synth.sampler import (  # noqa: F401
    Sampler,
    make_dp_sampler,
    make_sampler,
)
