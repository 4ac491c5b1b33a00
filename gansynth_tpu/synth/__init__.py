from gansynth_tpu.synth.interpolate import (  # noqa: F401
    crossfade_concat,
    interpolation_labels,
    interpolation_latents,
    slerp,
)
from gansynth_tpu.synth.sampler import (  # noqa: F401
    Sampler,
    make_dp_sampler,
    make_latent_sampler,
    make_sampler,
)
