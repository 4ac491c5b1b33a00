from gansynth_tpu.synth.interpolate import (  # noqa: F401
    crossfade_concat,
    interpolation_labels,
    interpolation_latents,
    slerp,
)
from gansynth_tpu.synth.export import (  # noqa: F401
    ExportedSampler,
    export_sampler,
    load_sampler_artifact,
    save_sampler_artifact,
)
from gansynth_tpu.synth.sampler import (  # noqa: F401
    Sampler,
    make_dp_sampler,
    make_latent_sampler,
    make_sampler,
)
