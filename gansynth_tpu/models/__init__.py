from gansynth_tpu.models.layers import (  # noqa: F401
    EqualizedConv,
    EqualizedDense,
    EqualizedUpConv,
    pixel_norm,
    minibatch_stddev,
    upsample_nearest,
    downsample_avg,
)
from gansynth_tpu.models.generator import Generator  # noqa: F401
from gansynth_tpu.models.discriminator import Discriminator  # noqa: F401
