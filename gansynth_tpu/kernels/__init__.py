from gansynth_tpu.kernels.pallas_synthesis import (  # noqa: F401
    synthesis_spectrum_pallas,
)
