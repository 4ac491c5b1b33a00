from gansynth_tpu.ops.windows import hann_window, inverse_stft_window  # noqa: F401
from gansynth_tpu.ops.mel import linear_to_mel_matrix, mel_to_linear_matrix  # noqa: F401
from gansynth_tpu.ops.spectral import (  # noqa: F401
    diff,
    unwrap,
    instantaneous_frequency,
    polar_to_rect,
    stft,
    istft,
    frame_signal,
    overlap_add,
    specgrams_to_melspecgrams,
    melspecgrams_to_specgrams,
    wave_to_specgrams,
    specgrams_to_wave,
    wave_to_melspecgrams,
    melspecgrams_to_wave,
    wave_to_image,
    image_to_wave,
)
