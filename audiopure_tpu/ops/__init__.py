from audiopure_tpu.ops.stft import (  # noqa: F401
    MelFrontEnd,
    amplitude_to_db,
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    stft_power,
)
