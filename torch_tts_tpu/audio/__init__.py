from torch_tts_tpu.audio.mel import (
    hann_window,
    mel_filterbank,
    spectrogram,
    spec_to_mel,
    mel_spectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
)
