from yoho_tpu.audio.filters import mel_filter_bank  # noqa: F401
from yoho_tpu.audio.frontend import (  # noqa: F401
    stft_power,
    log_mel_spectrogram,
    whisper_log_mel,
    yoho_log_mel,
    normalize_standardize,
    normalize_whisper,
)
from yoho_tpu.audio.io import load_audio, load_audio_f32, save_audio, resample  # noqa: F401
from yoho_tpu.audio.vad import (  # noqa: F401
    VadOptions,
    SpeechMap,
    detect_speech,
    collapse_silence,
)
