from yoho_tpu.core.config import (  # noqa: F401
    YOHOConfig,
    WhisperConfig,
    SessionConfig,
    load_session_config,
    WHISPER_PRESETS,
)
