from pathlib import Path

from yoho_tpu.core.config import (
    DEFAULT_SESSION_TOML,
    SessionConfig,
    WHISPER_PRESETS,
    YOHOConfig,
    load_session_config,
)


def test_yoho_derived_lengths():
    cfg = YOHOConfig()
    # Identities from SURVEY.md §6 (verified vs scipy framing).
    assert cfg.n_samples == 164_080
    assert abs(cfg.max_input_seconds - 10.255) < 1e-9
    assert cfg.encoder_positions == 512


def test_whisper_presets():
    small = WHISPER_PRESETS["small"]
    assert small.n_audio_state == 768 and small.n_audio_layer == 12
    assert small.n_samples == 480_000 and small.n_frames == 3000
    assert WHISPER_PRESETS["large-v3"].n_mels == 128
    assert WHISPER_PRESETS["large-v3"].n_vocab == 51866
    # Asymmetric encoder/decoder depths (turbo + distil-whisper family).
    turbo = WHISPER_PRESETS["large-v3-turbo"]
    assert turbo.n_audio_layer == 32 and turbo.n_text_layer == 4
    distil = WHISPER_PRESETS["distil-large-v3"]
    assert distil.n_audio_layer == 32 and distil.n_text_layer == 2
    assert distil.n_mels == 128 and distil.n_vocab == 51866
    assert WHISPER_PRESETS["distil-small.en"].n_vocab == 51864


def test_session_config_roundtrip(tmp_path: Path):
    root = tmp_path / "sessions"
    sess = root / "main"
    sess.mkdir(parents=True)
    (sess / "config.toml").write_text(DEFAULT_SESSION_TOML)

    cfg = load_session_config("main", sessions_root=root)
    assert isinstance(cfg, SessionConfig)
    assert cfg.yoho.dims == 384
    assert cfg.hyperparameters.transcribe_pretrain.accumulated_batches == 16
    # Weight paths are re-rooted into the session dir
    # (parity: train/utils/config.py:84-88).
    assert cfg.weights.tokenizer == sess / "weights/tokenizer.model"
    assert cfg.path == sess


def test_session_config_missing(tmp_path: Path):
    import pytest

    with pytest.raises(FileNotFoundError):
        load_session_config("nope", sessions_root=tmp_path)
