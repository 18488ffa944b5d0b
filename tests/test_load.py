"""yoho_tpu.load_transcriber — the one-call library front door."""

from pathlib import Path

import numpy as np
import pytest

import yoho_tpu

FIXROOT = Path(__file__).parent / "fixtures" / "sessions"


def test_load_transcriber_session():
    t = yoho_tpu.load_transcriber(session="tiny", root=str(FIXROOT),
                                  batch=1, speaker_threshold=0.6)
    assert t.family == "yoho"
    assert t.batch_size == 1
    assert t.speaker_threshold == 0.6
    # It transcribes (the committed fixture's golden text path is covered
    # by test_checkpoint_fixture; here just prove the object is live).
    res = t.transcribe(np.zeros(t.model.cfg.n_samples, np.float32))
    assert hasattr(res, "segments")


def test_load_transcriber_argument_errors(tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        yoho_tpu.load_transcriber()
    with pytest.raises(ValueError, match="exactly one"):
        yoho_tpu.load_transcriber(hf="x", session="y")
    with pytest.raises(ValueError, match="whisper-family option"):
        yoho_tpu.load_transcriber(session="tiny", root=str(FIXROOT),
                                  initial_prompt="steer this")
    with pytest.raises(ValueError, match="whisper-family option"):
        yoho_tpu.load_transcriber(session="tiny", root=str(FIXROOT),
                                  task="translate")


def test_load_transcriber_speakers_npz(tmp_path):
    """speakers= accepts an enrollment file path (dim-checked)."""
    from yoho_tpu.infer.diarize import save_enrolled

    bad = tmp_path / "bad.npz"
    save_enrolled(bad, {"alice": np.ones(8, np.float32)})
    with pytest.raises(ValueError, match="dim 8"):
        yoho_tpu.load_transcriber(session="tiny", root=str(FIXROOT),
                                  batch=1, speakers=str(bad))


def test_lazy_attribute_error():
    with pytest.raises(AttributeError):
        yoho_tpu.nope  # noqa: B018
