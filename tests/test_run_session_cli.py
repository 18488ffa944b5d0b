"""Stage dispatcher + summary CLIs end-to-end (SURVEY.md §3.3/§3.5: the
reference's run_train_session/create_training_session flow) on a
synthetic dataset in tmp_path."""

import wave

import numpy as np
import pytest

from yoho_tpu.cli.create_session import main as create_main
from yoho_tpu.cli.run_session import main as run_main
from yoho_tpu.cli.summary import main as summary_main


@pytest.fixture()
def session_dir(tmp_path):
    """Scaffolded session whose dataset dirs point at 3 synthetic
    wav+srt pairs and whose tokenizer vocab is tiny."""
    data = tmp_path / "data"
    (data / "transcripts").mkdir(parents=True)
    (data / "audio").mkdir()
    g = np.random.default_rng(0)
    for i in range(3):
        sr = 16000
        pcm = (0.1 * g.standard_normal(sr * 4) * 32767).astype(np.int16)
        with wave.open(str(data / "audio" / f"clip{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        (data / "transcripts" / f"clip{i}.srt").write_text(
            "1\n00:00:00,500 --> 00:00:01,800\nhello world\n\n"
            "2\n00:00:02,000 --> 00:00:03,500\nthe quick brown fox\n")

    root = tmp_path / "sessions"
    assert create_main(["s", "--root", str(root)]) == 0
    cfg_path = root / "s" / "config.toml"
    text = cfg_path.read_text()
    text = text.replace("'./asr_dataset/noisy'", f"'{data}'")
    text = text.replace("'./asr_dataset/clean'", f"'{data}'")
    text = text.replace("vocab_size = 16000", "vocab_size = 2048")
    cfg_path.write_text(text)
    return root


def test_run_session_stage0_trains_tokenizer(session_dir, capsys):
    assert run_main(["s", "0", "--root", str(session_dir)]) in (0, None)
    model_path = session_dir / "s" / "weights" / "tokenizer.model"
    assert model_path.exists() and model_path.stat().st_size > 0
    out = capsys.readouterr().out
    assert "vocab_size" in out
    # The corpus was actually found (layout: <dir>/transcripts/*.srt) —
    # an empty-corpus run warns instead of printing a sentence count.
    import re
    assert re.search(r"Trained on \d+ standardized sentences", out), out[-400:]

    # The trained tokenizer round-trips text through the real loader.
    from yoho_tpu.text.tokenizer import YOHOTokenizer

    tok = YOHOTokenizer.load(model_path)
    ids = tok.encode("hello world")
    assert tok.decode(list(ids)) == "hello world"


def test_run_session_rejects_bad_args(session_dir):
    with pytest.raises(SystemExit):
        run_main(["s", "7", "--root", str(session_dir)])  # invalid stage
    with pytest.raises(FileNotFoundError):
        run_main(["nope", "0", "--root", str(session_dir)])


def test_summary_cli_whisper_and_session(capsys):
    assert summary_main(["--whisper", "tiny"]) in (0, None)
    out = capsys.readouterr().out
    assert "tiny" in out.lower() or "param" in out.lower()
