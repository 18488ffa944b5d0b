"""Speaker-attributed WER (cpWER): the joint ASR+diarization metric.

cpWER concatenates each speaker's text into one stream and scores the
minimum-permutation assignment of hypothesis streams to reference
streams — speaker labels are matched by content, not by name (CHiME-6
convention). Golden cases are small enough to verify by hand.
"""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

from yoho_tpu.eval.wer import cp_wer, parse_stm, texts_by_speaker
from yoho_tpu.infer.longform import Segment

FIXROOT = Path(__file__).parent / "fixtures" / "sessions"


def test_cpwer_label_permutation_is_free():
    ref = {"A": "a b", "B": "c d"}
    hyp = {"x": "c d", "y": "a b"}  # swapped names, same content
    rate, st = cp_wer(ref, hyp)
    assert rate == 0.0 and st.hits == 4


def test_cpwer_counts_wrong_attribution():
    # Same words, but one word attributed to the wrong speaker: the word
    # is missing from its true stream (deletion) and extra in the other
    # (insertion) -> 2 errors / 4 ref words.
    ref = {"A": "a b", "B": "c d"}
    hyp = {"A": "a", "B": "b c d"}
    rate, st = cp_wer(ref, hyp)
    assert (st.deletions, st.insertions, st.substitutions) == (1, 1, 0)
    assert rate == pytest.approx(0.5)


def test_cpwer_missing_and_extra_speakers():
    rate, st = cp_wer({"A": "a b c"}, {})  # missed speaker: all deletions
    assert st.deletions == 3 and rate == pytest.approx(1.0)
    rate, st = cp_wer({"A": "a b"}, {"A": "a b", "ghost": "x y z"})
    assert st.insertions == 3  # hallucinated speaker: all insertions
    assert rate == pytest.approx(1.5)


def test_cpwer_unmatched_penalty_in_assignment():
    """The assignment must minimize the TOTAL including unmatched-stream
    penalties: here matching A-x (1 edit) leaves y unmatched (+4), while
    the true optimum matches A-y (3 insertions) leaving x unmatched (+1)
    — 4 errors, not 5. (Regression: rectangular LSA ignored the
    unmatched costs.)"""
    rate, st = cp_wer({"A": "a"}, {"x": "b", "y": "a a a a"})
    assert st.errors == 4 and rate == pytest.approx(4.0)
    assert st.hits == 1  # 'a' matched inside the A-y pairing


def test_cpwer_normalization():
    rate, _ = cp_wer({"A": "Hello, World!"}, {"0": "hello world"})
    assert rate == 0.0


def test_texts_by_speaker_prefers_names():
    segs = [
        Segment(0, 1, "hello", speaker=0, speaker_name="alice"),
        Segment(1, 2, "world", speaker=0, speaker_name="alice"),
        Segment(2, 3, "hi", speaker=1),
        Segment(3, 4, "", speaker=1),          # empty text dropped
        Segment(4, 5, "stray"),                 # no labels -> "unknown"
    ]
    out = texts_by_speaker(segs)
    assert out == {"alice": "hello world", 1: "hi", "unknown": "stray"}


def test_parse_stm():
    data = """;; comment line
file1 1 spkB 4.0 6.0 later words
file1 1 spkA 0.0 2.0 <o,f0,male> hello there
file1 1 spkA 2.0 4.0 ignore_time_segment_in_scoring
file2 1 spkC 0.0 1.0 other file
junk-line
"""
    per_file = parse_stm(data)
    assert per_file == {
        "file1": {"spkA": "hello there", "spkB": "later words"},
        "file2": {"spkC": "other file"},
    }
    # <unk> is the conventional OOV transcript token, NOT a flags block
    # (single-element flags like <o> ARE stripped — see below); and a
    # malformed time field skips the line instead of crashing.
    per_file = parse_stm(
        "f1 1 spkA 0.0 2.0 <unk> he said yes\n"
        "filename channel speaker start end text\n")
    assert per_file == {"f1": {"spkA": "<unk> he said yes"}}
    # Single-element comma-less flag blocks are still flags: keeping
    # "<o>" would add a phantom reference word ("o") per row.
    per_file = parse_stm("f1 1 spkA 0.0 2.0 <o> hello there\n")
    assert per_file == {"f1": {"spkA": "hello there"}}


def test_parse_stm_turns():
    """The same STM yields timed SpeakerTurns for DER scoring."""
    from yoho_tpu.eval.diarization import parse_stm_turns

    turns = parse_stm_turns(
        "f1 1 spkB 4.0 6.0 later words\n"
        "f1 1 spkA 0.0 2.0 hello there\n")
    got = [(t.speaker, t.start, t.end) for t in turns["f1"]]
    assert got == [("spkA", 0.0, 2.0), ("spkB", 4.0, 6.0)]  # time-ordered


# ---------------------------------------------------------------------------
# CLI e2e on the committed trained tiny session: `yoho evaluate --stm`
# scores cpWER 0 when the diarized transcription matches the reference.

def _tone_clip(s: int, n_samples: int) -> np.ndarray:
    TONES = [440, 880, 1320]
    audio = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
             ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * TONES[s] * np.arange(int(0.25 * 16000))
                        / 16000)
    audio[800:800 + len(tone)] += tone.astype(np.float32)
    return audio


def test_evaluate_stm_cli(tmp_path, capsys):
    from yoho_tpu.cli import evaluate
    from yoho_tpu.cli.transcribe import build_yoho_transcriber

    n = build_yoho_transcriber("tiny", str(FIXROOT), beams=0,
                               batch=1).model.cfg.n_samples
    wav = tmp_path / "clip0.wav"
    audio = _tone_clip(0, n)
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes())
    stm = tmp_path / "ref.stm"
    stm.write_text("clip0 1 alice 0.0 1.0 hello world\n", encoding="utf-8")

    rc = evaluate.main([str(tmp_path), "--session", "tiny",
                        "--root", str(FIXROOT), "--stm", str(stm),
                        "--batch", "1", "--json"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["files"] == 1
    assert report["cpwer"] == 0.0
    assert report["ref_speakers"] == 1
    assert "der" in report and report["der"] >= 0.0  # same STM scores DER


def test_evaluate_stm_whisper_requires_diarize_session():
    from yoho_tpu.cli import evaluate

    with pytest.raises(SystemExit):
        evaluate.main(["/tmp", "--hf", "x", "--stm", "ref.stm"])
