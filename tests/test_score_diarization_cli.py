"""score_diarization CLI (RTTM in, DER out)."""

import json

from yoho_tpu.cli.score_diarization import main as score_main
from yoho_tpu.eval.diarization import SpeakerTurn, compose_rttm


def test_score_identical(tmp_path, capsys):
    turns = [SpeakerTurn(0, 10, "a"), SpeakerTurn(10, 20, "b")]
    (tmp_path / "ref.rttm").write_text(compose_rttm(turns, "rec1"))
    (tmp_path / "hyp.rttm").write_text(compose_rttm(turns, "rec1"))
    assert score_main([str(tmp_path / "ref.rttm"), str(tmp_path / "hyp.rttm"),
                       "--json"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["der"] == 0.0
    assert report["recordings"] == {"rec1": 0.0}


def test_score_directories_and_aggregate(tmp_path, capsys):
    ref_dir = tmp_path / "ref"
    hyp_dir = tmp_path / "hyp"
    ref_dir.mkdir()
    hyp_dir.mkdir()
    # rec1 perfect; rec2 missing hypothesis entirely (all miss).
    (ref_dir / "rec1.rttm").write_text(
        compose_rttm([SpeakerTurn(0, 10, "a")], "rec1"))
    (ref_dir / "rec2.rttm").write_text(
        compose_rttm([SpeakerTurn(0, 10, "x")], "rec2"))
    (hyp_dir / "rec1.rttm").write_text(
        compose_rttm([SpeakerTurn(0, 10, "z")], "rec1"))
    assert score_main([str(ref_dir), str(hyp_dir), "--collar", "0",
                       "--json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[-1])
    assert report["recordings"]["rec1"] == 0.0
    assert report["recordings"]["rec2"] == 1.0
    assert report["der"] == 0.5  # 10 error seconds over 20 reference seconds
    assert any("no hypothesis" in line for line in out[:-1])


def test_score_no_reference(tmp_path):
    (tmp_path / "empty.rttm").write_text(";; nothing\n")
    assert score_main([str(tmp_path / "empty.rttm"),
                       str(tmp_path / "empty.rttm")]) == 1


def test_transcribe_cli_rttm_output(tmp_path, monkeypatch, capsys):
    """--rttm DIR writes hypothesis RTTM that the scorer accepts."""
    import yoho_tpu.cli.transcribe as tcli
    from yoho_tpu.infer.longform import Segment
    from yoho_tpu.infer.pipeline import TranscriptionResult

    class StubTranscriber:
        def transcribe(self, f):
            return TranscriptionResult(
                text="hi there",
                segments=[Segment(0.0, 2.0, "hi", speaker=0),
                          Segment(2.0, 4.0, "there", speaker=1)],
                language="en")

    monkeypatch.setattr(tcli, "build_yoho_transcriber",
                        lambda *a, **k: StubTranscriber())
    out_dir = tmp_path / "rttm"
    assert tcli.main(["meeting.wav", "--session", "x",
                      "--rttm", str(out_dir)]) == 0
    written = (out_dir / "meeting.rttm").read_text()
    assert "SPEAKER meeting 1 0.000 2.000" in written
    assert score_main([str(out_dir / "meeting.rttm"),
                       str(out_dir / "meeting.rttm"), "--json"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["der"] == 0.0


def test_transcribe_cli_profile_capture(tmp_path, monkeypatch):
    """--profile DIR wraps transcription in a jax.profiler trace and the
    TensorBoard-compatible artifacts land in DIR."""
    import jax.numpy as jnp

    import yoho_tpu.cli.transcribe as tcli
    from yoho_tpu.infer.pipeline import TranscriptionResult

    class StubTranscriber:
        def transcribe(self, f):
            jnp.square(jnp.arange(8.0)).block_until_ready()  # traced work
            return TranscriptionResult(text="", segments=[], language="en")

    monkeypatch.setattr(tcli, "build_yoho_transcriber",
                        lambda *a, **k: StubTranscriber())
    prof = tmp_path / "trace"
    assert tcli.main(["a.wav", "--session", "x", "--profile", str(prof)]) == 0
    assert prof.exists() and any(prof.rglob("*"))  # trace artifacts written
