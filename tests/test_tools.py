import datetime as dt
import wave

import numpy as np

from yoho_tpu.cli.create_session import main as create_main
from yoho_tpu.cli.plot_metrics import _read_metrics
from yoho_tpu.cli.split_tracks import main as split_main, split_track
from yoho_tpu.text.srt import Subtitle, compose_srt, parse_srt
from yoho_tpu.utils.profiling import Timer, trace


def _sub(i, a, b, text="x"):
    return Subtitle(i, dt.timedelta(seconds=a), dt.timedelta(seconds=b), text)


def test_split_track_never_cuts_speech():
    sr = 100
    audio = np.arange(sr * 20, dtype=np.float32)
    subs = [_sub(1, 1, 2, "a"), _sub(2, 4, 9, "b"), _sub(3, 9.5, 11, "c"),
            _sub(4, 15, 16, "d")]
    chunks = split_track(audio, subs, sr, dt.timedelta(seconds=8))
    # every utterance lands in exactly one chunk, fully inside it
    all_texts = [s.content for _a, ss in chunks for s in ss]
    assert sorted(all_texts) == ["a", "b", "c", "d"]
    for chunk_audio, ss in chunks:
        for s in ss:
            assert s.start >= dt.timedelta(0)
            assert s.end.total_seconds() * sr <= len(chunk_audio) + sr  # within chunk


def test_split_tracks_cli(tmp_path):
    sr = 16000
    src = tmp_path / "src"
    (src / "audio").mkdir(parents=True)
    (src / "transcripts").mkdir()
    audio = (np.random.default_rng(0).standard_normal(sr * 10) * 0.05).astype(np.float32)
    pcm = np.clip(audio * 32768, -32768, 32767).astype(np.int16)
    with wave.open(str(src / "audio" / "a.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    subs = [_sub(1, 0.5, 1.5, "one"), _sub(2, 4, 5, "two"), _sub(3, 8, 9, "three")]
    (src / "transcripts" / "a.srt").write_text(compose_srt(subs))

    dst = tmp_path / "dst"
    split_main([str(src), str(dst), "--approx_duration", "4", "--workers", "1"])
    out_audio = sorted((dst / "audio").iterdir())
    out_srt = sorted((dst / "transcripts").iterdir())
    assert len(out_audio) == len(out_srt) >= 2
    # rebased timestamps start near zero and parse cleanly
    first = list(parse_srt(out_srt[0].read_text()))
    assert first[0].start < dt.timedelta(seconds=4)


def test_read_metrics(tmp_path):
    p = tmp_path / "metrics.csv"
    p.write_text("update,learning_rate,loss,val_loss\n1,0.1,2.0,\n2,0.1,1.5,1.4\n")
    updates, lrs, losses, vu, vl = _read_metrics(p)
    assert updates == [1.0, 2.0]
    assert vl == [1.4] and vu == [2.0]


def test_create_session_cli(tmp_path, capsys):
    assert create_main(["x", "--root", str(tmp_path)]) == 0
    assert create_main(["x", "--root", str(tmp_path)]) == 1  # duplicate


def test_timer_and_trace():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
    with trace(None):  # no-op path
        pass


def test_structured_logger(capsys):
    import io
    from yoho_tpu.utils.logging import StructuredLogger

    buf = io.StringIO()
    log = StructuredLogger("t", stream=buf)
    log.info("update", step=3, loss=1.5)
    import json

    rec = json.loads(buf.getvalue())
    assert rec["event"] == "update" and rec["step"] == 3
    assert rec["level"] == "info" and "ts" in rec


def test_compilation_cache_config(tmp_path, monkeypatch):
    import jax

    from yoho_tpu.utils.platform import enable_compilation_cache

    target = tmp_path / "xla_cache"
    enable_compilation_cache(str(target))
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)
    # Env kill-switch wins over the default path.
    monkeypatch.setenv("YOHO_COMPILE_CACHE", "off")
    other = tmp_path / "nope"
    jax.config.update("jax_compilation_cache_dir", None)
    enable_compilation_cache(str(other))
    assert not other.exists()
    assert jax.config.jax_compilation_cache_dir is None


def test_umbrella_cli_dispatch(tmp_path, capsys):
    """`yoho <command>` dispatches to the per-task CLI mains; every
    advertised command resolves to a module with a main(argv)."""
    import importlib

    from yoho_tpu.cli.__main__ import COMMANDS, main

    assert main([]) == 0
    assert "transcribe" in capsys.readouterr().out
    assert main(["--help"]) == 0
    capsys.readouterr()
    assert main(["definitely-not-a-command"]) == 2
    assert "unknown command" in capsys.readouterr().err
    for mod_name, _desc in COMMANDS.values():
        assert callable(getattr(importlib.import_module(mod_name), "main"))
    # --help must parse for EVERY advertised subcommand (argparse exits 0;
    # catches import rot / broken add_argument wiring across the board).
    import pytest

    for name in COMMANDS:
        with pytest.raises(SystemExit) as e:
            main([name, "--help"])
        assert e.value.code == 0, name
        capsys.readouterr()
    # end-to-end through the dispatcher: create a session
    assert main(["create-session", "disp", "--root", str(tmp_path)]) == 0
    assert (tmp_path / "disp" / "config.toml").exists()


def test_plot_metrics_once_renders_png(tmp_path):
    """--once renders a headless PNG dashboard next to the CSV."""
    import matplotlib

    matplotlib.use("Agg")
    from yoho_tpu.cli.plot_metrics import main as plot_main

    csv = tmp_path / "s" / "stages" / "1" / "metrics.csv"
    csv.parent.mkdir(parents=True)
    csv.write_text("update,learning_rate,loss,val_loss\n"
                   "1,0.001,5.0,\n2,0.0009,4.2,4.5\n3,0.0008,3.9,\n")
    assert plot_main(["s", "1", "--root", str(tmp_path), "--once"]) == 0
    png = csv.with_suffix(".png")
    assert png.exists() and png.stat().st_size > 1000


def test_cache_corpus_cli(tmp_path):
    """`yoho cache-corpus` transcodes an audio dir to FLAC and the
    dataloader's suffix order then prefers the cached file."""
    import wave

    from yoho_tpu.audio.io import load_audio
    from yoho_tpu.cli.cache_corpus import main as cache_main
    from yoho_tpu.train.dataloader import AUDIO_SUFFIXES

    g = np.random.default_rng(0)
    audio_dir = tmp_path / "noisy" / "audio"
    audio_dir.mkdir(parents=True)
    for name in ("a.wav", "b.wav"):
        pcm = (g.standard_normal(16000) * 3000).astype(np.int16)
        with wave.open(str(audio_dir / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())

    assert cache_main([str(tmp_path), "--workers", "1"]) == 0
    for stem in ("a", "b"):
        flac = audio_dir / f"{stem}.flac"
        assert flac.exists()
        # Exact round trip of the original samples.
        np.testing.assert_array_equal(
            load_audio(flac, 16000), load_audio(audio_dir / f"{stem}.wav", 16000))
    # Second run: everything up-to-date (no re-encode).
    assert cache_main([str(tmp_path), "--workers", "1"]) == 0

    # The dataloader resolves .flac ahead of the compressed formats.
    assert AUDIO_SUFFIXES.index(".flac") < AUDIO_SUFFIXES.index(".mp3")
    assert AUDIO_SUFFIXES.index(".npy") < AUDIO_SUFFIXES.index(".flac")
