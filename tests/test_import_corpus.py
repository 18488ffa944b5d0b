"""yoho import-corpus: public corpus layouts -> the SRT training layout.

The reference ships no corpus tooling (its dataloader assumes
dir-of-SRT+mp3 already exists, ``train/utils/dataloaders.py:36,53``);
this importer is framework-owned. Tests build miniature CommonVoice /
LibriSpeech / LJSpeech / generic-CSV trees and assert the output feeds
``TranscriptionDataloader`` and ``yoho evaluate``'s ``collect_pairs``.
"""

import datetime as dt
import wave

import numpy as np
import pytest

from yoho_tpu.cli.import_corpus import (
    detect_format,
    import_corpus,
    main,
    probe_duration,
)


def _write_wav(path, seconds=0.5, rate=16000, freq=440.0):
    n = int(seconds * rate)
    tone = (0.3 * np.sin(2 * np.pi * freq * np.arange(n) / rate)
            * 32767).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(tone.tobytes())
    return path


def _write_flac(path, seconds=0.5, rate=16000):
    from yoho_tpu.audio.io import save_audio

    n = int(seconds * rate)
    tone = (0.3 * np.sin(2 * np.pi * 440.0 * np.arange(n) / rate)
            ).astype(np.float32)
    path.parent.mkdir(parents=True, exist_ok=True)
    save_audio(tone, path, rate)
    return path


def _read_single_srt(path):
    from yoho_tpu.text.srt import parse_srt

    subs = list(parse_srt(path.read_text(encoding="utf-8")))
    assert len(subs) == 1
    return subs[0]


# ---------------------------------------------------------------- probes


def test_probe_duration_wav(tmp_path):
    p = _write_wav(tmp_path / "a.wav", seconds=1.25)
    assert probe_duration(p) == pytest.approx(1.25, abs=1e-6)


def test_probe_duration_flac_header_only(tmp_path):
    p = _write_flac(tmp_path / "a.flac", seconds=0.75)
    assert probe_duration(p) == pytest.approx(0.75, abs=1e-3)


def test_probe_duration_decode_fallback(tmp_path):
    # corrupt wav header -> decode path raises cleanly upstream; a valid
    # file with a non-wav suffix (npy) exercises the decode fallback
    rate = 16000
    audio = np.zeros(rate // 2, np.float32)
    p = tmp_path / "a.npy"
    np.save(p, audio)
    assert probe_duration(p, rate) == pytest.approx(0.5, abs=1e-6)


# ------------------------------------------------------------- formats


def _make_commonvoice(root, n=3):
    (root / "clips").mkdir(parents=True)
    lines = ["client_id\tpath\tsentence\tup_votes"]
    for i in range(n):
        # CommonVoice ships mp3; the importer only probes/links, so the
        # fixture uses wav to keep the test hermetic
        _write_wav(root / "clips" / f"cv{i}.wav", seconds=0.3 + 0.1 * i)
        lines.append(f"spk{i % 2}\tcv{i}.wav\tsentence number {i}\t2")
    lines.append("spkX\tmissing.wav\torphan row\t0")  # audio absent
    lines.append("spkY\tcv0.wav\t\t0")  # empty sentence
    (root / "validated.tsv").write_text("\n".join(lines), encoding="utf-8")
    return root


def test_commonvoice_import(tmp_path):
    src = _make_commonvoice(tmp_path / "cv")
    dst = tmp_path / "out"
    stats = import_corpus(src, dst, speakers=True, quiet=True)
    assert stats == {"imported": 3, "skipped": 1, "format": "commonvoice"}

    srts = sorted((dst / "transcripts").glob("*.srt"))
    assert [p.stem for p in srts] == ["cv0", "cv1", "cv2"]
    sub = _read_single_srt(srts[1])
    assert sub.content == "sentence number 1"
    assert sub.start == dt.timedelta(0)
    assert sub.end.total_seconds() == pytest.approx(0.4, abs=1e-3)

    links = sorted((dst / "audio").glob("*.wav"))
    assert [p.stem for p in links] == ["cv0", "cv1", "cv2"]
    assert all(p.is_symlink() for p in links)

    # --speakers: client_id buckets for stage-3 voiceprint training
    assert sorted(p.name for p in (dst / "speakers").iterdir()) == \
        ["spk0", "spk1"]
    assert (dst / "speakers" / "spk0" / "cv0.wav").exists()
    assert (dst / "speakers" / "spk1" / "cv1.wav").exists()


def test_librispeech_import(tmp_path):
    src = tmp_path / "ls" / "19" / "198"
    src.mkdir(parents=True)
    _write_flac(src / "19-198-0000.flac", seconds=0.4)
    _write_flac(src / "19-198-0001.flac", seconds=0.6)
    (src / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO THERE\n19-198-0001 GENERAL KENOBI\n"
        "19-198-0002 NO AUDIO FOR THIS ONE\n", encoding="utf-8")
    dst = tmp_path / "out"
    stats = import_corpus(tmp_path / "ls", dst, quiet=True)
    assert stats["format"] == "librispeech"
    assert stats["imported"] == 2 and stats["skipped"] == 1
    sub = _read_single_srt(dst / "transcripts" / "19-198-0001.srt")
    assert sub.content == "GENERAL KENOBI"
    assert sub.end.total_seconds() == pytest.approx(0.6, abs=1e-3)
    assert (dst / "audio" / "19-198-0000.flac").is_symlink()


def test_librispeech_speaker_ids(tmp_path):
    src = tmp_path / "ls" / "7" / "70"
    src.mkdir(parents=True)
    _write_flac(src / "7-70-0000.flac")
    (src / "7-70.trans.txt").write_text("7-70-0000 HI\n", encoding="utf-8")
    dst = tmp_path / "out"
    import_corpus(tmp_path / "ls", dst, speakers=True, quiet=True)
    assert (dst / "speakers" / "7" / "7-70-0000.flac").exists()


def test_ljspeech_import_prefers_normalized(tmp_path):
    src = tmp_path / "lj"
    _write_wav(src / "wavs" / "LJ001-0001.wav", seconds=0.3)
    _write_wav(src / "wavs" / "LJ001-0002.wav", seconds=0.3)
    (src / "metadata.csv").write_text(
        "LJ001-0001|has 2 nums|has two nums\n"
        "LJ001-0002|only raw text\n", encoding="utf-8")
    dst = tmp_path / "out"
    stats = import_corpus(src, dst, quiet=True)
    assert stats == {"imported": 2, "skipped": 0, "format": "ljspeech"}
    assert _read_single_srt(
        dst / "transcripts" / "LJ001-0001.srt").content == "has two nums"
    assert _read_single_srt(
        dst / "transcripts" / "LJ001-0002.srt").content == "only raw text"


def test_generic_csv_with_speaker_col(tmp_path):
    src = tmp_path / "gen"
    src.mkdir()
    _write_wav(src / "a.wav")
    _write_wav(src / "b.wav")
    (src / "index.csv").write_text(
        "audio,transcript,who\na.wav,first words,alice\n"
        "b.wav,more words,bob\n", encoding="utf-8")
    dst = tmp_path / "out"
    stats = import_corpus(src, dst, fmt="csv", audio_col="audio",
                          text_col="transcript", speaker_col="who",
                          speakers=True, quiet=True)
    assert stats["imported"] == 2
    assert (dst / "speakers" / "alice" / "a.wav").exists()
    assert (dst / "speakers" / "bob" / "b.wav").exists()


def test_duplicate_stems_do_not_overwrite(tmp_path):
    """spk1/utt1.wav + spk2/utt1.wav share a stem; the second pair must
    land under a disambiguated name, not clobber the first."""
    src = tmp_path / "gen"
    src.mkdir()
    _write_wav(src / "spk1" / "utt1.wav")
    _write_wav(src / "spk2" / "utt1.wav")
    (src / "index.csv").write_text(
        "audio,transcript\nspk1/utt1.wav,first speaker\n"
        "spk2/utt1.wav,second speaker\n", encoding="utf-8")
    dst = tmp_path / "out"
    stats = import_corpus(src, dst, fmt="csv", audio_col="audio",
                          text_col="transcript", quiet=True)
    assert stats["imported"] == 2
    srts = sorted((dst / "transcripts").glob("*.srt"), key=lambda p: p.stem)
    assert [p.stem for p in srts] == ["utt1", "utt1-2"]
    assert _read_single_srt(srts[0]).content == "first speaker"
    assert _read_single_srt(srts[1]).content == "second speaker"
    assert len(list((dst / "audio").iterdir())) == 2


def test_speaker_id_cannot_escape_speakers_dir(tmp_path):
    """A hostile/odd speaker id ('../evil', 'a/b') is sanitized into ONE
    path component under dst/speakers — never a traversal."""
    src = tmp_path / "gen"
    src.mkdir()
    _write_wav(src / "a.wav")
    _write_wav(src / "b.wav")
    (src / "index.csv").write_text(
        "audio,transcript,who\na.wav,first words,../evil\n"
        "b.wav,more words,x/y\n", encoding="utf-8")
    dst = tmp_path / "out"
    import_corpus(src, dst, fmt="csv", audio_col="audio",
                  text_col="transcript", speaker_col="who",
                  speakers=True, quiet=True)
    names = sorted(p.name for p in (dst / "speakers").iterdir())
    assert names == [".._evil", "x_y"]
    assert not (tmp_path / "evil").exists() and not (dst / "evil").exists()
    for d in (dst / "speakers").iterdir():
        assert d.parent == dst / "speakers" and d.is_dir()


def test_commonvoice_fallback_skips_invalidated(tmp_path):
    """Without validated.tsv the fallback globs other tables but must
    never ingest invalidated.tsv (community-REJECTED transcripts)."""
    src = tmp_path / "cv"
    (src / "clips").mkdir(parents=True)
    _write_wav(src / "clips" / "good.wav")
    _write_wav(src / "clips" / "bad.wav")
    (src / "train.tsv").write_text(
        "client_id\tpath\tsentence\nspk0\tgood.wav\tkept words\n",
        encoding="utf-8")
    (src / "invalidated.tsv").write_text(
        "client_id\tpath\tsentence\nspk1\tbad.wav\trejected words\n",
        encoding="utf-8")
    dst = tmp_path / "out"
    stats = import_corpus(src, dst, quiet=True)
    assert stats["imported"] == 1
    assert [p.stem for p in (dst / "transcripts").glob("*.srt")] == ["good"]
    # An explicit --tsv still allows deliberate use of any table.
    dst2 = tmp_path / "out2"
    stats2 = import_corpus(src, dst2, tsv="invalidated.tsv", quiet=True)
    assert stats2["imported"] == 1


def test_truncated_flac_header_falls_back_to_decode(tmp_path):
    """A header-damaged FLAC must not blow up the probe with IndexError;
    _flac_duration returns None and probe_duration decodes instead."""
    from yoho_tpu.cli.import_corpus import _flac_duration

    good = _write_flac(tmp_path / "good.flac", seconds=0.5)
    data = good.read_bytes()
    for cut in (4, 6, 20):  # magic only / mid-header / mid-STREAMINFO
        p = tmp_path / f"cut{cut}.flac"
        p.write_bytes(data[:cut])
        assert _flac_duration(p) is None
    # Full decode fallback still yields the true duration for a file
    # whose header claims "unknown length" (total_samples=0 is legal).
    patched = bytearray(data)
    # STREAMINFO total-samples field: bits 108..143 of the block = bytes
    # 21.5..26 of the file (8 magic+header bytes + 13.5 offset); zero the
    # low nibble of byte 21 and bytes 22..25.
    patched[8 + 13] &= 0xF0
    for i in range(14, 18):
        patched[8 + i] = 0
    p = tmp_path / "unknown_len.flac"
    p.write_bytes(bytes(patched))
    assert _flac_duration(p) is None
    assert probe_duration(p) == pytest.approx(0.5, abs=1e-3)


def test_generic_csv_missing_column_errors(tmp_path):
    src = tmp_path / "gen"
    src.mkdir()
    (src / "index.csv").write_text("a,b\n1,2\n", encoding="utf-8")
    with pytest.raises(ValueError, match="lacks column"):
        import_corpus(src, tmp_path / "out", fmt="csv", quiet=True)


# -------------------------------------------------------- CLI + detect


def test_detect_format_unknown_exits(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(SystemExit, match="cannot auto-detect"):
        detect_format(tmp_path / "empty")


def test_cli_main_copy_and_limit(tmp_path, capsys):
    src = _make_commonvoice(tmp_path / "cv")
    dst = tmp_path / "out"
    rc = main([str(src), str(dst), "--copy", "--limit", "2", "-q"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "imported 2 utterances" in out
    links = sorted((dst / "audio").iterdir())
    assert len(links) == 2 and not any(p.is_symlink() for p in links)


# --------------------------------------------- downstream integration


def test_output_feeds_dataloader_and_evaluate(tmp_path):
    """The imported layout is readable by BOTH consumers: the training
    dataloader (transcripts/+audio/) and yoho evaluate's collect_pairs."""
    src = _make_commonvoice(tmp_path / "cv")
    dst = tmp_path / "out"
    import_corpus(src, dst, copy=True, quiet=True)

    from yoho_tpu.cli.evaluate import collect_pairs

    pairs = collect_pairs(dst)
    assert len(pairs) == 3
    assert pairs[0][1] == "sentence number 0"

    from yoho_tpu.text.srt import parse_srt
    from yoho_tpu.train.dataloader import list_audio_files

    audio_files = {p.stem: p for p in list_audio_files(dst / "audio")}
    for srt_path in (dst / "transcripts").glob("*.srt"):
        assert srt_path.stem in audio_files
        subs = list(parse_srt(srt_path.read_text(encoding="utf-8")))
        assert subs[0].end > subs[0].start
