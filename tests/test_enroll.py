"""Speaker enrollment + recognition (``yoho enroll`` / ``--speakers``).

The reference reserves speaker recognition via ``<|voiceprint|>`` slots
(``train/utils/dataloaders.py:193,215-216``) but ships no workflow; here
the full path is tested: embed clips -> save/load enrollment files ->
match diarized clusters to names in the pipeline and through the CLIs.
"""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.infer.diarize import (
    embed_clip,
    load_enrolled,
    name_speakers,
    save_enrolled,
)
from yoho_tpu.infer.longform import Segment

FIXROOT = Path(__file__).parent / "fixtures" / "sessions"


def _seg(voiceprint, speaker):
    return Segment(start=0.0, end=1.0, text="x", voiceprint=voiceprint,
                   speaker=speaker)


def test_name_speakers_clusters_to_enrolled():
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    stranger = np.array([0.0, 0.0, 1.0])
    segs = [
        _seg(a, 0), _seg(a + 0.01, 0),      # cluster 0 == alice
        _seg(b, 1),                          # cluster 1 == bob
        _seg(stranger, 2),                   # unknown voice stays None
        _seg(a, None),                       # unclustered: individual match
        _seg(None, None),                    # no voiceprint at all
    ]
    name_speakers(segs, {"alice": a, "bob": b})
    assert [s.speaker_name for s in segs] == [
        "alice", "alice", "bob", None, "alice", None]


def test_name_speakers_noop_without_enrollment():
    segs = [_seg(np.array([1.0, 0.0]), 0)]
    name_speakers(segs, {})
    assert segs[0].speaker_name is None


def test_speaker_threshold_tunable():
    """The cosine floor is a knob: a moderately similar voice matches at
    the default threshold but not at a strict one (CLI
    --speaker-threshold; Transcriber(speaker_threshold=...))."""
    a = np.array([1.0, 0.0])
    near = np.array([np.cos(0.45), np.sin(0.45)])  # cosine ~0.90
    seg = _seg(near, 0)
    name_speakers([seg], {"alice": a}, threshold=0.95)
    assert seg.speaker_name is None
    name_speakers([seg], {"alice": a}, threshold=0.75)
    assert seg.speaker_name == "alice"

    from yoho_tpu.cli.transcribe import build_yoho_transcriber

    t = build_yoho_transcriber("tiny", str(FIXROOT), beams=0, batch=1,
                               speaker_threshold=0.5)
    assert t.speaker_threshold == 0.5


def test_online_speaker_tracker():
    """Greedy online tracking: ids are stable across calls, a new voice
    opens a new id, near voices join and refine the centroid, and
    enrolled names attach from the CURRENT centroid."""
    from yoho_tpu.infer.diarize import OnlineSpeakerTracker

    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    a2 = np.array([0.95, 0.05, 0.0])  # same voice, slight drift

    tr = OnlineSpeakerTracker(threshold=0.75, enrolled={"alice": a})
    s1, s2 = _seg(a, None), _seg(b, None)
    tr.assign([s1, s2])
    assert (s1.speaker, s2.speaker) == (0, 1)
    assert s1.speaker_name == "alice" and s2.speaker_name is None

    s3, s4 = _seg(a2, None), _seg(None, 5)  # later window; one no-vp seg
    tr.assign([s3, s4])
    assert s3.speaker == 0 and s3.speaker_name == "alice"
    assert s4.speaker is None  # tracker owns the field on streams
    assert tr.n_speakers == 2

    # peek: tentative labels, read-only — a NEW voice gets None and
    # does not mint an id; a known voice matches.
    c = np.array([0.0, 0.0, 1.0])
    p1, p2 = _seg(a2, None), _seg(c, None)
    tr.peek([p1, p2])
    assert p1.speaker == 0 and p1.speaker_name == "alice"
    assert p2.speaker is None
    assert tr.n_speakers == 2  # unchanged


def test_tracker_centroid_is_true_running_mean():
    """The tracked centroid is the normalized MEAN of member unit
    vectors — not a count-rescaled renormalization, which over-weights
    history whenever members disagree."""
    from yoho_tpu.infer.diarize import OnlineSpeakerTracker

    g = np.random.default_rng(0)
    base = np.array([1.0, 0.2, 0.1])
    members = [base + 0.1 * g.standard_normal(3) for _ in range(8)]
    units = [m / np.linalg.norm(m) for m in members]

    tr = OnlineSpeakerTracker(threshold=0.5)
    tr.assign([_seg(m, None) for m in members])
    assert tr.n_speakers == 1
    want = np.mean(np.stack(units), axis=0)
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(tr._centroids()[0], want, atol=1e-12)


def test_streaming_track_speakers_stable_ids():
    """StreamingTranscriber(track_speakers=True) on a yoho model: every
    finalized voiced segment gets a stream-wide id; the id count never
    exceeds distinct voices seen (here: deterministic same-noise windows
    collapse to few speakers, never one id per window)."""
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.infer.streaming import StreamingTranscriber
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.text.tokenizer import train_tokenizer

    cfg = YOHOConfig(n_mel_bands=16, max_audio_len=32, max_text_len=16,
                     dims=32, n_audio_heads=4, n_audio_blocks=1,
                     n_text_heads=4, n_text_blocks=1)
    tok = train_tokenizer(["hello world"] * 3, vocab_size=32 + 3 + 256 + 50,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(g.integers(0, tok.vocab_size, size=(1, cfg.max_text_len))),
        jnp.asarray(g.standard_normal(
            (1, cfg.max_audio_len, cfg.n_mel_bands)).astype(np.float32)),
        method=YOHOModel.forward_with_voiceprints)
    t = Transcriber(model, variables, family="yoho", tokenizer=tok,
                    batch_size=1)

    g = np.random.default_rng(6)
    audio = (0.1 * g.standard_normal(4 * cfg.n_samples)).astype(np.float32)
    stream = StreamingTranscriber(t, track_speakers=True)
    segs = list(stream.push(audio)) + list(stream.flush())
    voiced = [s for s in segs if s.voiceprint is not None]
    assert voiced, "need voiced segments to track"
    assert all(isinstance(s.speaker, int) for s in voiced)
    assert stream._tracker.n_speakers <= len(voiced)


def test_save_load_enrolled_roundtrip(tmp_path):
    enrolled = {"alice": np.arange(4, dtype=np.float32),
                "bob": np.ones(4, np.float32)}
    path = tmp_path / "speakers.npz"
    save_enrolled(path, enrolled)
    back = load_enrolled(path)
    assert sorted(back) == ["alice", "bob"]
    for k in enrolled:
        np.testing.assert_allclose(back[k], enrolled[k])
    with pytest.raises(ValueError):
        save_enrolled(tmp_path / "empty.npz", {})


@pytest.fixture(scope="module")
def vp_encoder():
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.voiceprint import VoiceprintEncoder

    cfg = YOHOConfig(n_mel_bands=16, max_audio_len=32, max_text_len=8,
                     dims=32, n_audio_heads=4, n_audio_blocks=1,
                     n_text_heads=4, n_text_blocks=1)
    enc = VoiceprintEncoder(cfg, embedding_dim=16)
    variables = enc.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, cfg.max_audio_len, 16), jnp.float32),
                         jnp.ones((1, cfg.max_audio_len), jnp.float32))
    return enc, variables


def test_embed_clip_unit_norm_and_window_average(vp_encoder):
    from yoho_tpu.infer.diarize import _span_embedder

    enc, variables = vp_encoder
    n = enc.cfg.n_samples
    g = np.random.default_rng(0)
    clip = 0.1 * g.standard_normal(2 * n + 100).astype(np.float32)

    emb = embed_clip(clip, enc, variables)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)

    # The 100-sample sliver is dropped; result == normalized mean of the
    # two full-window embeddings.
    windows = _span_embedder(enc, variables, 16)([clip[:n], clip[n:2 * n]])
    mean = np.mean(np.stack(windows), axis=0)
    np.testing.assert_allclose(emb, mean / np.linalg.norm(mean), atol=1e-5)

    # A clip shorter than any threshold still embeds (fallback chunk).
    short = embed_clip(clip[:500], enc, variables)
    np.testing.assert_allclose(np.linalg.norm(short), 1.0, atol=1e-5)


def test_whisper_family_recognition_names_segments():
    """Post-pass diarization + enrolled_speakers: segments gain the
    enrolled name whose voiceprint matches their cluster centroid."""
    from yoho_tpu.core.config import WhisperConfig, YOHOConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.voiceprint import VoiceprintEncoder
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    vp_cfg = YOHOConfig(n_mel_bands=16, max_audio_len=32, max_text_len=8,
                        dims=32, n_audio_heads=4, n_audio_blocks=1,
                        n_text_heads=4, n_text_blocks=1)
    enc = VoiceprintEncoder(vp_cfg, embedding_dim=16)
    enc_vars = enc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, vp_cfg.max_audio_len, 16), jnp.float32),
                        jnp.ones((1, vp_cfg.max_audio_len), jnp.float32))
    g = np.random.default_rng(0)
    audio = 0.1 * g.standard_normal(cfg.n_samples * 2).astype(np.float32)

    base = Transcriber(model, variables, family="whisper", token_table=table,
                       batch_size=1, diarize_encoder=enc,
                       diarize_variables=enc_vars)
    ref = base.transcribe(audio)
    assert ref.segments
    cluster0 = [s.voiceprint for s in ref.segments if s.speaker == 0]
    centroid = np.mean(np.stack(cluster0), axis=0)
    enrolled = {"alice": centroid / np.linalg.norm(centroid)}

    named = Transcriber(model, variables, family="whisper",
                        token_table=table, batch_size=1,
                        diarize_encoder=enc, diarize_variables=enc_vars,
                        enrolled_speakers=enrolled)
    res = named.transcribe(audio)
    got = [s.speaker_name for s in res.segments if s.speaker == 0]
    assert got and all(n == "alice" for n in got)


# ---------------------------------------------------------------------------
# CLI e2e on the committed trained tiny YOHO session: enroll from clips,
# then recognize the same voices through `yoho transcribe --speakers`.

SENTS = ["hello world", "good morning", "thank you"]
TONES = [440, 880, 1320]


def _tone_clip(s: int, n_samples: int) -> np.ndarray:
    # Must match experiments/build_checkpoint_fixture.py::tone_clip.
    audio = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
             ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * TONES[s] * np.arange(int(0.25 * 16000))
                        / 16000)
    audio[800:800 + len(tone)] += tone.astype(np.float32)
    return audio


def _write_wav(path, audio, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes())


def test_enroll_cli_then_recognize(tmp_path, capsys):
    from yoho_tpu.cli import enroll, transcribe
    from yoho_tpu.cli.transcribe import build_yoho_transcriber

    n = build_yoho_transcriber("tiny", str(FIXROOT), beams=0,
                               batch=1).model.cfg.n_samples
    clips = []
    for s in range(2):
        p = tmp_path / f"clip{s}.wav"
        _write_wav(p, _tone_clip(s, n))
        clips.append(str(p))

    out = tmp_path / "speakers.npz"
    rc = enroll.main([f"alice={clips[0]}", f"bob={clips[1]}",
                      "--out", str(out),
                      "--session", "tiny", "--root", str(FIXROOT)])
    assert rc == 0
    enrolled = load_enrolled(out)
    assert sorted(enrolled) == ["alice", "bob"]
    for emb in enrolled.values():
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-4)

    # --list prints the names.
    assert enroll.main(["--list", str(out)]) == 0
    listing = capsys.readouterr().out
    assert "alice" in listing and "bob" in listing

    # Recognition: the same clip's cluster matches its enrolled identity
    # exactly (same deterministic embedder), so argmax picks the right
    # name even if the other speaker also clears the threshold.
    rc = transcribe.main([clips[0], "--session", "tiny",
                          "--root", str(FIXROOT),
                          "--speakers", str(out), "--batch", "1", "--json"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # The untrained fixture head makes timestamp-only ghost segments'
    # embeddings noise; the REAL utterance matches its own enrollment
    # exactly (same deterministic embedder -> cosine 1.0 beats bob).
    names = [s["speaker_name"] for s in rec["segments"] if s["text"].strip()]
    assert names == ["alice"]

    # --update merges new names without dropping existing ones.
    rc = enroll.main([f"carol={clips[1]}", "--out", str(out), "--update",
                      "--session", "tiny", "--root", str(FIXROOT)])
    assert rc == 0
    assert sorted(load_enrolled(out)) == ["alice", "bob", "carol"]


def test_enroll_cli_whisper_pairing(tmp_path, capsys):
    """The whisper pairing: `yoho enroll --diarize-session` embeds clips
    with a stage-3 VoiceprintEncoder artifact, and the SAME encoder used
    for post-pass diarization then recognizes the enrolled voice — a
    segment spanning the enrolled clip matches its name exactly (same
    deterministic embedder)."""
    import shutil

    from yoho_tpu.cli import enroll
    from yoho_tpu.core.config import load_session_config
    from yoho_tpu.infer.diarize import diarize_segments
    from yoho_tpu.nn.voiceprint import VoiceprintEncoder
    from yoho_tpu.train.checkpoint import save_params

    sess_root = tmp_path / "sessions"
    shutil.copytree(FIXROOT / "tiny", sess_root / "tiny")
    config = load_session_config("tiny", str(sess_root))
    cfg = config.yoho
    dim = config.hyperparameters.voiceprint_finetune.embedding_dim
    enc = VoiceprintEncoder(cfg, embedding_dim=dim)
    variables = enc.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32),
        jnp.ones((1, cfg.max_audio_len), jnp.float32))
    save_params(config.weights.voiceprint, variables["params"])

    n = cfg.n_samples
    clips = []
    for s in range(2):
        p = tmp_path / f"clip{s}.wav"
        _write_wav(p, _tone_clip(s, n))
        clips.append(str(p))
    out = tmp_path / "speakers.npz"
    rc = enroll.main([f"alice={clips[0]}", f"bob={clips[1]}",
                      "--out", str(out),
                      "--diarize-session", "tiny", "--root", str(sess_root)])
    assert rc == 0
    enrolled = load_enrolled(out)
    assert sorted(enrolled) == ["alice", "bob"]
    assert all(e.shape == (dim,) for e in enrolled.values())

    # Recognition: one segment spanning exactly the enrolled clip.
    audio = _tone_clip(0, n)
    segs = [Segment(start=0.0, end=n / 16000, text="x")]
    diarize_segments(segs, audio, 16000, enc, variables)
    assert segs[0].voiceprint is not None and segs[0].speaker == 0
    name_speakers(segs, enrolled)
    assert segs[0].speaker_name == "alice"


def test_enroll_cli_arg_errors(tmp_path):
    from yoho_tpu.cli import enroll

    with pytest.raises(SystemExit):
        enroll.main(["alice=clip.wav", "--out", "x.npz"])  # no embedder
    with pytest.raises(SystemExit):
        enroll.main(["not-a-pair", "--out", "x.npz", "--session", "tiny",
                     "--root", str(FIXROOT)])
    with pytest.raises(SystemExit):  # duplicate name
        enroll.main(["a=x.wav", "a=y.wav", "--out", "x.npz",
                     "--session", "tiny", "--root", str(FIXROOT)])
    with pytest.raises(SystemExit):  # empty clip list ('a=,')
        enroll.main(["a=,", "--out", "x.npz",
                     "--session", "tiny", "--root", str(FIXROOT)])


def test_identify_speaker_shape_mismatch_is_clear():
    from yoho_tpu.infer.diarize import identify_speaker

    with pytest.raises(ValueError, match="different embedders"):
        identify_speaker(np.ones(8), {"alice": np.ones(16)})


def test_enrolled_dim_mismatch_fails_fast(vp_encoder):
    """A wrong-dimension enrollment file must be rejected at Transcriber
    construction, not crash with a numpy shape error after the decode."""
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    enc, enc_vars = vp_encoder  # embedding_dim=16
    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    with pytest.raises(ValueError, match="dim 8"):
        Transcriber(model, variables, family="whisper",
                    token_table=WhisperTokenTable(multilingual=True),
                    batch_size=1, diarize_encoder=enc,
                    diarize_variables=enc_vars,
                    enrolled_speakers={"alice": np.ones(8, np.float32)})
    with pytest.raises(ValueError, match="needs diarize_encoder"):
        Transcriber(model, variables, family="whisper",
                    token_table=WhisperTokenTable(multilingual=True),
                    batch_size=1,
                    enrolled_speakers={"alice": np.ones(16, np.float32)})


def test_transcribe_speakers_requires_diarize_session(tmp_path):
    """Whisper family without --diarize-session has no voiceprints —
    --speakers must fail fast, not silently never match."""
    from yoho_tpu.cli import transcribe

    enrolled = {"alice": np.ones(4, np.float32)}
    path = tmp_path / "s.npz"
    save_enrolled(path, enrolled)
    wav = tmp_path / "a.wav"
    _write_wav(wav, np.zeros(1600, np.float32))
    with pytest.raises(SystemExit):
        transcribe.main([str(wav), "--hf", "openai/whisper-tiny",
                         "--speakers", str(path)])
