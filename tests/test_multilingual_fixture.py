"""Multilingual + translation exact-text e2e (VERDICT r2 item 6).

The committed whisper_multilingual fixture (built by
``experiments/build_multilingual_fixture.py``) carries two toy languages
('en'/'de' tone-coded clips with real whisper language tokens) and
translate-task targets. These tests pin the multilingual contract the
reference intends (``/root/reference/yoho/src/nn/whisper.py:268-284``)
with EXACT text through the library, the CLI (via the owned HF export
round-trip), and HTTP:

  * audio language auto-detect (``language=None``) — exact transcript +
    detected language + calibrated ``language_probability``;
  * the ``<|translate|>`` task — exact English output for German audio;
  * ``detect_language`` probabilities.
"""

import io
import json
import threading
import urllib.request
import wave
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE = Path(__file__).parent / "fixtures" / "whisper_multilingual"
GOLDEN = json.loads((FIXTURE / "golden.json").read_text())
WORD_IDS = json.loads((FIXTURE / "word_vocab.json").read_text())
CFG = json.loads((FIXTURE / "config.json").read_text())


class _WordBackend:
    def __init__(self, word_ids):
        self.word_ids = {k: int(v) for k, v in word_ids.items()}
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


def _tone_clip(hz: float, n_samples: int) -> np.ndarray:
    audio = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
             ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * hz * np.arange(int(0.25 * 16000)) / 16000)
    audio[800:800 + len(tone)] += tone.astype(np.float32)
    return audio


@pytest.fixture(scope="module")
def setup():
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable
    from yoho_tpu.train.checkpoint import load_params

    cfg = WhisperConfig(**CFG)
    model = Whisper(cfg, dtype=jnp.bfloat16)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=_WordBackend(WORD_IDS))
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), template)
    params = load_params(FIXTURE / "params.msgpack", template)
    assert params is not None
    return cfg, model, {"params": params}, table


def _transcriber(setup, language, task="transcribe", batch_size=1, **kw):
    from yoho_tpu.infer.pipeline import Transcriber

    cfg, model, variables, table = setup
    return Transcriber(model, variables, family="whisper",
                       token_table=table, batch_size=batch_size,
                       timestamps=False, language=language, task=task, **kw)


def test_language_autodetect_exact_text(setup):
    """language=None: each clip transcribes EXACTLY in its own language,
    result.language is the detected code, and language_probability is a
    calibrated (high) softmax mass."""
    cfg = setup[0]
    t = _transcriber(setup, language=None)
    for s in GOLDEN["samples"]:
        res = t.transcribe(_tone_clip(s["tone"], cfg.n_samples))
        assert res.text == s["text"]
        assert res.language == s["language"]
        assert res.language_probability is not None
        assert res.language_probability > 0.9


def test_detect_language_probabilities(setup):
    cfg = setup[0]
    t = _transcriber(setup, language=None)
    for s in GOLDEN["samples"]:
        lang, probs = t.detect_language(_tone_clip(s["tone"], cfg.n_samples))
        assert lang == s["language"]
        assert probs[lang] == pytest.approx(s["language_probability"],
                                            abs=0.02)
        assert abs(sum(probs.values()) - 1.0) < 1e-3


def test_translate_task_exact_text(setup):
    """<|translate|> on the 'German' clips produces the exact English
    targets (and transcribe still produces German)."""
    cfg = setup[0]
    tr = _transcriber(setup, language="de", task="translate")
    de = _transcriber(setup, language="de")
    for s in GOLDEN["samples"]:
        if "translated" not in s:
            continue
        clip = _tone_clip(s["tone"], cfg.n_samples)
        assert tr.transcribe(clip).text == s["translated"]
        assert de.transcribe(clip).text == s["text"]


def test_mixed_language_batch_shares_programs(setup):
    """A mixed en+de batch through transcribe_many: per-request language
    detection routes each clip to its own exact transcript."""
    cfg = setup[0]
    t = _transcriber(setup, language=None, batch_size=2)
    clips = [_tone_clip(s["tone"], cfg.n_samples) for s in GOLDEN["samples"]]
    results = t.transcribe_many(clips)
    for s, res in zip(GOLDEN["samples"], results):
        assert res.text == s["text"]
        assert res.language == s["language"]


def _wav_bytes(clip: np.ndarray) -> bytes:
    pcm = np.clip(clip * 32768, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_http_language_probability_and_translation(setup):
    """HTTP: /transcribe reports detected language + probability; the
    OpenAI translations endpoint returns the exact English text."""
    from yoho_tpu.cli.serve import serve

    cfg = setup[0]
    srv = serve(_transcriber(setup, language=None), port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        for s in GOLDEN["samples"]:
            req = urllib.request.Request(
                base + "/transcribe",
                data=_wav_bytes(_tone_clip(s["tone"], cfg.n_samples)),
                headers={"Content-Type": "audio/wav"}, method="POST")
            with urllib.request.urlopen(req) as r:
                payload = json.load(r)
            assert payload["text"] == s["text"]
            assert payload["language"] == s["language"]
            assert payload["language_probability"] > 0.9
    finally:
        srv.shutdown()

    srv = serve(_transcriber(setup, language="de", task="translate"), port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        for s in GOLDEN["samples"]:
            if "translated" not in s:
                continue
            body = (b"--b\r\nContent-Disposition: form-data; name=\"file\"; "
                    b"filename=\"t.wav\"\r\n\r\n"
                    + _wav_bytes(_tone_clip(s["tone"], cfg.n_samples))
                    + b"\r\n--b--\r\n")
            req = urllib.request.Request(
                base + "/v1/audio/translations", data=body,
                headers={"Content-Type": "multipart/form-data; boundary=b"})
            with urllib.request.urlopen(req) as r:
                assert json.load(r)["text"] == s["translated"]
    finally:
        srv.shutdown()


def test_cli_autodetect_via_hf_export_roundtrip(setup, tmp_path):
    """CLI: export the fixture as an HF checkpoint dir (the owned
    exporter), craft a word-level vocab.json beside it, and run
    ``yoho transcribe --hf ... --language auto`` — exact text + detected
    language land in the per-file JSON."""
    from yoho_tpu.cli.transcribe import main
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.export import export_hf_whisper

    cfg0, _model, variables, _table = setup
    cfg = WhisperConfig(**CFG)
    hf_dir = tmp_path / "hf"
    export_hf_whisper(variables["params"], cfg, hf_dir)
    # Word-level GPT-2-format vocab: decode() maps "Ġword" -> " word"
    # through the byte decoder; empty merges (decode-only is enough for
    # transcription output).
    vocab = {"Ġ" + w: i for w, i in WORD_IDS.items()}
    (hf_dir / "vocab.json").write_text(json.dumps(vocab))
    (hf_dir / "merges.txt").write_text("#version: 0.2\n")

    wavs = []
    for s in GOLDEN["samples"]:
        p = tmp_path / f"tone{s['tone']}.wav"
        p.write_bytes(_wav_bytes(_tone_clip(s["tone"], cfg.n_samples)))
        wavs.append(str(p))
    out = tmp_path / "out"
    assert main([*wavs, "--hf", str(hf_dir), "--language", "auto",
                 "--batch", "1", "--no-timestamps",
                 "--output-dir", str(out)]) == 0
    for s in GOLDEN["samples"]:
        payload = json.loads((out / f"tone{s['tone']}.json").read_text())
        assert payload["text"] == s["text"]
        assert payload["language"] == s["language"]
