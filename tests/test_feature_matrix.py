"""Option-combination smokes: serving features must compose.

Each Transcriber option is tested on its own elsewhere; the bugs hide in
the cross-products (prompt-context leak, silence-rule denominators, cache
horizons...). This sweeps a grid of real combinations through short
multi-window audio and checks structural sanity of the results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.infer.pipeline import Transcriber
from yoho_tpu.nn.quantize import quantize_whisper_decoder
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.whisper_tokens import WhisperTokenTable


class _FakeBPE:
    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 150 for c in text]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def convert_ids_to_tokens(self, ids):
        return [" w"] * len(ids)


KW = dict(n_mels=8, n_audio_ctx=16, n_vocab=51865, n_text_ctx=32,
          chunk_seconds=0.32)
CFG_T = WhisperConfig(n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                      n_text_state=32, n_text_head=4, n_text_layer=1, **KW)
CFG_D = WhisperConfig(n_audio_state=16, n_audio_head=2, n_audio_layer=1,
                      n_text_state=16, n_text_head=2, n_text_layer=1, **KW)


@pytest.fixture(scope="module")
def models():
    def init(cfg, seed, **mkw):
        m = Whisper(cfg, **mkw)
        v = Whisper(cfg).init(jax.random.PRNGKey(seed),
                              jnp.zeros((1, cfg.n_frames, cfg.n_mels),
                                        jnp.float32),
                              jnp.zeros((1, 4), jnp.int32))
        return m, v

    t_model, t_vars = init(CFG_T, 0)
    d_model, d_vars = init(CFG_D, 1)
    q_model = Whisper(CFG_T, weights_int8=True)
    q_vars = quantize_whisper_decoder(t_vars)
    # Encoder approximation modes: fast_gelu shares t's tree; encoder_int8
    # gets a quantized-MLP tree (and composes with the int8 decoder).
    from yoho_tpu.nn.quantize import quantize_whisper_encoder

    fg_model = Whisper(CFG_T, fast_gelu=True)
    e8_model = Whisper(CFG_T, encoder_int8=True)
    e8_vars = quantize_whisper_encoder(t_vars)
    e8q_model = Whisper(CFG_T, encoder_int8=True, weights_int8=True)
    e8q_vars = quantize_whisper_decoder(quantize_whisper_encoder(t_vars))
    g = np.random.default_rng(0)
    audio = (0.1 * g.standard_normal(int(CFG_T.n_samples * 2.3))
             ).astype(np.float32)

    # Whisper-family diarization encoder + a matching enrolled voice.
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.voiceprint import VoiceprintEncoder

    vp_cfg = YOHOConfig(n_mel_bands=16, max_audio_len=32, max_text_len=8,
                        dims=32, n_audio_heads=4, n_audio_blocks=1,
                        n_text_heads=4, n_text_blocks=1)
    enc = VoiceprintEncoder(vp_cfg, embedding_dim=16)
    enc_vars = enc.init(jax.random.PRNGKey(7),
                        jnp.zeros((1, vp_cfg.max_audio_len, 16), jnp.float32),
                        jnp.ones((1, vp_cfg.max_audio_len), jnp.float32))
    alice = np.ones(16) / 4.0
    return dict(t=(t_model, t_vars), d=(d_model, d_vars),
                q=(q_model, q_vars), fg=(fg_model, t_vars),
                e8=(e8_model, e8_vars), e8q=(e8q_model, e8q_vars),
                vp=(enc, enc_vars),
                enrolled={"alice": alice}, audio=audio)


def _check(res, chunk_s):
    assert isinstance(res.text, str)
    for seg in res.segments:
        assert 0.0 <= seg.start <= seg.end + 1e-6
        assert all(int(t) >= 0 for t in seg.tokens)


MATRIX = [
    # (label, kwargs-builder)
    ("beam2+int8kv", lambda M: dict(beams=2, quantized_cross_kv=True,
                                    quantized_cache=True)),
    ("beam2+int8weights", lambda M: dict(beams=2, _model="q")),
    ("int4kv+timestamps", lambda M: dict(quantized_cross_kv="int4",
                                         timestamps=True)),
    ("int8weights+int4kv+fallback", lambda M: dict(
        _model="q", quantized_cross_kv="int4", temperatures=(0.0, 0.5))),
    ("draft+int8kv+timestamps", lambda M: dict(
        draft_model=M["d"][0], draft_variables=M["d"][1],
        quantized_cross_kv=True, quantized_cache=True, timestamps=True)),
    ("draft+int8weights", lambda M: dict(
        _model="q", draft_model=M["d"][0], draft_variables=M["d"][1],
        timestamps=False)),
    ("conditioned+draft", lambda M: dict(
        condition_on_previous_text=True,
        draft_model=M["d"][0], draft_variables=M["d"][1])),
    ("conditioned+initialprompt+words", lambda M: dict(
        condition_on_previous_text=True, initial_prompt="known words",
        word_timestamps=True)),
    ("autolang+int8kv", lambda M: dict(language=None,
                                       quantized_cross_kv=True)),
    ("suppress+beam2", lambda M: dict(beams=2,
                                      suppress_tokens=tuple(range(100, 140)))),
    ("beam2+words", lambda M: dict(beams=2, word_timestamps=True)),
    ("vad+int8kv+words", lambda M: dict(vad_filter=True,
                                        quantized_cross_kv=True,
                                        quantized_cache=True,
                                        word_timestamps=True)),
    ("vad+conditioned", lambda M: dict(vad_filter=True,
                                       condition_on_previous_text=True)),
    ("vad+autolang+draft", lambda M: dict(
        vad_filter=True, language=None,
        draft_model=M["d"][0], draft_variables=M["d"][1])),
    ("diarize+speakers+int8kv", lambda M: dict(
        diarize_encoder=M["vp"][0], diarize_variables=M["vp"][1],
        enrolled_speakers=M["enrolled"],
        quantized_cross_kv=True, quantized_cache=True)),
    ("diarize+vad+words", lambda M: dict(
        diarize_encoder=M["vp"][0], diarize_variables=M["vp"][1],
        vad_filter=True, word_timestamps=True)),
    ("diarize+speakers+beam2", lambda M: dict(
        diarize_encoder=M["vp"][0], diarize_variables=M["vp"][1],
        enrolled_speakers=M["enrolled"], beams=2,
        speaker_threshold=0.3)),
    ("diarize+speakers+fallback+int8weights", lambda M: dict(
        _model="q", diarize_encoder=M["vp"][0],
        diarize_variables=M["vp"][1], enrolled_speakers=M["enrolled"],
        temperatures=(0.0, 0.5))),
    ("fastgelu+beam2+int8kv", lambda M: dict(
        _model="fg", beams=2, quantized_cross_kv=True,
        quantized_cache=True)),
    ("int8enc+draft+words", lambda M: dict(
        _model="e8", draft_model=M["d"][0], draft_variables=M["d"][1],
        word_timestamps=True)),
    ("int8enc+int8weights+fallback+autolang", lambda M: dict(
        _model="e8q", temperatures=(0.0, 0.5), language=None)),
]


@pytest.mark.parametrize("label,build", MATRIX, ids=[m[0] for m in MATRIX])
def test_feature_combination(models, label, build):
    kw = build(models)
    which = kw.pop("_model", "t")
    model, variables = models[which]
    table = WhisperTokenTable(multilingual=True, text_backend=_FakeBPE())
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=2, **kw)
    res = t.transcribe(models["audio"])
    _check(res, CFG_T.chunk_seconds)


CONT_MATRIX = [
    ("cont", lambda M: dict()),
    ("cont+int8enc", lambda M: dict(_model="e8")),
    ("cont+fastgelu+int8kv", lambda M: dict(
        _model="fg", quantized_cross_kv=True, quantized_cache=True)),
    ("cont+int8kv", lambda M: dict(quantized_cross_kv=True,
                                   quantized_cache=True)),
    ("cont+fallback", lambda M: dict(temperatures=(0.0, 0.5))),
    ("cont+vad+autolang", lambda M: dict(vad_filter=True, language=None)),
    ("cont+words", lambda M: dict(word_timestamps=True)),
    ("cont+draft", lambda M: dict(
        draft_model=M["d"][0], draft_variables=M["d"][1],
        speculative_gamma=2)),
    ("cont+draft+int8kv", lambda M: dict(
        draft_model=M["d"][0], draft_variables=M["d"][1],
        speculative_gamma=3, quantized_cross_kv=True,
        quantized_cache=True)),
    ("cont+draft+autolang+words", lambda M: dict(
        draft_model=M["d"][0], draft_variables=M["d"][1],
        speculative_gamma=2, language=None, word_timestamps=True)),
]


@pytest.mark.parametrize("label,build", CONT_MATRIX,
                         ids=[m[0] for m in CONT_MATRIX])
def test_continuous_feature_combination(models, label, build):
    """The slot engine (incl. speculative slots) composes with the same
    option grid: every combination decodes through ContinuousBatcher and
    produces a structurally sane result."""
    from yoho_tpu.infer.continuous import ContinuousBatcher

    kw = build(models)
    which = kw.pop("_model", "t")
    table = WhisperTokenTable(multilingual=True, text_backend=_FakeBPE())
    model, variables = models[which]
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=2, **kw)
    batcher = ContinuousBatcher(t, max_batch=2, chunk_tokens=4)
    try:
        res = batcher.submit(models["audio"])
    finally:
        batcher.close()
    _check(res, CFG_T.chunk_seconds)
