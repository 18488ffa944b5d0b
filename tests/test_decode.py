"""Decode-loop tests: the jitted while_loop decode must equal the naive
full-recompute greedy loop (the reference's loop is the executable spec,
SURVEY.md §4), and beam search must dominate greedy in sequence logprob."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.infer.beam import beam_search, tile_beams
from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn
from yoho_tpu.nn.whisper import Whisper

EOT = 7  # arbitrary small id in the toy vocab


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=4, n_audio_layer=2,
        n_vocab=50, n_text_ctx=24, n_text_state=32, n_text_head=4, n_text_layer=2,
    )
    model = Whisper(cfg)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((3, cfg.n_audio_ctx * 2, cfg.n_mels))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, cfg.n_vocab, size=(3, 4)))
    variables = model.init(jax.random.PRNGKey(0), mel, tokens)
    xa = model.apply(variables, mel, method=Whisper.encode_audio)
    return cfg, model, variables, mel, xa


def _naive_greedy(model, variables, xa, prompt, max_len, eot):
    """Reference-style loop: full decoder recompute every step."""
    b, p = prompt.shape
    buf = np.full((b, max_len), eot, np.int32)
    buf[:, :p] = np.asarray(prompt)
    finished = np.zeros(b, bool)
    pos = p
    while pos < max_len and not finished.all():
        logits = model.apply(variables, jnp.asarray(buf[:, :pos]), xa,
                             method=Whisper.decode_text)
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1)).astype(np.int32)
        nxt = np.where(finished, eot, nxt)
        buf[:, pos] = nxt
        finished |= nxt == eot
        pos += 1
    return buf


def test_jitted_greedy_equals_naive(setup):
    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 3]], jnp.int32)
    max_len = 16

    cross_kvs = model.apply(variables, xa, method=Whisper.cross_kvs)
    caches = model.apply(variables, 3, jnp.float32, method=Whisper.init_caches)
    step_fn = make_whisper_step_fn(model, variables, cross_kvs)

    fn = jax.jit(lambda caches, prompt: greedy_decode(
        step_fn, caches, prompt, max_len, EOT))
    tokens, lengths = fn(caches, prompt)

    expected = _naive_greedy(model, variables, xa, prompt, max_len, EOT)
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    # lengths consistent with buffer content
    for i, L in enumerate(np.asarray(lengths)):
        row = np.asarray(tokens)[i]
        if L < max_len:
            assert row[L - 1] == EOT


def test_greedy_suppress(setup):
    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2]], jnp.int32)
    cross_kvs = model.apply(variables, xa[:1], method=Whisper.cross_kvs)
    caches = model.apply(variables, 1, jnp.float32, method=Whisper.init_caches)
    step_fn = make_whisper_step_fn(model, variables, cross_kvs)

    banned = list(range(10, 50))  # only ids 0..9 allowed
    tokens, _ = greedy_decode(step_fn, caches, prompt, 12, EOT,
                              suppress_ids=tuple(banned))
    out = np.asarray(tokens)[0, 2:]
    assert np.all(out < 10)


def _seq_logprob(model, variables, xa, tokens, lengths, prompt_len):
    """Sum log p(token_i | prefix) over emitted tokens (incl. EOT)."""
    logits = model.apply(variables, jnp.asarray(tokens[:, :-1]), xa,
                         method=Whisper.decode_text)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    total = np.zeros(tokens.shape[0])
    for i in range(tokens.shape[0]):
        for t in range(prompt_len, int(lengths[i])):
            total[i] += logp[i, t - 1, tokens[i, t]]
    return total


def test_beam1_equals_greedy(setup):
    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 3]], jnp.int32)
    max_len = 14

    cross_kvs = model.apply(variables, xa, method=Whisper.cross_kvs)
    step_fn = make_whisper_step_fn(model, variables, cross_kvs)
    caches = model.apply(variables, 3, jnp.float32, method=Whisper.init_caches)
    g_tokens, g_lengths = greedy_decode(step_fn, caches, prompt, max_len, EOT)

    ckv1 = tile_beams(cross_kvs, 1)
    step1 = make_whisper_step_fn(model, variables, ckv1)
    caches1 = model.apply(variables, 3, jnp.float32, method=Whisper.init_caches)
    b_tokens, b_lengths, _ = beam_search(step1, caches1, prompt, max_len, EOT, beams=1)

    np.testing.assert_array_equal(np.asarray(g_tokens), np.asarray(b_tokens))
    np.testing.assert_array_equal(np.asarray(g_lengths), np.asarray(b_lengths))


def test_beam_dominates_greedy_logprob(setup):
    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2], [4, 2], [1, 3]], jnp.int32)
    max_len = 14
    k = 4

    cross_kvs = model.apply(variables, xa, method=Whisper.cross_kvs)
    step_fn = make_whisper_step_fn(model, variables, cross_kvs)
    caches = model.apply(variables, 3, jnp.float32, method=Whisper.init_caches)
    g_tokens, g_lengths = greedy_decode(step_fn, caches, prompt, max_len, EOT)

    ckv = tile_beams(cross_kvs, k)
    stepk = make_whisper_step_fn(model, variables, ckv)
    cachesk = model.apply(variables, 3 * k, jnp.float32, method=Whisper.init_caches)
    b_tokens, b_lengths, b_scores = beam_search(
        stepk, cachesk, prompt, max_len, EOT, beams=k, length_penalty=0.0
    )

    g_lp = _seq_logprob(model, variables, xa, np.asarray(g_tokens),
                        np.asarray(g_lengths), 2)
    b_lp = _seq_logprob(model, variables, xa, np.asarray(b_tokens),
                        np.asarray(b_lengths), 2)
    assert np.all(b_lp >= g_lp - 1e-4)
    # returned scores agree with recomputed sequence logprob (lp=0 -> raw)
    np.testing.assert_allclose(b_lp, np.asarray(b_scores), atol=1e-3)


def test_fused_decode_path_matches_xla(setup, monkeypatch):
    """Whole greedy decode through the fused Pallas kernel (forced interpret
    mode off-TPU) vs the XLA path: identical transcripts, int8 caches."""
    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 3]], jnp.int32)
    max_len = 16

    def run():
        cross_kvs = model.apply(variables, xa, True, method=Whisper.cross_kvs)
        caches = model.apply(variables, 3, jnp.float32, 128, True,
                             method=Whisper.init_caches)
        step_fn = make_whisper_step_fn(model, variables, cross_kvs)
        return greedy_decode(step_fn, caches, prompt, max_len, EOT)

    monkeypatch.setenv("YOHO_FUSED_DECODE", "0")
    tokens_xla, lengths_xla = jax.jit(run)()
    monkeypatch.setenv("YOHO_FUSED_DECODE", "force")
    tokens_fused, lengths_fused = jax.jit(run)()

    np.testing.assert_array_equal(np.asarray(tokens_xla),
                                  np.asarray(tokens_fused))
    np.testing.assert_array_equal(np.asarray(lengths_xla),
                                  np.asarray(lengths_fused))


def test_beam_search_with_quantized_cross_kv(setup):
    """Beam search over int8 (padded, kv_len-masked) cross-KV: structure
    survives tile_beams (static fields preserved) and beam=1 == greedy."""
    from yoho_tpu.infer.beam import beam_search, tile_beams
    from yoho_tpu.nn.layers import QuantizedKV

    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2], [1, 3]], jnp.int32)
    max_len = 12

    def run(k):
        ckv = model.apply(variables, xa[:2], True, method=Whisper.cross_kvs)
        assert isinstance(ckv[0], QuantizedKV)
        assert ckv[0].kv_len in (None, cfg.n_audio_ctx)
        tiled = tile_beams(ckv, k)
        assert tiled[0].kv_len == ckv[0].kv_len  # static field preserved
        caches = model.apply(variables, 2 * k, jnp.float32, 128, True,
                             method=Whisper.init_caches)
        from yoho_tpu.infer.decode import make_whisper_step_fn

        step = make_whisper_step_fn(model, variables, tiled)
        return beam_search(step, caches, prompt, max_len, EOT, beams=k)

    tokens1, lengths1, _ = jax.jit(lambda: run(1))()
    tokens2, lengths2, _ = jax.jit(lambda: run(2))()
    assert tokens1.shape == (2, max_len) and tokens2.shape == (2, max_len)

    # beam=1 must equal plain greedy over the same quantized KV.
    ckv = model.apply(variables, xa[:2], True, method=Whisper.cross_kvs)
    caches = model.apply(variables, 2, jnp.float32, 128, True,
                         method=Whisper.init_caches)
    step = make_whisper_step_fn(model, variables, ckv)
    tokens_g, _ = jax.jit(lambda: greedy_decode(
        step, caches, prompt, max_len, EOT))()
    np.testing.assert_array_equal(np.asarray(tokens1), np.asarray(tokens_g))


def test_beam_aux_quality_signals(setup):
    """Beam search with return_aux reports the RAW cumulative logprob of
    the winning beam (recomputable by teacher-forcing) and a no-speech
    probability in [0, 1]."""
    cfg, model, variables, mel, xa = setup
    prompt = jnp.asarray([[1, 2], [4, 2], [1, 3]], jnp.int32)
    max_len = 14
    k = 3

    cross_kvs = model.apply(variables, xa, method=Whisper.cross_kvs)
    ckv = tile_beams(cross_kvs, k)
    stepk = make_whisper_step_fn(model, variables, ckv)
    cachesk = model.apply(variables, 3 * k, jnp.float32, method=Whisper.init_caches)
    tokens, lengths, scores, aux = beam_search(
        stepk, cachesk, prompt, max_len, EOT, beams=k, length_penalty=0.7,
        return_aux=True, no_speech_id=5,
    )
    raw = _seq_logprob(model, variables, xa, np.asarray(tokens),
                       np.asarray(lengths), 2)
    np.testing.assert_allclose(np.asarray(aux["sum_logprob"]), raw, atol=1e-3)
    ns = np.asarray(aux["no_speech_prob"])
    assert ns.shape == (3,) and np.all((ns >= 0) & (ns <= 1))
    # Selection scores are the GNMT penalty over GENERATED length only
    # (prompt excluded — a long conditioning prompt must not collapse
    # the penalty ratio between short and long hypotheses).
    gen = np.asarray(lengths, np.float32) - 2  # prompt length 2
    want = raw / (((5.0 + gen) / 6.0) ** 0.7)
    np.testing.assert_allclose(np.asarray(scores), want, atol=1e-3)
