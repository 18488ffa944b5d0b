"""Whisper activation parity vs HuggingFace torch (random-init, no network).

SURVEY.md §4: per-block parity tests vs HF WhisperModel localize conversion
errors. A randomly initialized HF model exercises the full converter + module
semantics (biases, scales, masks, GELU flavor) without downloads.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yoho_tpu.nn.convert import convert_hf_whisper, hf_config_to_whisper
from yoho_tpu.nn.whisper import Whisper, sinusoids

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.WhisperConfig(
        vocab_size=211,
        num_mel_bins=12,
        d_model=32,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=48,
        max_target_positions=24,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        begin_suppress_tokens=None,
        suppress_tokens=None,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def ours(hf_model):
    cfg = hf_config_to_whisper(hf_model.config)
    params = convert_hf_whisper(hf_model.state_dict(), cfg)
    return Whisper(cfg), {"params": params}, cfg


def test_sinusoids_match_hf(hf_model):
    hf_pos = hf_model.model.encoder.embed_positions.weight.detach().numpy()
    ours = sinusoids(hf_pos.shape[0], hf_pos.shape[1])
    np.testing.assert_allclose(ours, hf_pos, atol=1e-6)


def test_encoder_parity(hf_model, ours):
    model, variables, cfg = ours
    g = np.random.default_rng(0)
    mel = g.standard_normal((2, cfg.n_frames_test if hasattr(cfg, "n_frames_test") else 96,
                             cfg.n_mels)).astype(np.float32)
    mel = mel[:, : cfg.n_audio_ctx * 2]

    with torch.no_grad():
        hf_out = hf_model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()

    out = model.apply(variables, jnp.asarray(mel), method=Whisper.encode_audio)
    np.testing.assert_allclose(np.asarray(out), hf_out, atol=1e-4)


def test_full_logits_parity(hf_model, ours):
    model, variables, cfg = ours
    g = np.random.default_rng(1)
    mel = g.standard_normal((2, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
    tokens = g.integers(0, cfg.n_vocab, size=(2, 8))

    with torch.no_grad():
        hf_logits = hf_model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    logits = model.apply(variables, jnp.asarray(mel), jnp.asarray(tokens))
    # f32 noise from the encoder amplifies through cross-attention; the
    # decoder-only test below pins tight parity on identical inputs.
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=5e-3)


def test_decoder_parity_same_xa(hf_model, ours):
    """Decoder bit-for-bit-ish parity when both sides see the same encoder
    output (isolates decoder semantics from accumulated encoder noise)."""
    model, variables, cfg = ours
    g = np.random.default_rng(5)
    xa = g.standard_normal((2, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32)
    tokens = g.integers(0, cfg.n_vocab, size=(2, 8))

    with torch.no_grad():
        hf_dec = hf_model.model.decoder(
            input_ids=torch.from_numpy(tokens),
            encoder_hidden_states=torch.from_numpy(xa),
        ).last_hidden_state
        hf_logits = (hf_dec @ hf_model.model.decoder.embed_tokens.weight.T).numpy()

    logits = model.apply(variables, jnp.asarray(tokens), jnp.asarray(xa),
                         method=Whisper.decode_text)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-4)


def test_cached_decode_matches_full(ours):
    """KV-cached step-by-step decode == full-sequence recompute.

    This is the executable spec the reference's no-cache loop implies
    (SURVEY.md §4 'decode-loop invariants')."""
    model, variables, cfg = ours
    g = np.random.default_rng(2)
    mel = g.standard_normal((2, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
    tokens = jnp.asarray(g.integers(0, cfg.n_vocab, size=(2, 10)))

    xa = model.apply(variables, jnp.asarray(mel), method=Whisper.encode_audio)
    full_logits = model.apply(variables, tokens, xa, method=Whisper.decode_text)

    cross_kvs = model.apply(variables, xa, method=Whisper.cross_kvs)
    caches = model.apply(variables, 2, jnp.float32, method=Whisper.init_caches)
    step_logits = []
    for i in range(tokens.shape[1]):
        logits, caches = model.apply(
            variables, tokens[:, i : i + 1], caches, cross_kvs, i,
            method=Whisper.decode_step,
        )
        step_logits.append(np.asarray(logits)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=2e-4)


def test_prefill_then_step(ours):
    """Multi-token prefill into the cache == per-token stepping."""
    model, variables, cfg = ours
    g = np.random.default_rng(3)
    mel = g.standard_normal((1, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
    tokens = jnp.asarray(g.integers(0, cfg.n_vocab, size=(1, 6)))

    xa = model.apply(variables, jnp.asarray(mel), method=Whisper.encode_audio)
    cross_kvs = model.apply(variables, xa, method=Whisper.cross_kvs)

    # Prefill 4 tokens at once, then step 2.
    caches = model.apply(variables, 1, jnp.float32, method=Whisper.init_caches)
    logits_p, caches = model.apply(
        variables, tokens[:, :4], caches, cross_kvs, 0, method=Whisper.decode_step
    )
    logits_5, caches = model.apply(
        variables, tokens[:, 4:5], caches, cross_kvs, 4, method=Whisper.decode_step
    )

    full = model.apply(variables, tokens[:, :5], xa, method=Whisper.decode_text)
    np.testing.assert_allclose(np.asarray(logits_p)[:, -1], np.asarray(full)[:, 3], atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_5)[:, 0], np.asarray(full)[:, 4], atol=2e-4)


def test_quantized_cross_kv_decode_agrees(ours):
    """int8 cross-KV decode: argmax-identical on random weights, logits
    close (the serving fast path)."""
    import jax

    model, variables, cfg = ours
    g = np.random.default_rng(9)
    mel = g.standard_normal((2, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
    xa = model.apply(variables, jnp.asarray(mel), method=Whisper.encode_audio)
    ckv = model.apply(variables, xa, method=Whisper.cross_kvs)
    ckv_q = model.apply(variables, xa, True, method=Whisper.cross_kvs)
    tok = jnp.ones((2, 1), jnp.int32)

    caches = model.apply(variables, 2, jnp.float32, method=Whisper.init_caches)
    l_exact, _ = model.apply(variables, tok, caches, ckv, 0,
                             method=Whisper.decode_step)
    caches = model.apply(variables, 2, jnp.float32, method=Whisper.init_caches)
    l_quant, _ = model.apply(variables, tok, caches, ckv_q, 0,
                             method=Whisper.decode_step)
    assert np.array_equal(np.asarray(jnp.argmax(l_exact, -1)),
                          np.asarray(jnp.argmax(l_quant, -1)))
    np.testing.assert_allclose(np.asarray(l_quant), np.asarray(l_exact),
                               atol=5e-2)


def test_quantized_self_cache_decode_agrees(ours):
    """int8 self-attention cache: argmax-identical step-by-step decode."""
    model, variables, cfg = ours
    g = np.random.default_rng(11)
    mel = g.standard_normal((2, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
    xa = model.apply(variables, jnp.asarray(mel), method=Whisper.encode_audio)
    ckv = model.apply(variables, xa, method=Whisper.cross_kvs)
    toks = jnp.asarray(g.integers(0, cfg.n_vocab, size=(2, 6)))

    def run(quantized):
        caches = model.apply(variables, 2, jnp.float32, None, quantized,
                             method=Whisper.init_caches)
        outs = []
        for i in range(6):
            logits, caches = model.apply(variables, toks[:, i:i+1], caches, ckv, i,
                                         method=Whisper.decode_step)
            outs.append(np.asarray(logits)[:, 0])
        return np.stack(outs, 1)

    exact, quant = run(False), run(True)
    assert np.array_equal(exact.argmax(-1), quant.argmax(-1))
    np.testing.assert_allclose(quant, exact, atol=5e-2)
