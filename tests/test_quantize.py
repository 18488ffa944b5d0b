"""Weight-only int8 serving: quantized decoder must track the bf16 model
closely (same greedy transcript on random weights, bounded logit error)
and the param-tree converter must produce exactly the layout the
weights_int8 model expects."""

import numpy as np

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn
from yoho_tpu.nn.quantize import quantize_whisper_decoder
from yoho_tpu.nn.whisper import Whisper

CFG = WhisperConfig(
    n_mels=8, n_audio_ctx=16, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)
EOT = 7


def _setup():
    model = Whisper(CFG)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((2, CFG.n_audio_ctx * 2, CFG.n_mels))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, CFG.n_vocab, size=(2, 4)))
    variables = model.init(jax.random.PRNGKey(0), mel, tokens)
    return model, variables, mel, tokens


def test_converted_tree_matches_expected_structure():
    model, variables, mel, tokens = _setup()
    q_model = Whisper(CFG, weights_int8=True)
    expected = jax.eval_shape(q_model.init, jax.random.PRNGKey(0), mel, tokens)
    got = quantize_whisper_decoder(variables)

    exp_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(expected)}
    got_paths = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                 jax.tree_util.tree_leaves_with_path(got)}
    assert exp_paths == got_paths


def test_quantized_logits_close_and_greedy_equal():
    model, variables, mel, tokens = _setup()
    q_model = Whisper(CFG, weights_int8=True)
    q_vars = quantize_whisper_decoder(variables)

    ref = model.apply(variables, mel, tokens)
    got = q_model.apply(q_vars, mel, tokens)
    ref_n = np.asarray(ref, np.float32)
    got_n = np.asarray(got, np.float32)
    # Per-position cosine similarity of logits stays near 1.
    cos = (np.sum(ref_n * got_n, -1)
           / (np.linalg.norm(ref_n, axis=-1) * np.linalg.norm(got_n, axis=-1)))
    assert cos.min() > 0.999, cos.min()

    # Argmax must agree wherever the decision isn't inside the
    # quantization noise band (random-weight logits are nearly flat, so
    # exact greedy equality would test tie-breaking, not correctness).
    noise = np.abs(ref_n - got_n).max()
    top2 = np.sort(ref_n, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    confident = margin > 4 * noise
    assert confident.any()
    np.testing.assert_array_equal(ref_n.argmax(-1)[confident],
                                  got_n.argmax(-1)[confident])

    # Full cached decode path (cross-KV + caches + while_loop) runs and
    # produces valid shapes with the quantized tree.
    def decode(m, v):
        xa = m.apply(v, mel, method=Whisper.encode_audio)
        ckv = m.apply(v, xa, method=Whisper.cross_kvs)
        caches = m.apply(v, 2, jnp.float32, method=Whisper.init_caches)
        step = make_whisper_step_fn(m, v, ckv)
        prompt = jnp.asarray([[1, 2], [1, 3]], jnp.int32)
        return greedy_decode(step, caches, prompt, 16, EOT)

    t_q, l_q = jax.jit(lambda: decode(q_model, q_vars))()
    assert t_q.shape == (2, 16) and l_q.shape == (2,)

    # And the cached path agrees with the quantized model's own
    # teacher-forced forward (the KV-cache invariant still holds int8).
    xa = q_model.apply(q_vars, mel, method=Whisper.encode_audio)
    full = q_model.apply(q_vars, np.asarray(t_q)[:, :8], xa,
                         method=Whisper.decode_text)
    ckv = q_model.apply(q_vars, xa, method=Whisper.cross_kvs)
    caches = q_model.apply(q_vars, 2, jnp.float32, method=Whisper.init_caches)
    step_logits, _ = q_model.apply(q_vars, jnp.asarray(np.asarray(t_q)[:, :8]),
                                   caches, ckv, 0, method=Whisper.decode_step)
    np.testing.assert_allclose(np.asarray(full, np.float32),
                               np.asarray(step_logits, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_quantization_error_bounded():
    from yoho_tpu.nn.quantize import quantize_dense_params

    g = np.random.default_rng(1)
    kernel = g.standard_normal((64, 32)).astype(np.float32)
    q = quantize_dense_params({"kernel": kernel})
    deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["kernel_scale"])
    step = np.abs(kernel).max(axis=0, keepdims=True) / 127.0
    assert np.all(np.abs(deq - kernel) <= step * 0.51 + 1e-7)


def test_yoho_quantized_matches_structure_and_logits():
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.quantize import quantize_yoho_decoder
    from yoho_tpu.nn.yoho import YOHOModel

    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=16, dims=64,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=2,
    )
    vocab = 96
    model = YOHOModel(cfg, vocab_size=vocab, voiceprint_dim=32)
    q_model = YOHOModel(cfg, vocab_size=vocab, voiceprint_dim=32,
                        weights_int8=True)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((2, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, vocab, size=(2, cfg.max_text_len)))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)

    q_vars = quantize_yoho_decoder(variables)
    expected = jax.eval_shape(
        lambda r, t, m: q_model.init(
            r, t, m, method=YOHOModel.forward_with_voiceprints),
        jax.random.PRNGKey(0), tokens, mel)
    exp_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(expected)}
    got_paths = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                 jax.tree_util.tree_leaves_with_path(q_vars)}
    assert exp_paths == got_paths

    ref, vp_ref = model.apply(variables, tokens, mel,
                              method=YOHOModel.forward_with_voiceprints)
    got, vp_got = q_model.apply(q_vars, tokens, mel,
                                method=YOHOModel.forward_with_voiceprints)
    ref_n, got_n = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    cos = (np.sum(ref_n * got_n, -1)
           / (np.linalg.norm(ref_n, axis=-1) * np.linalg.norm(got_n, axis=-1)))
    assert cos.min() > 0.999, cos.min()
    # Voiceprints stay L2-normalized and close.
    assert np.allclose(np.linalg.norm(np.asarray(vp_got), axis=-1), 1, atol=1e-2)

    # Cached decode path runs with the quantized tree.
    from yoho_tpu.infer.decode import greedy_decode, make_yoho_step_fn

    xa = q_model.apply(q_vars, mel, method=YOHOModel.encode_audio)
    ckv = q_model.apply(q_vars, xa, method=YOHOModel.cross_kvs)
    caches = q_model.apply(q_vars, 2, jnp.float32, method=YOHOModel.init_caches)
    step = make_yoho_step_fn(q_model, q_vars, ckv)
    toks, lens = jax.jit(lambda c: greedy_decode(
        step, c, jnp.asarray([[1], [2]], jnp.int32), 8, 5))(caches)
    assert toks.shape == (2, 8)


def test_quantize_kv_time_major_bit_identical():
    """quantize_kv/quantize_kv4 on (B, T, H, D) inputs with
    time_major=True produce byte-identical codes and scales to the
    time-minor path (absmax is a selection — layout cannot change it)."""
    import numpy as np
    from yoho_tpu.nn.layers import quantize_kv, quantize_kv4

    g = np.random.default_rng(7)
    k_tm = jnp.asarray(g.standard_normal((2, 10, 3, 8)).astype(np.float32))
    v_tm = jnp.asarray(g.standard_normal((2, 10, 3, 8)).astype(np.float32))
    k_mn = jnp.transpose(k_tm, (0, 2, 3, 1))
    v_mn = jnp.transpose(v_tm, (0, 2, 3, 1))

    for fn, pad in ((quantize_kv, None), (quantize_kv, 16),
                    (quantize_kv4, 16)):
        a = fn(k_mn, v_mn, pad_to=pad)
        b = fn(k_tm, v_tm, pad_to=pad, time_major=True)
        np.testing.assert_array_equal(np.asarray(a.k_q), np.asarray(b.k_q))
        np.testing.assert_array_equal(np.asarray(a.v_q), np.asarray(b.v_q))
        assert a.kv_len == b.kv_len
        # scales agree on REAL positions (padding differs: the legacy
        # path quantizes padded zeros -> 1e-8 scale, the time-major path
        # pads the scale tensor with zeros; consumers mask via kv_len)
        t = a.kv_len or a.k_q.shape[3]
        np.testing.assert_array_equal(np.asarray(a.k_scale)[..., :t],
                                      np.asarray(b.k_scale)[..., :t])
        np.testing.assert_array_equal(np.asarray(a.v_scale)[..., :t],
                                      np.asarray(b.v_scale)[..., :t])


def test_encoder_int8_tree_structure_and_accuracy():
    """quantize_whisper_encoder produces exactly the layout
    Whisper(encoder_int8=True) expects, and the W8A8 encoder tracks the
    f32 encoder closely (per-position cosine similarity near 1)."""
    model, variables, mel, tokens = _setup()
    q_model = Whisper(CFG, encoder_int8=True)
    from yoho_tpu.nn.quantize import quantize_whisper_encoder

    q_vars = quantize_whisper_encoder(variables)
    expected = jax.eval_shape(q_model.init, jax.random.PRNGKey(0), mel,
                              tokens)
    exp_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(expected)}
    got_paths = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                 jax.tree_util.tree_leaves_with_path(q_vars)}
    assert exp_paths == got_paths

    ref = model.apply(variables, mel, method=Whisper.encode_audio)
    got = q_model.apply(q_vars, mel, method=Whisper.encode_audio)
    ref_n = np.asarray(ref, np.float32)
    got_n = np.asarray(got, np.float32)
    cos = (np.sum(ref_n * got_n, -1)
           / (np.linalg.norm(ref_n, axis=-1)
              * np.linalg.norm(got_n, axis=-1)))
    assert cos.min() > 0.995, cos.min()

    # Composes with the weight-only decoder scheme (disjoint subtrees):
    # one tree serves Whisper(encoder_int8=True, weights_int8=True).
    both_model = Whisper(CFG, encoder_int8=True, weights_int8=True)
    both_vars = quantize_whisper_decoder(quantize_whisper_encoder(variables))
    expected = jax.eval_shape(both_model.init, jax.random.PRNGKey(0), mel,
                              tokens)
    exp_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(expected)}
    got_paths = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                 jax.tree_util.tree_leaves_with_path(both_vars)}
    assert exp_paths == got_paths
    logits = both_model.apply(both_vars, mel, tokens)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_int8_dense_matches_manual_reference():
    """Int8Dense == the hand-written W8A8 math: per-token activation
    absmax, per-channel kernel scales, int32 accumulation."""
    from yoho_tpu.nn.layers import Int8Dense
    from yoho_tpu.nn.quantize import quantize_dense_params

    g = np.random.default_rng(3)
    kernel = g.standard_normal((16, 8)).astype(np.float32)
    bias = g.standard_normal((8,)).astype(np.float32)
    x = (g.standard_normal((2, 5, 16)) * 3).astype(np.float32)

    qp = quantize_dense_params({"kernel": kernel, "bias": bias})
    layer = Int8Dense(8, dtype=jnp.float32)
    got = layer.apply({"params": qp}, jnp.asarray(x))

    a_scale = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-12)
    a_q = np.clip(np.round(x / a_scale), -127, 127).astype(np.int32)
    k_q = np.asarray(qp["kernel_q"], np.int32)
    want = (a_q @ k_q).astype(np.float32) * a_scale * np.asarray(
        qp["kernel_scale"]) + bias
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-5)
