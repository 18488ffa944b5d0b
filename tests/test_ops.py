"""Pallas kernel tests (interpreter mode on CPU — identical code path to
TPU modulo the compiler)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.audio.frontend import (
    log_mel_spectrogram,
    whisper_log_mel,
    yoho_log_mel,
)
from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.ops.flash_attention import _attention_reference, flash_attention
from yoho_tpu.ops.mel_kernel import (
    fused_log_mel,
    fused_whisper_log_mel,
    fused_yoho_log_mel,
)


# ------------------------------------------------------------ flash attention
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq,tk", [(256, 256), (300, 300), (128, 384)])
def test_flash_attention_matches_reference(causal, tq, tk):
    if causal and tq != tk:
        pytest.skip("causal requires square")
    g = np.random.default_rng(0)
    b, h, d = 2, 2, 64
    q = jnp.asarray(g.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, tk, h, d)).astype(np.float32))

    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)

    scale = 1.0 / np.sqrt(d)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    ref = _attention_reference(qf, kf, vf, causal, scale)
    ref = ref.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_grad_matches_reference():
    g = np.random.default_rng(1)
    b, t, h, d = 1, 128, 2, 32
    q = jnp.asarray(g.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, t, h, d)).astype(np.float32))

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=128,
                                       block_k=128) ** 2)

    def f_ref(q, k, v):
        scale = 1.0 / np.sqrt(d)
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        out = _attention_reference(qf, kf, vf, True, scale)
        return jnp.sum(out ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


# ------------------------------------------------------------------ fused mel
def test_fused_log_mel_whisper_matches_xla():
    g = np.random.default_rng(2)
    audio = (0.2 * g.standard_normal((2, 48_000))).astype(np.float32)
    fused = fused_log_mel(jnp.asarray(audio), convention="whisper",
                          mel_scale="slaney", log_floor=1e-10, tile_f=100)
    xla = log_mel_spectrogram(
        jnp.asarray(audio), sample_rate=16000, n_fft=400, hop=160, n_mels=80,
        mel_scale="slaney", convention="whisper", log_floor=1e-10,
    )
    assert fused.shape == xla.shape == (2, 300, 80)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-4, atol=1e-4)


def test_fused_log_mel_scipy_matches_xla():
    cfg = YOHOConfig(n_mel_bands=32, max_audio_len=128)
    g = np.random.default_rng(3)
    audio = (0.2 * g.standard_normal((1, cfg.n_samples))).astype(np.float32)
    fused = fused_yoho_log_mel(jnp.asarray(audio), cfg)
    xla = yoho_log_mel(jnp.asarray(audio), cfg)
    assert fused.shape == xla.shape == (1, 128, 32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-3, atol=2e-3)


def test_fused_whisper_normalized_matches_xla():
    g = np.random.default_rng(4)
    audio = (0.1 * g.standard_normal((1, 480_000))).astype(np.float32)
    fused = fused_whisper_log_mel(jnp.asarray(audio))
    xla = whisper_log_mel(jnp.asarray(audio))
    assert fused.shape == xla.shape == (1, 3000, 80)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-3, atol=2e-3)


def test_fused_frontends_reject_wrong_rank_like_xla():
    """The fused drop-ins must reject non-(batch, n_samples) audio with
    the same ValueError as the XLA frontends (ADVICE r4): silently
    reshaping a 1-D waveform or a nested batch diverges from the
    functions they are documented drop-ins for."""
    import pytest

    cfg = YOHOConfig(n_mel_bands=32, max_audio_len=128)
    for bad in (np.zeros(16_000, np.float32),
                np.zeros((2, 3, 16_000), np.float32)):
        with pytest.raises(ValueError, match="batch, n_samples"):
            fused_whisper_log_mel(jnp.asarray(bad))
        with pytest.raises(ValueError, match="batch, n_samples"):
            fused_yoho_log_mel(jnp.asarray(bad), cfg)


# ------------------------------------------------------- fused decode attention
def _quantize_ref(x):
    import numpy as np
    scale = np.abs(x).max(axis=2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(x / scale), -127, 127)
    return q.astype(np.int8), scale.astype(np.float32)


@pytest.mark.parametrize("s,kv_len", [(1, 384), (1, 300), (4, 384)])
def test_fused_decode_attention_cross_matches_xla(s, kv_len):
    """Quantized cross-attention (bidirectional over valid prefix)."""
    from yoho_tpu.nn.layers import QuantizedKV, _attend_quantized
    from yoho_tpu.ops.decode_attention import fused_decode_attention

    g = np.random.default_rng(10)
    b, h, d, t = 2, 3, 64, 384
    q = jnp.asarray(g.standard_normal((b, h, s, d)).astype(np.float32), jnp.bfloat16)
    k = g.standard_normal((b, h, d, t)).astype(np.float32)
    v = g.standard_normal((b, h, d, t)).astype(np.float32)
    k_q, k_s = _quantize_ref(k)
    v_q, v_s = _quantize_ref(v)

    out = fused_decode_attention(
        q, jnp.asarray(k_q), jnp.asarray(v_q),
        jnp.asarray(k_s, dtype=jnp.bfloat16).reshape(b, h, 1, t),
        jnp.asarray(v_s, dtype=jnp.bfloat16).reshape(b, h, 1, t),
        kv_len=kv_len,
    )

    qkv = QuantizedKV(
        k_q=jnp.asarray(k_q), v_q=jnp.asarray(v_q),
        k_scale=jnp.asarray(k_s, dtype=jnp.bfloat16).reshape(b, h, 1, t),
        v_scale=jnp.asarray(v_s, dtype=jnp.bfloat16).reshape(b, h, 1, t),
    )
    mask = (jnp.arange(t) < kv_len)[None, None, None, :]
    ref = _attend_quantized(q, qkv, mask, jnp.bfloat16)
    assert out.shape == ref.shape == (b, s, h, d)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.02,
    )


@pytest.mark.parametrize("pos", [0, 5, 250])
def test_fused_decode_attention_causal_matches_xla(pos):
    """Quantized self-attention decode step (causal at dynamic offset)."""
    from yoho_tpu.nn.layers import QuantizedKV, _attend_quantized, decode_mask
    from yoho_tpu.ops.decode_attention import fused_decode_attention

    g = np.random.default_rng(11)
    b, h, d, t, s = 2, 2, 64, 256, 1
    q = jnp.asarray(g.standard_normal((b, h, s, d)).astype(np.float32), jnp.bfloat16)
    k = g.standard_normal((b, h, d, t)).astype(np.float32)
    v = g.standard_normal((b, h, d, t)).astype(np.float32)
    k_q, k_s = _quantize_ref(k)
    v_q, v_s = _quantize_ref(v)
    ks = jnp.asarray(k_s, dtype=jnp.bfloat16).reshape(b, h, 1, t)
    vs = jnp.asarray(v_s, dtype=jnp.bfloat16).reshape(b, h, 1, t)

    out = fused_decode_attention(q, jnp.asarray(k_q), jnp.asarray(v_q), ks, vs,
                                 pos=jnp.int32(pos))

    qkv = QuantizedKV(k_q=jnp.asarray(k_q), v_q=jnp.asarray(v_q),
                      k_scale=ks, v_scale=vs)
    ref = _attend_quantized(q, qkv, decode_mask(t, pos, s), jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_fused_decode_attention_bf16_and_gqa():
    """Unquantized bf16 KV with grouped queries (YOHO GQA decode)."""
    from yoho_tpu.nn.layers import _attend
    from yoho_tpu.ops.decode_attention import fused_decode_attention

    g = np.random.default_rng(12)
    b, hkv, groups, d, t, s = 2, 2, 2, 64, 128, 1
    hq = hkv * groups
    q = jnp.asarray(g.standard_normal((b, hq, s, d)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(g.standard_normal((b, hkv, d, t)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(g.standard_normal((b, hkv, d, t)).astype(np.float32), jnp.bfloat16)
    pos = jnp.int32(63)

    out = fused_decode_attention(q, k, v, pos=pos, groups=groups)

    from yoho_tpu.nn.layers import decode_mask
    k_e = jnp.repeat(k, groups, axis=1)
    v_e = jnp.repeat(v, groups, axis=1)
    ref = _attend(q, k_e, v_e, decode_mask(t, 63, s), jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_fused_decode_attention_int4_matches_xla():
    """Nibble-packed int4 KV: fused kernel == XLA unpack reference."""
    from yoho_tpu.nn.layers import _attend_quantized, quantize_kv4
    from yoho_tpu.ops.decode_attention import fused_decode_attention

    g = np.random.default_rng(13)
    b, h, d, t, s = 2, 3, 64, 300, 1
    q = jnp.asarray(g.standard_normal((b, h, s, d)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(g.standard_normal((b, h, d, t)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, h, d, t)).astype(np.float32))

    qkv = quantize_kv4(k, v, pad_to=128)
    assert qkv.packing == 2 and qkv.kv_len == t
    assert qkv.k_q.shape == (b, h, d // 2, 384) and qkv.k_q.dtype == jnp.uint8

    out = fused_decode_attention(q, qkv.k_q, qkv.v_q, qkv.k_scale,
                                 qkv.v_scale, kv_len=t, packing=2)
    ref = _attend_quantized(q, qkv, None, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_int4_quantization_error_bounded():
    """int4 dequant reconstructs within the absmax/7 step size, and the
    attention output stays close to the exact bf16 result."""
    from yoho_tpu.nn.layers import (
        QuantizedKV, _attend, _attend_quantized, quantize_kv4, unpack_int4,
    )

    g = np.random.default_rng(14)
    b, h, d, t = 1, 2, 64, 128
    k = g.standard_normal((b, h, d, t)).astype(np.float32)
    v = g.standard_normal((b, h, d, t)).astype(np.float32)
    qkv = quantize_kv4(jnp.asarray(k), jnp.asarray(v))

    deq = (np.asarray(unpack_int4(qkv.k_q), np.float32)
           * np.asarray(qkv.k_scale, np.float32))
    step = np.abs(k).max(axis=2, keepdims=True) / 7.0
    assert np.all(np.abs(deq - k) <= step * 0.75 + 1e-6)

    q = jnp.asarray(g.standard_normal((b, h, 1, d)).astype(np.float32) * 0.2,
                    jnp.bfloat16)
    out4 = _attend_quantized(q, qkv, None, jnp.bfloat16)
    exact = _attend(q, jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16),
                    None, jnp.bfloat16)
    err = np.abs(np.asarray(out4, np.float32) - np.asarray(exact, np.float32))
    assert err.mean() < 0.1, err.mean()


def test_w8a8_dense_kernel_matches_fallback():
    """The fused W8A8 kernel (interpret mode on CPU) matches the XLA
    composition within rounding ties: a 1-ulp f32 difference in the
    per-row activation scale between the two compilations can flip an
    int8 round on exact-half values, shifting an output by one weight
    step — everything else is integer-exact."""
    import os

    from yoho_tpu.nn.layers import Int8Dense
    from yoho_tpu.nn.quantize import quantize_dense_params
    from yoho_tpu.ops.w8a8_dense import w8a8_dense

    g = np.random.default_rng(5)
    kernel = g.standard_normal((96, 384)).astype(np.float32) * 0.05
    bias = g.standard_normal((384,)).astype(np.float32)
    x = jnp.asarray(g.standard_normal((3, 70, 96)).astype(np.float32) * 0.7,
                    jnp.bfloat16)
    qp = quantize_dense_params({"kernel": kernel, "bias": bias})

    prev = os.environ.get("YOHO_W8A8_KERNEL")
    os.environ["YOHO_W8A8_KERNEL"] = "off"
    try:
        for act in (None, "gelu_tanh"):
            ref = Int8Dense(384, dtype=jnp.float32, activation=act).apply(
                {"params": qp}, x)
            got = w8a8_dense(x, qp["kernel_q"], qp["kernel_scale"],
                             qp["bias"], activation=act,
                             out_dtype=jnp.float32)
            assert got.shape == ref.shape
            # one weight-step tolerance for round-tie flips
            step = (np.abs(kernel).max(axis=0) / 127.0).max()
            err = np.abs(np.asarray(ref) - np.asarray(got))
            assert err.max() <= step * np.abs(x.astype(jnp.float32)).max() \
                * 1.1 + 1e-5, err.max()
            # ...and at serving precision (bf16) the overwhelming
            # majority of entries are identical (f32 exposes sub-bf16
            # last-ulp rescale differences; bf16 rounding hides them)
            rb = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32)
            gb = np.asarray(jnp.asarray(got).astype(jnp.bfloat16), np.float32)
            assert (rb == gb).mean() > 0.98
    finally:
        if prev is None:
            os.environ.pop("YOHO_W8A8_KERNEL", None)
        else:
            os.environ["YOHO_W8A8_KERNEL"] = prev


def test_w8a8_dense_kernel_shapes_and_padding():
    """M padding and adaptive block_n: odd row counts and every whisper
    feature width (384..1280 and 4x expansions) go through the kernel."""
    from yoho_tpu.nn.quantize import quantize_dense_params
    from yoho_tpu.ops.w8a8_dense import w8a8_dense

    g = np.random.default_rng(6)
    for n in (384, 512, 768, 1280):
        kernel = g.standard_normal((64, n)).astype(np.float32) * 0.1
        qp = quantize_dense_params({"kernel": kernel})
        x = jnp.asarray(g.standard_normal((1, 37, 64)).astype(np.float32),
                        jnp.bfloat16)
        out = w8a8_dense(x, qp["kernel_q"], qp["kernel_scale"], None)
        assert out.shape == (1, 37, n)
        assert np.isfinite(np.asarray(out, np.float32)).all()


def test_encoder_int8_forward_through_kernel_matches_fallback():
    """Whisper(encoder_int8=True) end to end: the forced-on kernel path
    (interpret) tracks the XLA fallback closely at the encoder output."""
    import os

    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.quantize import quantize_whisper_encoder
    from yoho_tpu.nn.whisper import Whisper

    cfg = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=128, n_audio_head=4,
        n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=128,
        n_text_head=4, n_text_layer=1,
    )
    g = np.random.default_rng(7)
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    model = Whisper(cfg)
    variables = model.init(jax.random.PRNGKey(0), mel,
                           jnp.zeros((2, 4), jnp.int32))
    q_model = Whisper(cfg, encoder_int8=True)
    q_vars = quantize_whisper_encoder(variables)

    outs = {}
    prev = os.environ.get("YOHO_W8A8_KERNEL")
    try:
        for mode in ("off", "on"):
            os.environ["YOHO_W8A8_KERNEL"] = mode
            outs[mode] = np.asarray(
                q_model.apply(q_vars, mel, method=Whisper.encode_audio),
                np.float32)
    finally:
        if prev is None:
            os.environ.pop("YOHO_W8A8_KERNEL", None)
        else:
            os.environ["YOHO_W8A8_KERNEL"] = prev
    np.testing.assert_allclose(outs["on"], outs["off"], rtol=0.05,
                               atol=0.05)
