import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.nn.layers import (
    GroupedQueryAttention,
    KVCache,
    SwiGLU,
    apply_rope,
    causal_mask,
    rope_angles,
)
from yoho_tpu.nn.yoho import YOHOModel


def _tiny_cfg():
    return YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=16, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=2,
    )


def test_rope_rotation_properties():
    # Norm preservation + relative-position property: <R(p)q, R(p+k)v>
    # depends only on k.
    g = np.random.default_rng(0)
    d = 8
    x = jnp.asarray(g.standard_normal((1, 6, 2, d)).astype(np.float32))
    cos, sin = rope_angles(jnp.arange(6), d)
    rx = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rx), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )

    q = jnp.asarray(g.standard_normal((1, 1, 1, d)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((1, 1, 1, d)).astype(np.float32))

    def dot_at(pq, pk):
        cq, sq = rope_angles(jnp.asarray([pq]), d)
        ck, sk = rope_angles(jnp.asarray([pk]), d)
        return float(jnp.sum(apply_rope(q, cq, sq) * apply_rope(k, ck, sk)))

    assert abs(dot_at(3, 5) - dot_at(10, 12)) < 1e-4
    assert abs(dot_at(3, 5) - dot_at(3, 6)) > 1e-6  # sanity: not constant


def test_rope_decade_matches_reference_complex_form():
    """The 'decade' variant reproduces the reference's complex-multiply RoPE
    (yoho/src/nn/layers.py:26-43) for its (seq, dim) layout."""
    g = np.random.default_rng(1)
    seq_len, dim = 5, 6
    x = g.standard_normal((seq_len, dim)).astype(np.float32)

    thetas = 10.0 ** -np.arange(dim // 2)
    angles = np.exp(1j * np.outer(np.arange(1, seq_len + 1), thetas))
    xc = x[:, 0::2] + 1j * x[:, 1::2]
    xr = xc * angles
    expected = np.empty_like(x)
    expected[:, 0::2] = xr.real
    expected[:, 1::2] = xr.imag

    cos, sin = rope_angles(jnp.arange(seq_len), dim, variant="decade")
    got = apply_rope(jnp.asarray(x)[:, None, :], cos, sin)[:, 0]
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_gqa_mha_limit_matches_naive():
    """With kv_heads == q_heads and no RoPE effect removed, GQA == naive MHA
    computed by hand from the same projections."""
    g = np.random.default_rng(2)
    mod = GroupedQueryAttention(q_heads=2, dims=8, kv_heads=2)
    x = jnp.asarray(g.standard_normal((1, 5, 8)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)

    p = variables["params"]
    q = np.einsum("bsd,dhk->bshk", x, p["q_proj"]["kernel"])
    k = np.einsum("bsd,dhk->bshk", x, p["k_proj"]["kernel"])
    v = np.einsum("bsd,dhk->bshk", x, p["v_proj"]["kernel"])
    cos, sin = rope_angles(jnp.arange(5), 4)
    q = np.asarray(apply_rope(jnp.asarray(q), cos, sin))
    k = np.asarray(apply_rope(jnp.asarray(k), cos, sin))
    scores = np.einsum("bshk,bthk->bhst", q, k) / 2.0  # sqrt(head_dim)=2
    w = np.asarray(jax.nn.softmax(jnp.asarray(scores), axis=-1))
    o = np.einsum("bhst,bthk->bshk", w, v).reshape(1, 5, 8)
    o = o @ np.asarray(p["out_proj"]["kernel"])
    np.testing.assert_allclose(np.asarray(out), o, atol=1e-5)


def test_gqa_groups_do_not_collapse():
    """q_heads=4, kv_heads=2: output must have full q_heads worth of signal —
    the reference's group-summing einsum (layers.py:82) would make outputs of
    the two heads in a group identical pre-projection; standard GQA must not."""
    g = np.random.default_rng(3)
    mod = GroupedQueryAttention(q_heads=4, dims=16, kv_heads=2)
    x = jnp.asarray(g.standard_normal((1, 6, 16)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(variables, x)
    assert out.shape == (1, 6, 16)
    # out_proj kernel must consume q_heads * head_dim = 16 features
    assert variables["params"]["out_proj"]["kernel"].shape == (16, 16)


def test_swiglu_shapes():
    mod = SwiGLU(hidden_dim=12)
    x = jnp.ones((2, 3, 8))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == (2, 3, 8)
    for name in ("gate", "up", "down"):
        assert "bias" not in variables["params"][name]


def test_kv_cache_update():
    # time-minor layout: (batch, kv_heads, head_dim, max_len)
    cache = KVCache.zeros(2, 2, 8, 4, jnp.float32)
    assert cache.k.shape == (2, 2, 4, 8) and cache.max_len == 8
    k_new = jnp.ones((2, 2, 4, 1))
    c2 = cache.update(3, k_new, k_new * 2)
    assert float(c2.k[0, 0, 0, 3]) == 1.0
    assert float(c2.v[0, 0, 0, 3]) == 2.0
    assert float(c2.k[0, 0, 0, 2]) == 0.0


def test_causal_mask():
    m = np.asarray(causal_mask(4, 4))
    assert m.shape == (1, 1, 4, 4)
    assert m[0, 0, 0, 1] == False  # noqa: E712
    assert m[0, 0, 3, 3] == True  # noqa: E712


def test_yoho_model_shapes_and_cache_invariant():
    cfg = _tiny_cfg()
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(4)
    mel = jnp.asarray(g.standard_normal((2, cfg.max_audio_len, cfg.n_mel_bands))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, cfg.max_text_len)))

    # Init through the voiceprint path (superset of __call__'s params).
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)
    logits = model.apply(variables, tokens, mel)
    assert logits.shape == (2, cfg.max_text_len, 64)

    # voiceprint path
    logits2, vp = model.apply(variables, tokens, mel,
                              method=YOHOModel.forward_with_voiceprints)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-5)
    assert vp.shape == (2, cfg.max_text_len, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vp), axis=-1), 1.0, atol=1e-3)

    # cached decode == full recompute
    xa = model.apply(variables, mel, method=YOHOModel.encode_audio)
    assert xa.shape == (2, cfg.max_audio_len // 2, cfg.dims)
    full = model.apply(variables, tokens[:, :6], xa, method=YOHOModel.decode_text)
    cross_kvs = model.apply(variables, xa, method=YOHOModel.cross_kvs)
    caches = model.apply(variables, 2, jnp.float32, method=YOHOModel.init_caches)
    outs = []
    for i in range(6):
        step, _vp, caches = model.apply(
            variables, tokens[:, i : i + 1], caches, cross_kvs, i,
            method=YOHOModel.decode_step,
        )
        outs.append(np.asarray(step)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full), atol=2e-4)


def test_quantized_kv_close_to_exact():
    from yoho_tpu.nn.layers import _attend, _attend_quantized, quantize_kv

    g = np.random.default_rng(7)
    B, H, D, T, S = 2, 3, 16, 32, 1
    q = jnp.asarray(g.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((B, H, D, T)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((B, H, D, T)).astype(np.float32))

    exact = _attend(q, k, v, None, jnp.float32)
    quant = _attend_quantized(q, quantize_kv(k, v), None, jnp.float32)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(exact),
                               atol=5e-2, rtol=5e-2)
    # int8 storage really is int8
    qkv = quantize_kv(k, v)
    assert qkv.k_q.dtype == jnp.int8 and qkv.v_q.dtype == jnp.int8
    assert qkv.k_scale.shape == (B, H, 1, T)
