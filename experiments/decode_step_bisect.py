"""Bisect the decode-step composition overhead.

decode_ablation.py showed components summing to ~6.2 ms while the full
``Whisper.decode_step`` measured far higher. This builds the step up in
stages — (a) attention only, (b) + projections/MLP/LN, (c) + embeddings/
logits/argmax (manual full step), (d) model.apply full step — to localize
where the extra time comes from. Same in-jit chained-repetition timing,
device state as jit arguments.

Usage: python experiments/decode_step_bisect.py [model] [batch] [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.layers import (
        QuantizedKV,
        QuantizedKVCache,
        _attend_quantized,
        decode_mask,
    )
    from yoho_tpu.nn.whisper import Whisper

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    cfg = WHISPER_PRESETS[model_name]
    n_layer = cfg.n_text_layer
    d_model = cfg.n_text_state
    n_head = cfg.n_text_head
    head_dim = d_model // n_head
    t_cross = cfg.n_audio_ctx
    horizon = 256

    key = jax.random.PRNGKey(0)

    def randn(shape, dtype=jnp.bfloat16, scale=0.02):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, dtype) * scale

    ckvs = [
        QuantizedKV(
            k_q=jax.random.randint(jax.random.fold_in(key, i),
                                   (batch, n_head, head_dim, t_cross),
                                   -127, 127, jnp.int8),
            v_q=jax.random.randint(jax.random.fold_in(key, i + 100),
                                   (batch, n_head, head_dim, t_cross),
                                   -127, 127, jnp.int8),
            k_scale=jnp.full((batch, n_head, 1, t_cross), 0.01, jnp.bfloat16),
            v_scale=jnp.full((batch, n_head, 1, t_cross), 0.01, jnp.bfloat16),
        )
        for i in range(n_layer)
    ]
    self_caches = [
        QuantizedKVCache.zeros(batch, n_head, horizon, head_dim)
        for _ in range(n_layer)
    ]
    # per-layer weights: q/k/v/out for self + q/out for cross + fc1/fc2
    wsets = [
        dict(
            wqs=randn((d_model, d_model)), wks=randn((d_model, d_model)),
            wvs=randn((d_model, d_model)), wos=randn((d_model, d_model)),
            wqc=randn((d_model, d_model)), woc=randn((d_model, d_model)),
            w1=randn((d_model, 4 * d_model)), w2=randn((4 * d_model, d_model)),
        )
        for _ in range(n_layer)
    ]
    emb = randn((cfg.n_vocab, d_model))
    pos_emb = randn((cfg.n_text_ctx, d_model))

    def timed_loop(name, fn, carry, consts):
        def run(carry, consts, n):
            return jax.lax.fori_loop(0, n, lambda _i, c: fn(c, consts), carry)

        jfn = jax.jit(run, static_argnums=2)

        def t(n):
            t0 = time.perf_counter()
            out = jfn(carry, consts, n)
            _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        t(1)
        t1 = min(t(1) for _ in range(3))
        tn = min(t(1 + reps) for _ in range(2))
        dt = max((tn - t1) / reps, 1e-9)
        print(f"{name:44s} {dt * 1e3:8.3f} ms/step", flush=True)
        return dt

    scale = head_dim**-0.25

    def to_q(x):
        return x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 1, 3)

    def to_kv(x):
        return x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 3, 1)

    # (a) attention only: self (update+read) + cross per layer
    def step_attn(carry, ckvs):
        x, caches, pos = carry
        new_caches = []
        for cache, ckv in zip(caches, ckvs):
            q = to_q(x) * scale
            nc = cache.update(pos, to_kv(x) * scale, to_kv(x))
            mask = decode_mask(horizon, pos, 1)
            a_self = _attend_quantized(q, nc.as_quantized_kv(), mask,
                                       jnp.bfloat16)
            a_cross = _attend_quantized(q, ckv, None, jnp.bfloat16)
            x = x + (a_self + a_cross).reshape(batch, 1, d_model)
            new_caches.append(nc)
        return x * 0.999, new_caches, (pos + 1) % horizon

    # (b) + projections, MLP, layernorms (manual whisper block math)
    def ln(x):
        m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        return ((x - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

    def step_blocks(carry, consts):
        ckvs, wsets = consts
        x, caches, pos = carry
        new_caches = []
        for cache, ckv, w in zip(caches, ckvs, wsets):
            h = ln(x)
            q = to_q(h @ w["wqs"]) * scale
            k = to_kv(h @ w["wks"]) * scale
            v = to_kv(h @ w["wvs"])
            nc = cache.update(pos, k, v)
            mask = decode_mask(horizon, pos, 1)
            a = _attend_quantized(q, nc.as_quantized_kv(), mask, jnp.bfloat16)
            x = x + a.reshape(batch, 1, d_model) @ w["wos"]
            h = ln(x)
            qc = to_q(h @ w["wqc"]) * scale
            a = _attend_quantized(qc, ckv, None, jnp.bfloat16)
            x = x + a.reshape(batch, 1, d_model) @ w["woc"]
            h = ln(x)
            x = x + jax.nn.gelu(h @ w["w1"], approximate=False) @ w["w2"]
            new_caches.append(nc)
        return x * 0.999, new_caches, (pos + 1) % horizon

    # (c) manual full: token embed + pos embed + blocks + final ln + logits
    def step_manual_full(carry, consts):
        ckvs, wsets, emb, pos_emb = consts
        tok, caches, pos = carry
        x = emb[tok] + jax.lax.dynamic_slice(pos_emb, (pos, 0), (1, d_model))[None]
        x2, new_caches, _ = step_blocks((x, caches, pos), (ckvs, wsets))
        logits = jnp.einsum("bsd,vd->bsv", ln(x2), emb,
                            preferred_element_type=jnp.float32)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return nxt[:, None], new_caches, (pos + 1) % horizon

    # (d) model.apply full step
    model = Whisper(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [
            (jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02).astype(s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else jnp.zeros(s.shape, s.dtype)
            for k, s in zip(keys, leaves)
        ],
    )

    def step_model(carry, consts):
        variables, ckvs = consts
        tok, caches, pos = carry
        logits, new_caches = model.apply(
            variables, tok, caches, ckvs, pos, method=Whisper.decode_step
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return nxt[:, None], new_caches, (pos + 1) % horizon

    x0 = randn((batch, 1, d_model), scale=1.0)
    tok0 = jnp.zeros((batch, 1), jnp.int32)
    p0 = jnp.int32(0)

    timed_loop("(a) attention only", step_attn,
               (x0, self_caches, p0), ckvs)
    timed_loop("(b) + proj/MLP/LN blocks", step_blocks,
               (x0, self_caches, p0), (ckvs, wsets))
    timed_loop("(c) manual full step", step_manual_full,
               (tok0, self_caches, p0), (ckvs, wsets, emb, pos_emb))
    timed_loop("(d) model.apply full step", step_model,
               (tok0, self_caches, p0), (variables, ckvs))


if __name__ == "__main__":
    main()
