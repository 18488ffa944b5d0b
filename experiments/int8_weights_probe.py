"""Probe: does weight-only int8 speed up the B=1 decode step?

At B=1 the decode step is weight-bound (whisper-small: ~230 MB decoder
weights + 80 MB tied-embedding logits per token vs ~28 MB of KV reads).
int8 weight storage halves that traffic IF XLA fuses the int8->bf16
dequant into the matmul instead of materializing a converted copy.

Times a decoder-shaped matmul chain (per layer: 6 attn projections +
4x MLP up/down) plus the vocab logits matmul, bf16 weights vs int8 weights
with per-output-channel scales.

Usage: python experiments/int8_weights_probe.py [model] [batch] [reps]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    cfg = WHISPER_PRESETS[model_name]
    d = cfg.n_text_state
    n_layer = cfg.n_text_layer
    vocab = cfg.n_vocab

    key = jax.random.PRNGKey(0)

    def randw(shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, jnp.bfloat16) * 0.02

    Ws = [randw((d, d)) for _ in range(6 * n_layer)]
    W1 = [randw((d, 4 * d)) for _ in range(n_layer)]
    W2 = [randw((4 * d, d)) for _ in range(n_layer)]
    emb = randw((vocab, d))

    def quant(w):
        scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                        keepdims=True) / 127.0
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale.astype(jnp.float32)

    qWs = [quant(w) for w in Ws]
    qW1 = [quant(w) for w in W1]
    qW2 = [quant(w) for w in W2]
    qemb = quant(emb.T)  # (d, vocab) for the logits contraction

    bytes_bf16 = 2 * (len(Ws) * d * d + n_layer * 8 * d * d + vocab * d)
    bytes_int8 = bytes_bf16 // 2

    def timeit(name, fn, carry, consts, bytes_moved):
        def run(carry, consts, n):
            return jax.lax.fori_loop(0, n, lambda _i, c: fn(c, consts), carry)

        jfn = jax.jit(run, static_argnums=2)

        def t(n):
            t0 = time.perf_counter()
            out = jfn(carry, consts, n)
            _ = float(out.reshape(-1)[0])
            return time.perf_counter() - t0

        t(1)
        t1 = min(t(1) for _ in range(3))
        tn = min(t(1 + reps) for _ in range(2))
        dt = max((tn - t1) / reps, 1e-9)
        print(f"{name:40s} {dt * 1e3:8.3f} ms   "
              f"{bytes_moved / dt / 1e9:6.0f} GB/s", flush=True)
        return dt

    x0 = jax.random.normal(key, (batch, d), jnp.bfloat16)

    def chain_bf16(x, consts):
        Ws, W1, W2, emb = consts
        for w in Ws:
            x = x + 0.01 * (x @ w)
        for a, b in zip(W1, W2):
            x = x + 0.01 * (jax.nn.gelu(x @ a, approximate=False) @ b)
        logits = jnp.einsum("bd,vd->bv", x, emb,
                            preferred_element_type=jnp.float32)
        nxt = jnp.argmax(logits, axis=-1)
        return x * 0.999 + 1e-9 * nxt.astype(jnp.bfloat16)[:, None]

    def mm_q(x, wq_scale):
        wq, scale = wq_scale
        y = jnp.einsum("bd,dk->bk", x, wq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)

    def chain_int8(x, consts):
        qWs, qW1, qW2, qemb = consts
        for wq in qWs:
            x = x + 0.01 * mm_q(x, wq)
        for a, b in zip(qW1, qW2):
            x = x + 0.01 * mm_q(jax.nn.gelu(mm_q(x, a), approximate=False), b)
        wq, scale = qemb
        logits = jnp.einsum("bd,dv->bv", x, wq.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * scale
        nxt = jnp.argmax(logits, axis=-1)
        return x * 0.999 + 1e-9 * nxt.astype(jnp.bfloat16)[:, None]

    t16 = timeit("weights bf16", chain_bf16, x0, (Ws, W1, W2, emb),
                 bytes_bf16)
    t8 = timeit("weights int8 (inline dequant)", chain_int8, x0,
                (qWs, qW1, qW2, qemb), bytes_int8)
    print(f"  int8/bf16 speedup: {t16 / t8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
