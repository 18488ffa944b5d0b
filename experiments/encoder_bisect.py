"""Where does the encoder's time go, and can int8 win anywhere in it?

encoder_bench.py measured ~51% MFU for the whole encoder; the W8A8
encoder (Int8Dense everywhere) measured 0.94x — the raw 1.96x int8 MXU
rate (int8_mxu_probe.py) does not survive composition. This bisect
separates the suspects at serving shapes (B windows x 1500 x n_state):

  * MLP stack alone: bf16 vs W8A8 (matmul-dominated — if int8 cannot
    win here it cannot win anywhere in the encoder)
  * attention core alone (qk^T + softmax + av, no projections): the
    (B,H,1500,1500) score tensor is the encoder's biggest intermediate
  * LayerNorm + residual passes alone

Usage: python experiments/encoder_bisect.py [model] [batch] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = WHISPER_PRESETS[model_name]
    D = cfg.n_audio_state
    H = cfg.n_audio_head
    T = cfg.n_audio_ctx
    L = cfg.n_audio_layer
    hd = D // H

    g = np.random.default_rng(0)
    x0 = jnp.asarray(g.standard_normal((batch, T, D)).astype(np.float32) * 0.5,
                     jnp.bfloat16)

    def timeit(name, body, consts, flops=None):
        def run(x, cs, n):
            def loop(_i, c):
                return body(c, cs)

            return jax.lax.fori_loop(0, n, loop, x)

        jfn = jax.jit(run)
        jax.block_until_ready(jfn(x0, consts, 1))

        def timed(n):
            t0 = time.perf_counter()
            out = jfn(x0, consts, n)
            _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max((tk - t1) / reps, 1e-9)
        extra = ""
        if flops:
            extra = f"  {flops / dt / 1e12:6.1f} TFLOP/s"
        print(f"{name:34s} {dt*1e3:9.2f} ms{extra}", flush=True)
        return dt

    # ---- MLP stack: L x (fc1 -> gelu -> fc2), bf16 weights ----
    w1 = jnp.asarray(g.standard_normal((D, 4 * D)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    w2 = jnp.asarray(g.standard_normal((4 * D, D)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    mlp_flops = L * 2 * batch * T * D * 4 * D * 2

    def mlp_bf16(x, cs):
        w1, w2 = cs
        for _ in range(L):
            h = jax.nn.gelu(jnp.dot(x, w1), approximate=False)
            x = (jnp.dot(h, w2) * 1e-1).astype(jnp.bfloat16)
        return x

    t_mlp = timeit("MLP stack bf16", mlp_bf16, (w1, w2), mlp_flops)

    # ---- MLP stack W8A8 (dynamic per-token activation quant) ----
    from yoho_tpu.nn.layers import quantize_act_rows

    w1q = jnp.clip(jnp.round(w1.astype(jnp.float32) / 2e-4), -127, 127
                   ).astype(jnp.int8)
    w2q = jnp.clip(jnp.round(w2.astype(jnp.float32) / 2e-4), -127, 127
                   ).astype(jnp.int8)

    def w8a8_dot(x, wq, scale):
        xq, xs = quantize_act_rows(x)
        y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * scale).astype(jnp.bfloat16)

    def mlp_w8a8(x, cs):
        w1q, w2q = cs
        for _ in range(L):
            h = jax.nn.gelu(w8a8_dot(x, w1q, 2e-4), approximate=False)
            x = (w8a8_dot(h, w2q, 2e-4) * 1e-1).astype(jnp.bfloat16)
        return x

    t_mlp8 = timeit("MLP stack W8A8", mlp_w8a8, (w1q, w2q), mlp_flops)

    # ---- int8 matmul alone at MLP shapes (no quantization in the loop:
    # feed int8 through a cheap shift) ----
    x0_i8 = jnp.clip((x0.astype(jnp.float32) * 50), -127, 127).astype(jnp.int8)

    def mlp_i8_only(x, cs):
        w1q, w2q = cs
        for _ in range(L):
            h = jax.lax.dot_general(x, w1q, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            h8 = (h >> 9).astype(jnp.int8)
            y = jax.lax.dot_general(h8, w2q, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            x = (y >> 9).astype(jnp.int8)
        return x

    def timeit_i8(name, flops):
        def run(x, cs, n):
            def loop(_i, c):
                return mlp_i8_only(c, cs)

            return jax.lax.fori_loop(0, n, loop, x)

        jfn = jax.jit(run)
        jax.block_until_ready(jfn(x0_i8, (w1q, w2q), 1))

        def timed(n):
            t0 = time.perf_counter()
            out = jfn(x0_i8, (w1q, w2q), n)
            _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max((tk - t1) / reps, 1e-9)
        print(f"{name:34s} {dt*1e3:9.2f} ms  {flops / dt / 1e12:6.1f} TOP/s",
              flush=True)
        return dt

    t_mlpi8 = timeit_i8("MLP stack int8 (no quant ops)", mlp_flops)

    # ---- attention core: qk^T + softmax + av (heads split, no proj) ----
    attn_flops = L * 2 * 2 * batch * H * T * T * hd

    def attn_core(x, cs):
        del cs
        q = x.reshape(batch, T, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhsd,bhtd->bhst", q, q * 0.125,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhst,bhtd->bhsd", w, q)
        y = o.transpose(0, 2, 1, 3).reshape(batch, T, D)
        return (x + y * 1e-2).astype(jnp.bfloat16)

    def attn_stack(x, cs):
        for _ in range(L):
            x = attn_core(x, cs)
        return x

    t_attn = timeit("attention core stack (QK+sm+AV)", attn_stack, (),
                    attn_flops)

    # ---- LN + residual passes ----
    gam = jnp.ones((D,), jnp.bfloat16)

    def ln_stack(x, cs):
        (gam,) = cs
        for _ in range(2 * L):
            mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
            x = (((x - mu) * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)
                 * gam + x * 1e-3).astype(jnp.bfloat16)
        return x

    t_ln = timeit("LN+residual passes (2L)", ln_stack, (gam,))

    print(f"\nMLP W8A8 vs bf16: {t_mlp / t_mlp8:.2f}x  |  "
          f"int8-matmul-only vs bf16: {t_mlp / t_mlpi8:.2f}x")
    print(f"sum of parts: {(t_mlp + t_attn + t_ln) * 1e3:.1f} ms "
          f"(encoder_bench measured the full encoder)")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
