"""A/B: fused Pallas decode attention vs the XLA `_attend_quantized` path.

Times one serving-shaped cross-attention read stack (all decoder layers,
whisper-small defaults) both ways with in-jit chained repetition, printing
ms/step and achieved HBM bandwidth.

Usage: python experiments/decode_kernel_bench.py [model] [batch] [reps]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.layers import QuantizedKV, _attend_quantized, decode_mask
    from yoho_tpu.ops.decode_attention import fused_decode_attention

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    cfg = WHISPER_PRESETS[model_name]
    n_layer = cfg.n_text_layer
    d_model = cfg.n_text_state
    n_head = cfg.n_text_head
    head_dim = d_model // n_head
    t_cross = -(-cfg.n_audio_ctx // 128) * 128  # lane-padded
    kv_len = cfg.n_audio_ctx
    horizon = 256

    key = jax.random.PRNGKey(0)

    def ckv(i, t):
        return QuantizedKV(
            k_q=jax.random.randint(jax.random.fold_in(key, i),
                                   (batch, n_head, head_dim, t), -127, 127, jnp.int8),
            v_q=jax.random.randint(jax.random.fold_in(key, i + 100),
                                   (batch, n_head, head_dim, t), -127, 127, jnp.int8),
            k_scale=jnp.full((batch, n_head, 1, t), 0.01, jnp.bfloat16),
            v_scale=jnp.full((batch, n_head, 1, t), 0.01, jnp.bfloat16),
        )

    cross = [ckv(i, t_cross) for i in range(n_layer)]
    selfc = [ckv(i + 200, horizon) for i in range(n_layer)]
    x0 = jax.random.normal(key, (batch, 1, d_model), jnp.bfloat16)

    GB = 1e9
    cross_bytes = n_layer * (2 * batch * n_head * head_dim * t_cross
                             + 4 * batch * n_head * t_cross)
    self_bytes = n_layer * (2 * batch * n_head * head_dim * horizon
                            + 4 * batch * n_head * horizon)

    def timeit(name, fn, carry, consts, bytes_moved):
        # Device state rides as jit ARGUMENTS (closed-over arrays become
        # program constants, re-shipped per compile on tunneled dispatch).
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
        print(f"{name:44s} {dt * 1e3:8.3f} ms   "
              f"{bytes_moved / dt / GB:6.0f} GB/s", flush=True)
        return dt

    def to_q(x):
        return x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 1, 3)

    # ---- cross-attention stack ----
    def xla_cross(x, cross):
        q = to_q(x)
        out = x
        mask = (jnp.arange(t_cross) < kv_len)[None, None, None, :]
        for c in cross:
            a = _attend_quantized(q, c, mask, jnp.bfloat16)
            out = out + a.reshape(batch, 1, d_model)
        return out * 0.999

    def fused_cross(x, cross):
        q = to_q(x)
        out = x
        for c in cross:
            a = fused_decode_attention(q, c.k_q, c.v_q, c.k_scale, c.v_scale,
                                       kv_len=kv_len)
            out = out + a.reshape(batch, 1, d_model)
        return out * 0.999

    t_xla_cross = timeit("cross XLA (masked, padded T)", xla_cross, x0, cross,
                         cross_bytes)
    t_fus = timeit("cross fused Pallas", fused_cross, x0, cross, cross_bytes)
    print(f"  cross speedup: {t_xla_cross / t_fus:.2f}x", flush=True)

    # ---- self-attention read stack (fixed pos read; update cost excluded) ----
    pos = jnp.int32(128)

    def xla_self(x, selfc):
        q = to_q(x)
        out = x
        mask = decode_mask(horizon, pos, 1)
        for c in selfc:
            a = _attend_quantized(q, c, mask, jnp.bfloat16)
            out = out + a.reshape(batch, 1, d_model)
        return out * 0.999

    def fused_self(x, selfc):
        q = to_q(x)
        out = x
        for c in selfc:
            a = fused_decode_attention(q, c.k_q, c.v_q, c.k_scale, c.v_scale,
                                       pos=pos)
            out = out + a.reshape(batch, 1, d_model)
        return out * 0.999

    t_xla = timeit("self XLA (decode mask)", xla_self, x0, selfc, self_bytes)
    t_fus = timeit("self fused Pallas", fused_self, x0, selfc, self_bytes)
    print(f"  self speedup: {t_xla / t_fus:.2f}x", flush=True)

    # ---- int4 cross-attention (fused only; quarter traffic) ----
    cross4 = [
        QuantizedKV(
            k_q=jax.random.randint(jax.random.fold_in(key, i + 400),
                                   (batch, n_head, head_dim // 2, t_cross),
                                   0, 255, jnp.uint8),
            v_q=jax.random.randint(jax.random.fold_in(key, i + 500),
                                   (batch, n_head, head_dim // 2, t_cross),
                                   0, 255, jnp.uint8),
            k_scale=jnp.full((batch, n_head, 1, t_cross), 0.01, jnp.bfloat16),
            v_scale=jnp.full((batch, n_head, 1, t_cross), 0.01, jnp.bfloat16),
            packing=2,
        )
        for i in range(n_layer)
    ]
    cross4_bytes = n_layer * (batch * n_head * head_dim * t_cross
                              + 4 * batch * n_head * t_cross)

    def fused_cross4(x, cross4):
        q = to_q(x)
        out = x
        for c in cross4:
            a = fused_decode_attention(q, c.k_q, c.v_q, c.k_scale, c.v_scale,
                                       kv_len=kv_len, packing=2)
            out = out + a.reshape(batch, 1, d_model)
        return out * 0.999

    t_f4 = timeit("cross fused Pallas int4", fused_cross4, x0, cross4,
                  cross4_bytes)
    print(f"  int4 vs int8-XLA speedup: {t_xla_cross / t_f4:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
