"""Probe: can XLA's native int4 dtype realize the packed-KV traffic saving?

Times the cross-attention read stack with K/V stored as jnp.int4 (XLA packs
two elements per byte in HBM) vs int8, dequantized inline by the same
astype->einsum pattern as layers._attend_quantized. If the int4 load+convert
fuses into the dot, effective bandwidth doubles; if XLA materializes the
converted tensor, it will be no faster than int8.

Usage: python experiments/int4_xla_probe.py [model] [batch] [reps]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    cfg = WHISPER_PRESETS[model_name]
    n_layer = cfg.n_text_layer
    d_model = cfg.n_text_state
    n_head = cfg.n_text_head
    head_dim = d_model // n_head
    t = cfg.n_audio_ctx

    key = jax.random.PRNGKey(0)

    # int8 source material; the int4/int8 cast happens INSIDE the jit
    # (matching real serving, where cross-KV quantization runs in the same
    # program as the decode loop — jax 0.9.0 cannot even dispatch S4 jit
    # arguments: RecursionError in the arg-signature path).
    def make_kv_host():
        def one(i):
            return jax.random.randint(jax.random.fold_in(key, i),
                                      (batch, n_head, head_dim, t), -8, 7,
                                      jnp.int8)
        return [dict(
            k=one(i), v=one(i + 100),
            ks=jnp.full((batch, n_head, 1, t), 0.01, jnp.bfloat16),
            vs=jnp.full((batch, n_head, 1, t), 0.01, jnp.bfloat16),
        ) for i in range(n_layer)]

    def attend_stack(x, kvs):
        q = x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 1, 3)
        out = x
        for c in kvs:
            kf = c["k"].astype(jnp.bfloat16)
            scores = jnp.einsum("bhsd,bhdt->bhst", q, kf,
                                preferred_element_type=jnp.float32)
            scores = scores * c["ks"].astype(jnp.float32)
            w = jax.nn.softmax(scores, axis=-1)
            w = (w * c["vs"].astype(jnp.float32)).astype(jnp.bfloat16)
            vf = c["v"].astype(jnp.bfloat16)
            o = jnp.einsum("bhdt,bhst->bhds", vf, w)
            out = out + o.transpose(0, 3, 1, 2).reshape(batch, 1, d_model)
        return out * 0.999

    def timeit(name, carry, consts, bytes_moved, dtype):
        def run(carry, consts, n):
            # Cast to the cache dtype inside the program; the loop then
            # reads the casted tensors (loop-invariant, materialized once).
            consts = [dict(k=c["k"].astype(dtype), v=c["v"].astype(dtype),
                           ks=c["ks"], vs=c["vs"]) for c in consts]
            return jax.lax.fori_loop(
                0, n, lambda _i, c: attend_stack(c, consts), carry)

        jfn = jax.jit(run, static_argnums=2)

        def tm(n):
            t0 = time.perf_counter()
            out = jfn(carry, consts, n)
            _ = float(out.reshape(-1)[0])
            return time.perf_counter() - t0

        tm(1)
        t1 = min(tm(1) for _ in range(3))
        tn = min(tm(1 + reps) for _ in range(2))
        dt = max((tn - t1) / reps, 1e-9)
        print(f"{name:40s} {dt * 1e3:8.3f} ms   "
              f"{bytes_moved / dt / 1e9:6.0f} GB/s effective", flush=True)
        return dt

    x0 = jax.random.normal(key, (batch, 1, d_model), jnp.bfloat16)
    base = n_layer * (2 * batch * n_head * head_dim * t
                      + 4 * batch * n_head * t)
    kvs = make_kv_host()

    t8 = timeit("cross int8 XLA", x0, kvs, base, jnp.int8)
    try:
        t4 = timeit("cross int4 XLA (native dtype)", x0, kvs,
                    base // 2 + n_layer * 4 * batch * n_head * t, jnp.int4)
        print(f"  int4/int8 speedup: {t8 / t4:.2f}x", flush=True)
    except Exception as e:  # pragma: no cover - probe
        print(f"int4 probe failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
