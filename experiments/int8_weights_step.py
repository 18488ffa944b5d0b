"""Full decode-step A/B: bf16 weights vs weight-only int8 decoder.

Usage: python experiments/int8_weights_step.py [model] [batch] [reps]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.layers import QuantizedKV
    from yoho_tpu.nn.quantize import quantize_whisper_decoder
    from yoho_tpu.nn.whisper import Whisper

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    cfg = WHISPER_PRESETS[model_name]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    q_model = Whisper(cfg, dtype=jnp.bfloat16, weights_int8=True)

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
    q_variables = jax.jit(quantize_whisper_decoder)(variables)

    key = jax.random.PRNGKey(7)
    t = cfg.n_audio_ctx
    h, d = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
    ckvs = [
        QuantizedKV(
            k_q=jax.random.randint(jax.random.fold_in(key, i),
                                   (batch, h, d, t), -127, 127, jnp.int8),
            v_q=jax.random.randint(jax.random.fold_in(key, i + 99),
                                   (batch, h, d, t), -127, 127, jnp.int8),
            k_scale=jnp.full((batch, h, 1, t), 0.01, jnp.bfloat16),
            v_scale=jnp.full((batch, h, 1, t), 0.01, jnp.bfloat16),
        )
        for i in range(cfg.n_text_layer)
    ]

    def time_step(name, m, v):
        caches = m.apply(v, batch, jnp.bfloat16, 256, True,
                         method=Whisper.init_caches)

        def step(carry, consts):
            v, ckvs = consts
            tok, caches, pos = carry
            logits, new_caches = m.apply(v, tok, caches, ckvs, pos,
                                         method=Whisper.decode_step)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return nxt[:, None] % 100, new_caches, (pos + 1) % 256

        def run(carry, consts, n):
            return jax.lax.fori_loop(0, n, lambda _i, c: step(c, consts), carry)

        jfn = jax.jit(run, static_argnums=2)
        carry = (jnp.zeros((batch, 1), jnp.int32), caches, jnp.int32(0))

        def tm(n):
            t0 = time.perf_counter()
            out = jfn(carry, (v, ckvs), n)
            _ = int(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        tm(1)
        t1 = min(tm(1) for _ in range(3))
        tn = min(tm(1 + reps) for _ in range(2))
        dt = max((tn - t1) / reps, 1e-9)
        print(f"{name:40s} {dt * 1e3:8.3f} ms/step "
              f"({batch / dt:,.0f} tok/s)", flush=True)
        return dt

    t16 = time_step("decode step, bf16 weights", model, variables)
    t8 = time_step("decode step, int8 weights", q_model, q_variables)
    print(f"  int8-weights step speedup: {t16 / t8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
