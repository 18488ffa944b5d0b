"""Speculative decoding economics on the real chip.

Measures the three primitive costs (in-jit chained repetition, state as jit
arguments):
  * plain target decode step (S=1)
  * verify step (S = gamma+1) — the same cache sweep amortized over a block
  * draft decode step (S=1, draft-sized model)

and prints the projected speedup vs acceptance rate alpha using the exact
commit distribution for greedy speculative decoding
(E[committed per round] = (1 - a^(g+1)) / (1 - a)):

    speedup(a) = E[committed] * t_plain / (g * t_draft + t_verify)

This separates the measured machine costs (hard numbers) from the
model-dependent acceptance (needs trained weights): with whisper-tiny
drafting for whisper-small, literature and practice put alpha at 0.7-0.9
for speech transcription.

Set YOHO_SPEC_INT8=1 to measure with weight-only int8 decoders on both
models (the combined latency configuration).

Usage: python experiments/speculative_bench.py [target] [draft] [batch] [gamma]
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.whisper import Whisper

    target_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    draft_name = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    gamma = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    reps = 64

    int8_weights = os.environ.get("YOHO_SPEC_INT8", "0") == "1"

    def build(name):
        cfg = WHISPER_PRESETS[name]
        model = Whisper(cfg, dtype=jnp.bfloat16)
        serve_model = (Whisper(cfg, dtype=jnp.bfloat16, weights_int8=True)
                       if int8_weights else model)
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
        from yoho_tpu.nn.layers import QuantizedKV

        key = jax.random.PRNGKey(7)
        # Lane-padded T with kv_len metadata, so YOHO_FUSED_DECODE=on can
        # route the verify step through the Pallas kernel.
        t_real = cfg.n_audio_ctx
        t = -(-t_real // 128) * 128
        h, d = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
        ckvs = [
            QuantizedKV(
                k_q=jax.random.randint(jax.random.fold_in(key, i),
                                       (batch, h, d, t), -127, 127, jnp.int8),
                v_q=jax.random.randint(jax.random.fold_in(key, i + 99),
                                       (batch, h, d, t), -127, 127, jnp.int8),
                k_scale=jnp.full((batch, h, 1, t), 0.01, jnp.bfloat16),
                v_scale=jnp.full((batch, h, 1, t), 0.01, jnp.bfloat16),
                kv_len=t_real,
            )
            for i in range(cfg.n_text_layer)
        ]
        caches = model.apply(variables, batch, jnp.bfloat16, 256, True,
                             method=Whisper.init_caches)
        if int8_weights:
            from yoho_tpu.nn.quantize import quantize_whisper_decoder

            variables = jax.jit(quantize_whisper_decoder)(variables)
        return cfg, serve_model, variables, ckvs, caches

    def time_step(name, model, variables, ckvs, caches, s):
        def step(carry, consts):
            variables, ckvs = consts
            tok, caches, pos = carry
            logits, new_caches = model.apply(
                variables, tok, caches, ckvs, pos, method=Whisper.decode_step
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (jnp.tile(nxt[:, None], (1, s)) % 100, new_caches,
                    (pos + s) % 128)

        def run(carry, consts, n):
            return jax.lax.fori_loop(0, n, lambda _i, c: step(c, consts), carry)

        jfn = jax.jit(run, static_argnums=2)
        carry = (jnp.zeros((batch, s), jnp.int32), caches, jnp.int32(0))
        consts = (variables, ckvs)

        def t(n):
            t0 = time.perf_counter()
            out = jfn(carry, consts, n)
            _ = int(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        t(1)
        t1 = min(t(1) for _ in range(3))
        tn = min(t(1 + reps) for _ in range(2))
        dt = max((tn - t1) / reps, 1e-9)
        print(f"{name:40s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    tcfg, tmodel, tvars, tckv, tcaches = build(target_name)
    dcfg, dmodel, dvars, dckv, dcaches = build(draft_name)

    t_plain = time_step(f"{target_name} step S=1", tmodel, tvars, tckv,
                        tcaches, 1)
    t_verify = time_step(f"{target_name} verify step S={gamma + 1}", tmodel,
                         tvars, tckv, tcaches, gamma + 1)
    t_draft = time_step(f"{draft_name} step S=1", dmodel, dvars, dckv,
                        dcaches, 1)

    round_cost = gamma * t_draft + t_verify
    print(f"\nround cost (g={gamma}): {round_cost * 1e3:.3f} ms "
          f"(= {gamma} draft + 1 verify) vs plain {t_plain * 1e3:.3f} ms/token")
    print(f"verify S={gamma + 1} costs {t_verify / t_plain:.2f}x a single step "
          f"-> the cache sweep amortizes {gamma + 1}/{t_verify / t_plain:.2f} = "
          f"{(gamma + 1) / (t_verify / t_plain):.1f} tokens/sweep at full acceptance")
    print("\nprojected speedup vs acceptance (greedy, per-stream):")
    for a in (0.0, 0.5, 0.7, 0.8, 0.9, 1.0):
        if a == 1.0:
            committed = gamma + 1.0
        else:
            committed = (1.0 - a ** (gamma + 1)) / (1.0 - a)
        speedup = committed * t_plain / round_cost
        print(f"  alpha={a:.1f}: {committed:4.2f} tok/round -> {speedup:4.2f}x "
              f"({1e3 * round_cost / committed:6.3f} ms/token)", flush=True)


if __name__ == "__main__":
    main()
