"""Probe: is the TPU bf16 speculative/greedy divergence tie-flipping?

The speculative greedy-equivalence proof assumes the verify step computes
the SAME logits the sequential step would. In f32 that holds bitwise
(CPU tests); in bf16, S=1 and S=gamma+1 matmuls tile differently and can
differ in low bits — harmless when the top-1 margin is real, argmax-
flipping when logits tie (random weights tie constantly in bf16's ~3
significant digits; trained models rarely do).

Decodes the same budget with both paths at f32 and bf16, reports
equality and, at the first divergence, the top-2 logit margin.

Usage: python experiments/speculative_bf16_parity_probe.py [model] [tokens]
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn
    from yoho_tpu.infer.speculative import (
        make_verify_step_fn,
        speculative_greedy_decode,
    )
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    model_name = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    decode_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    gamma = 4

    table = WhisperTokenTable(multilingual=True)
    prompt_ids = table.sot_sequence("en", "transcribe", timestamps=False)
    max_len = len(prompt_ids) + decode_tokens
    prompt = jnp.asarray([prompt_ids], jnp.int32)
    eot = table.eot
    cfg = WHISPER_PRESETS[model_name]

    for dtype in (jnp.float32, jnp.bfloat16):
        model = Whisper(cfg, dtype=dtype)
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
                (jax.random.normal(k, s.shape, dtype) * 0.02).astype(s.dtype)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else jnp.zeros(s.shape, s.dtype)
                for k, s in zip(keys, leaves)
            ],
        )
        g = np.random.default_rng(0)
        mel = jnp.asarray(g.standard_normal((1, cfg.n_frames, cfg.n_mels))
                          .astype(np.float32))
        xa = jax.jit(lambda v, m_: model.apply(v, m_, method=Whisper.encode_audio)
                     )(variables, mel)
        ckv = jax.jit(lambda v, x: model.apply(v, x, method=Whisper.cross_kvs)
                      )(variables, xa)

        def plain(variables, ckv, prompt):
            caches = model.apply(variables, 1, dtype, 256,
                                 method=Whisper.init_caches)
            step = make_whisper_step_fn(model, variables, ckv)
            return greedy_decode(step, caches, prompt, max_len, eot)

        def spec_self(variables, ckv, prompt):
            horizon = max_len + gamma + 2
            tc = model.apply(variables, 1, dtype, horizon,
                             method=Whisper.init_caches)
            dc = model.apply(variables, 1, dtype, horizon,
                             method=Whisper.init_caches)
            step = make_verify_step_fn(model, variables, ckv)
            return speculative_greedy_decode(step, step, tc, dc, prompt,
                                             max_len, eot, gamma=gamma)

        tg, _ = jax.jit(plain)(variables, ckv, prompt)
        ts_, _ = jax.jit(spec_self)(variables, ckv, prompt)
        tg, ts_ = np.asarray(tg)[0], np.asarray(ts_)[0]
        equal = bool(np.array_equal(tg, ts_))
        line = f"{np.dtype(dtype).name:9s} perfect-draft == greedy: {equal}"
        if not equal:
            div = int(np.argmax(tg != ts_))
            # Teacher-force the agreed prefix, look at the divergent logits.
            buf = jnp.asarray([list(tg[:div])], jnp.int32)
            logits = jax.jit(
                lambda v, b_, x: model.apply(v, b_, x,
                                             method=Whisper.decode_text)
            )(variables, buf, xa)
            row = np.asarray(logits, np.float32)[0, -1]
            top2 = np.sort(row)[-2:]
            line += (f"; first divergence at {div} "
                     f"(greedy {tg[div]} vs spec {ts_[div]}), "
                     f"top-2 margin {top2[1] - top2[0]:.3e}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
