"""End-to-end speculative decode on the chip (not just step costs).

Decodes a fixed budget of tokens through the REAL speculative while_loop
and compares against plain greedy_decode, bounding the implementation:

  * draft == target           -> 100% acceptance (upper bound, includes
                                 all loop/pick/commit overhead)
  * independent random draft  -> ~0% acceptance (overhead floor)

With trained weights, real transcription sits between these at its
acceptance rate (speech with a matched draft: 0.7-0.9).

Usage: python experiments/speculative_e2e_bench.py [target] [draft] [batch] [gamma]
"""

import sys
import time

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

    target_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    draft_name = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    gamma = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    decode_tokens = 224

    table = WhisperTokenTable(multilingual=True)
    prompt_ids = table.sot_sequence("en", "transcribe", timestamps=False)
    max_len = len(prompt_ids) + decode_tokens
    prompt = jnp.asarray([prompt_ids] * batch, jnp.int32)
    # Random weights virtually never emit EOT over a 51865 vocab, so the
    # decode runs the full budget — comparable wall times.
    eot = table.eot

    def build(name, seed):
        cfg = WHISPER_PRESETS[name]
        model = Whisper(cfg, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
            jnp.zeros((1, 4), jnp.int32),
        )
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        variables = jax.tree_util.tree_unflatten(
            treedef,
            [
                (jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02).astype(s.dtype)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else jnp.zeros(s.shape, s.dtype)
                for k, s in zip(keys, leaves)
            ],
        )
        g = np.random.default_rng(0)
        mel = jnp.asarray(
            g.standard_normal((batch, cfg.n_frames, cfg.n_mels))
            .astype(np.float32))
        xa = jax.jit(lambda v, m_: model.apply(v, m_, method=Whisper.encode_audio)
                     )(variables, mel)
        ckv = jax.jit(lambda v, x: model.apply(v, x, True,
                                               method=Whisper.cross_kvs)
                      )(variables, xa)
        return cfg, model, variables, ckv

    _, t_model, t_vars, t_ckv = build(target_name, 1)
    _, d_model, d_vars, d_ckv = build(draft_name, 2)

    def timeit(name, fn, *args):
        def tm():
            t0 = time.perf_counter()
            out = fn(*args)
            _ = int(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        tm()  # compile
        dt = min(tm() for _ in range(5))
        print(f"{name:46s} {dt * 1e3:9.2f} ms  "
              f"({batch * decode_tokens / dt:8,.0f} tok/s)", flush=True)
        return dt

    # plain greedy
    def plain(t_vars, t_ckv, prompt):
        caches = t_model.apply(t_vars, batch, jnp.bfloat16, 256, True,
                               method=Whisper.init_caches)
        step = make_whisper_step_fn(t_model, t_vars, t_ckv)
        return greedy_decode(step, caches, prompt, max_len, eot)

    t_plain = timeit("plain greedy", jax.jit(plain), t_vars, t_ckv, prompt)

    def spec(t_vars, t_ckv, d_vars, d_ckv, prompt):
        horizon = max_len + gamma + 2
        t_caches = t_model.apply(t_vars, batch, jnp.bfloat16, horizon, True,
                                 method=Whisper.init_caches)
        d_caches = d_model.apply(d_vars, batch, jnp.bfloat16, horizon, True,
                                 method=Whisper.init_caches)
        return speculative_greedy_decode(
            make_verify_step_fn(t_model, t_vars, t_ckv),
            make_verify_step_fn(d_model, d_vars, d_ckv),
            t_caches, d_caches, prompt, max_len, eot, gamma=gamma,
        )

    def spec_self(t_vars, t_ckv, prompt):
        horizon = max_len + gamma + 2
        t_caches = t_model.apply(t_vars, batch, jnp.bfloat16, horizon, True,
                                 method=Whisper.init_caches)
        d_caches = t_model.apply(t_vars, batch, jnp.bfloat16, horizon, True,
                                 method=Whisper.init_caches)
        step = make_verify_step_fn(t_model, t_vars, t_ckv)
        return speculative_greedy_decode(
            step, step, t_caches, d_caches, prompt, max_len, eot, gamma=gamma)

    t_perfect = timeit("speculative, perfect draft (alpha=1)",
                       jax.jit(spec_self), t_vars, t_ckv, prompt)
    t_indep = timeit(f"speculative, {draft_name} draft (alpha~0)",
                     jax.jit(spec), t_vars, t_ckv, d_vars, d_ckv, prompt)

    print(f"\nbounds vs plain: best {t_plain / t_perfect:.2f}x "
          f"(but perfect-draft pays target-priced drafting; a {draft_name} "
          f"draft at high acceptance lands far above this), "
          f"worst {t_plain / t_indep:.2f}x", flush=True)

    # Sanity: perfect draft must reproduce plain greedy exactly.
    tg, lg = jax.jit(plain)(t_vars, t_ckv, prompt)
    ts_, ls_ = jax.jit(spec_self)(t_vars, t_ckv, prompt)
    same = bool(jnp.all(tg == ts_)) and bool(jnp.all(lg == ls_))
    print(f"perfect-draft output == greedy: {same}", flush=True)


if __name__ == "__main__":
    main()
