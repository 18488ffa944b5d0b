"""Where does the beam step's time go? (large-v3 beam=5 shapes, v5e)

In-jit chained repetition (bench.py protocol) of the beam body's pieces:

  * decode step_fn alone (B*K streams, S=1, shared cross-KV)
  * the per-step cache gather alone (_gather_beams over all layers)
  * the expansion (log_softmax + top_k over B x K*V) alone
  * full body (step + expand + gathers)

The deltas say which optimization is worth building next (ancestry-based
gather-free reorder vs attention-layout work vs nothing).

Run on a QUIET host: each section compiles one program (dynamic trip
count) through the remote-compile relay, and a CPU-saturated host
(e.g. the test suite running) stretches XLA host-side compilation
severely. whisper-small compiles in a few minutes and tells the same
structural story.

Usage: python experiments/beam_step_bisect.py [model] [batch] [beams]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _random_params
    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.infer.beam import _gather_beams
    from yoho_tpu.infer.decode import make_whisper_step_fn
    from yoho_tpu.nn.whisper import Whisper

    model_name = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = WHISPER_PRESETS[model_name]
    model = Whisper(cfg, dtype=jnp.bfloat16)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))
    variables = _random_params(shapes)

    cache_len = 256
    mel = jnp.zeros((b, cfg.n_frames, cfg.n_mels), jnp.float32)

    @jax.jit
    def make_state(variables, mel):
        xa = model.apply(variables, mel, method=Whisper.encode_audio)
        ckv = model.apply(variables, xa, "int8", method=Whisper.cross_kvs)
        caches = model.apply(variables, b * k, jnp.bfloat16, cache_len,
                             True, method=Whisper.init_caches)
        return ckv, caches

    ckv, caches = make_state(variables, mel)
    vocab = cfg.n_vocab

    def run_many(name, body, carry, consts=(), n=8, reps=3):
        # ``consts`` (weights, cross-KV, fixed inputs) ride as TRACED jit
        # arguments — closed-over device arrays become program constants,
        # and tunneled dispatch re-ships constants per compile (CLAUDE.md;
        # a large-v3 closure is multiple GB). ``n`` is traced too: one
        # compile serves every rep count.
        fn = jax.jit(
            lambda c, cs, n: jax.lax.fori_loop(
                0, n, lambda i, cc: body(i, cc, cs), c),
            donate_argnums=(0,))
        carry1 = fn(carry, consts, 1)
        jax.block_until_ready(carry1)

        def timed(c, n):
            t0 = time.perf_counter()
            out = fn(c, consts, n)
            jax.block_until_ready(out)
            return time.perf_counter() - t0, out

        t1, carry1 = timed(carry1, 1)
        for _ in range(reps - 1):
            t, carry1 = timed(carry1, 1)
            t1 = min(t1, t)
        tk, carry1 = timed(carry1, 1 + n)
        tk2, _ = timed(carry1, 1 + n)
        dt = (min(tk, tk2) - t1) / n
        print(f"{name:28s}: {dt * 1e3:7.3f} ms/iter", flush=True)
        return dt

    tok0 = jnp.ones((b * k, 1), jnp.int32)
    g = np.random.default_rng(0)
    scores0 = jnp.asarray(g.standard_normal((b, k)).astype(np.float32))

    # 1) decode step alone (pos ticks; cache written in place)
    def body_step(i, carry, consts):
        variables, ckv = consts
        step = make_whisper_step_fn(model, variables, ckv)
        caches, acc = carry
        logits, caches = step(tok0 + (acc % 3).astype(jnp.int32), caches,
                              i % (cache_len - 2))
        return caches, acc + jnp.sum(logits[:, -1, :8]).astype(jnp.int32)

    t_step = run_many("decode step (B*K, S=1)", body_step,
                      (caches, jnp.int32(0)), consts=(variables, ckv))

    # 2) cache gather alone (rotating beam_src, data-dependent)
    def body_gather2(i, carry, _consts):
        caches, acc = carry
        src = jnp.tile(((jnp.arange(k) + 1 + (acc % 2)) % k)[None, :],
                       (b, 1)).astype(jnp.int32)
        caches = _gather_beams(caches, src)
        leaf = jax.tree_util.tree_leaves(caches)[0]
        return caches, acc + leaf[0, 0, 0, 0].astype(jnp.int32)

    t_gather = run_many("cache gather (all layers)", body_gather2,
                        (caches, jnp.int32(0)))

    # 3) expansion alone: log_softmax + top_k over (B, K*V)
    logits0 = jnp.asarray(g.standard_normal((b * k, vocab)).astype(np.float32))

    def body_expand(i, carry, consts):
        (logits0,) = consts
        scores, acc = carry
        logp = jax.nn.log_softmax(logits0 + acc.astype(jnp.float32) * 1e-9,
                                  axis=-1).reshape(b, k, vocab)
        total = scores[:, :, None] + logp
        top_scores, top_idx = jax.lax.top_k(total.reshape(b, k * vocab), k)
        return top_scores, acc + jnp.sum(top_idx % 7).astype(jnp.int32)

    t_expand = run_many("expand (softmax+top_k)", body_expand,
                        (scores0, jnp.int32(0)), consts=(logits0,))

    print(f"\nsum of parts: {(t_step + t_gather + t_expand) * 1e3:.3f} ms "
          f"(compare to the measured full beam step)")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
