"""Encoder-side timing: where the non-decode ~30% of the pipeline goes.

Times, with in-jit chained repetition (state as jit args):
  * fused log-mel frontend
  * encoder forward (XLA attention vs Pallas flash attention)
  * cross-KV precompute + int8 quantization
  * decode prefill (S=len(prompt))

Usage: python experiments/encoder_bench.py [model] [batch] [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.ops.mel_kernel import fused_whisper_log_mel

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = WHISPER_PRESETS[model_name]

    def make_vars(model):
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
            jnp.zeros((1, 4), jnp.int32),
        )
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [
                (jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02).astype(s.dtype)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else jnp.zeros(s.shape, s.dtype)
                for k, s in zip(keys, leaves)
            ],
        )

    model = Whisper(cfg, dtype=jnp.bfloat16)
    model_flash = Whisper(cfg, dtype=jnp.bfloat16, use_flash=True)
    variables = make_vars(model)

    def timeit(name, fn, carry, consts):
        def run(carry, consts, n):
            def body(_i, c):
                return fn(c, consts)
            return jax.lax.fori_loop(0, n, body, carry)

        jfn = jax.jit(run, static_argnums=2)

        def t(n):
            t0 = time.perf_counter()
            out = jfn(carry, consts, n)
            _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        t(1)
        t1 = min(t(1) for _ in range(2))
        tn = min(t(1 + reps) for _ in range(2))
        dt = max((tn - t1) / reps, 1e-9)
        print(f"{name:40s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    g = np.random.default_rng(0)
    audio = jnp.asarray(
        g.standard_normal((batch, cfg.n_samples)).astype(np.float32) * 0.1)
    mel0 = jnp.asarray(
        g.standard_normal((batch, cfg.n_frames, cfg.n_mels)).astype(np.float32))

    # 1. mel frontend
    def mel_fn(a, _c):
        m = fused_whisper_log_mel(a, n_mels=cfg.n_mels)
        return a + 1e-9 * m[:, 0, 0][:, None]

    timeit("fused log-mel", mel_fn, audio, None)

    # 2. encoder forward, XLA vs flash
    def enc_fn(m, variables):
        xa = model.apply(variables, m, method=Whisper.encode_audio)
        return m + 1e-9 * xa[:, 0, 0].astype(m.dtype)[:, None, None]

    def enc_flash_fn(m, variables):
        xa = model_flash.apply(variables, m, method=Whisper.encode_audio)
        return m + 1e-9 * xa[:, 0, 0].astype(m.dtype)[:, None, None]

    t_x = timeit("encoder (XLA attention)", enc_fn, mel0, variables)
    t_f = timeit("encoder (Pallas flash)", enc_flash_fn, mel0, variables)
    print(f"  flash speedup: {t_x / t_f:.2f}x", flush=True)

    # 3. cross-KV precompute (+ int8 quantize)
    xa0 = jnp.asarray(g.standard_normal(
        (batch, cfg.n_audio_ctx, cfg.n_audio_state)).astype(np.float32),
        jnp.bfloat16)

    def ckv_fn(xa, variables):
        ckv = model.apply(variables, xa, True, method=Whisper.cross_kvs)
        leaf = jax.tree_util.tree_leaves(ckv)[0]
        return xa + 1e-9 * leaf[:, 0, 0, 0].astype(xa.dtype)[:, None, None]

    timeit("cross-KV precompute + int8 quant", ckv_fn, xa0, variables)

    # 4. prefill (4-token prompt step against fresh caches)
    prompt = jnp.zeros((batch, 4), jnp.int32)

    def prefill_fn(p, consts):
        variables, xa = consts
        ckv = model.apply(variables, xa, True, method=Whisper.cross_kvs)
        caches = model.apply(variables, batch, jnp.bfloat16, 256, True,
                             method=Whisper.init_caches)
        logits, _ = model.apply(variables, p, caches, ckv, 0,
                                method=Whisper.decode_step)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (p + nxt[:, None]) % 97

    timeit("cross-KV + caches + prefill step", prefill_fn, prompt,
           (variables, xa0))


if __name__ == "__main__":
    main()
