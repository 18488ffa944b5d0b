"""W8A8 encoder vs bf16 encoder on the real chip.

The encoder is compute-bound (~51% MFU under XLA, encoder_bench.py) and
the v5e MXU runs int8 x int8 matmuls at 2x its bf16 peak (measured
1.96x, int8_mxu_probe.py). ``Whisper(encoder_int8=True)`` runs the
encoder block MLPs through ``Int8Dense`` (dynamic per-token activation
quant, per-channel weight scales, int32 accumulation, tanh-GELU fused);
attention (projections included — square matmuls measured 3x slower
under dynamic quant), conv stem, and layernorms stay bf16. This bench
measures what that buys end to end on the encoder forward, alongside
the quantization-free ``fast_gelu`` mode.

Protocol: in-jit chained repetition with weights/inputs as traced jit
arguments (closed-over arrays become program constants — CLAUDE.md) and
a DYNAMIC trip count (one compile per config).

Usage: python experiments/int8_encoder_bench.py [model] [batch] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _random_params
    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.quantize import quantize_whisper_encoder
    from yoho_tpu.nn.whisper import Whisper

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = WHISPER_PRESETS[model_name]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    model_q = Whisper(cfg, dtype=jnp.bfloat16, encoder_int8=True)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))
    variables = _random_params(shapes)
    variables_q = quantize_whisper_encoder(variables)

    g = np.random.default_rng(0)
    mel = jnp.asarray(
        g.standard_normal((batch, cfg.n_frames, cfg.n_mels))
        .astype(np.float32) * 0.5)

    def timeit(name, a_model, a_vars):
        def run(variables, mel, n):
            def body(_i, carry):
                x = mel + (carry.astype(jnp.float32) % 8.0) * 1e-9
                xa = a_model.apply(variables, x,
                                   method=type(a_model).encode_audio)
                return carry + jnp.sum(xa[:, 0, :4]).astype(jnp.int32)

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        jfn = jax.jit(run)
        int(jfn(a_vars, mel, 1))  # compile + warm

        def timed(n):
            t0 = time.perf_counter()
            int(jfn(a_vars, mel, n))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max((tk - t1) / reps, 1e-9)
        print(f"{name:24s} {dt*1e3:9.2f} ms/encode  "
              f"({dt*1e3/batch:7.3f} ms/window)", flush=True)
        return dt

    model_fg = Whisper(cfg, dtype=jnp.bfloat16, fast_gelu=True)

    t_bf16 = timeit(f"{model_name} B={batch} bf16", model, variables)
    t_fg = timeit(f"{model_name} B={batch} fast_gelu", model_fg, variables)
    t_int8 = timeit(f"{model_name} B={batch} W8A8", model_q, variables_q)
    print(f"\nfast_gelu speedup: {t_bf16 / t_fg:.2f}x   "
          f"W8A8 speedup: {t_bf16 / t_int8:.2f}x")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
