"""Is the exact-erf GELU the whisper MLP's MFU gap?

encoder_bisect.py measured the bf16 MLP stack at 119.6 TFLOP/s (61%
MFU) while its matmuls alone support ~100%. The suspect is the
activation: gelu(approximate=False) evaluates erf on the VPU over the
(B, T, 4D) hidden — ~590M elements/layer at whisper-small B=128.

Variants (12-layer MLP stack, serving shapes):
  * identity (no activation)        — the matmul roofline
  * erf GELU (exact, the default)
  * tanh GELU (HF/PyTorch 'gelu_new' approximation)
  * sigmoid GELU  x*sigmoid(1.702x) — cheapest transcendental
Also prints, on random bf16 data, how often each approximation changes
the ROUNDED bf16 output vs exact erf (the quality-relevant metric: the
model computes in bf16).

Usage: python experiments/gelu_probe.py [model] [batch] [reps]
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
    D, T, L = cfg.n_audio_state, cfg.n_audio_ctx, cfg.n_audio_layer

    g = np.random.default_rng(0)
    x0 = jnp.asarray(g.standard_normal((batch, T, D)).astype(np.float32) * 0.5,
                     jnp.bfloat16)
    w1 = jnp.asarray(g.standard_normal((D, 4 * D)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    w2 = jnp.asarray(g.standard_normal((4 * D, D)).astype(np.float32) * 0.02,
                     jnp.bfloat16)

    acts = {
        "identity": lambda h: h,
        "erf gelu (exact)": lambda h: jax.nn.gelu(h, approximate=False),
        "tanh gelu": lambda h: jax.nn.gelu(h, approximate=True),
        "sigmoid gelu": lambda h: h * jax.nn.sigmoid(1.702 * h),
    }

    flops = L * 2 * batch * T * D * 4 * D * 2

    def timeit(name, act):
        def run(x, cs, n):
            w1, w2 = cs

            def loop(_i, c):
                x = c
                for _ in range(L):
                    h = act(jnp.dot(x, w1))
                    x = (jnp.dot(h, w2) * 1e-1).astype(jnp.bfloat16)
                return x

            return jax.lax.fori_loop(0, n, loop, x)

        jfn = jax.jit(run)
        jax.block_until_ready(jfn(x0, (w1, w2), 1))

        def timed(n):
            t0 = time.perf_counter()
            out = jfn(x0, (w1, w2), n)
            _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max((tk - t1) / reps, 1e-9)
        print(f"{name:22s} {dt*1e3:9.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
              flush=True)
        return dt

    for name, act in acts.items():
        timeit(name, act)

    # bf16 fidelity of the approximations vs exact erf
    h = jnp.asarray(g.standard_normal(2_000_000).astype(np.float32) * 2,
                    jnp.bfloat16)
    exact = jax.nn.gelu(h, approximate=False)
    for name in ("tanh gelu", "sigmoid gelu"):
        approx = acts[name](h)
        diff = np.mean(np.asarray(exact) != np.asarray(approx))
        md = np.max(np.abs(np.asarray(exact, np.float32)
                           - np.asarray(approx, np.float32)))
        print(f"{name}: bf16 outputs differ from exact erf on "
              f"{diff*100:.2f}% of elements (max abs diff {md:.2e})")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
