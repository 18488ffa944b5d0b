"""Tune the fused W8A8 dense kernel at whisper MLP shapes.

First wiring measured the kernel-backed encoder at 0.32x bf16 — worse
than the XLA composition it replaces. Suspect: program grain (block_m=
256 x block_n=512 puts ~0.5 us of MXU work in each of 4500 programs, so
fixed per-program cost dominates). This sweeps block sizes on the real
matmul shapes and compares against the bf16 jnp.dot and the XLA W8A8
composition.

Usage: python experiments/w8a8_kernel_bench.py [m] [reps] [k] [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.nn.layers import quantize_act_rows
    from yoho_tpu.ops.w8a8_dense import w8a8_dense

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 192000  # B=128 x T=1500
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 768
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 3072  # whisper-small fc1
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((m, K)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    w = jnp.asarray(g.standard_normal((K, N)).astype(np.float32) * 0.02,
                    jnp.bfloat16)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / 2e-4), -127, 127
                  ).astype(jnp.int8)
    ws = jnp.full((1, N), 2e-4, jnp.float32)
    flops = 2.0 * m * K * N

    def timeit(name, fn, *args):
        @jax.jit
        def many(n, *a):
            def body(_i, c):
                y = fn(a[0] + (c % 2).astype(a[0].dtype) * 1e-6, *a[1:])
                # full-output reduction: a single-element data
                # dependency lets XLA slice the dot down to one
                # row x column (the first bf16 baseline measured 0 ms)
                return c + jnp.sum(y.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        try:
            float(many(1, *args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:90]}")
            return

        def timed(n):
            t0 = time.perf_counter()
            float(many(n, *args))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max((tk - t1) / reps, 1e-9)
        print(f"{name:34s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} T(FL)OP/s",
              flush=True)

    timeit("bf16 jnp.dot", lambda x, w: jnp.dot(x, w).astype(jnp.bfloat16), x, w)

    def xla_w8a8(x, wq, ws):
        xq, xs = quantize_act_rows(x)
        y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

    timeit("XLA W8A8 composition", xla_w8a8, x, wq, ws)

    timeit("kernel auto-blocks",
           lambda x, wq, ws: w8a8_dense(x, wq, ws, None), x, wq, ws)
    timeit("kernel auto-blocks + gelu_tanh",
           lambda x, wq, ws: w8a8_dense(x, wq, ws, None,
                                        activation="gelu_tanh"), x, wq, ws)
    for bm, bn in ((256, 512), (512, 1024), (1024, 1024)):
        if N % bn and bn > N:
            continue
        timeit(f"kernel bm={bm} bn={bn}",
               lambda x, wq, ws, bm=bm, bn=bn: w8a8_dense(
                   x, wq, ws, None, block_m=bm, block_n=bn), x, wq, ws)


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
