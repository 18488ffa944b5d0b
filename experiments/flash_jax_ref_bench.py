"""Calibrate: what MFU does JAX's own tuned TPU flash attention reach at
whisper-encoder shapes (B*H=1536, T=1500, d=64)?

Our kernel measures 67 TFLOP/s (flash_ablation.py); XLA's fused
attention ~57. If the reference kernel lands much higher, its schedule
is worth studying; if not, d=64 really caps the MXU here.

Usage: python experiments/flash_jax_ref_bench.py [batch] [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    B, H, T, D = batch, 12, 1536, 64  # padded to a block multiple
    # (MFU calibration only: same padded length flash_ablation.py uses)
    g = np.random.default_rng(0)

    def arr():
        return jnp.asarray(
            g.standard_normal((B, H, T, D)).astype(np.float32) * 0.3,
            jnp.bfloat16)

    q, k, v = arr(), arr(), arr()

    def bench(name, blocks):
        @jax.jit
        def many(q, k, v, n):
            def body(_i, c):
                o = flash_attention(
                    q + (c % 2).astype(q.dtype) * 1e-6, k, v,
                    causal=False, sm_scale=float(D) ** -0.5,
                    block_sizes=blocks)
                return c + o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        try:
            float(many(q, k, v, 1))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            return

        def timed(n):
            t0 = time.perf_counter()
            float(many(q, k, v, n))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max((tk - t1) / reps, 1e-9)
        flops = 4 * B * H * T * T * D
        print(f"{name:28s} {dt*1e3:9.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
              flush=True)

    bench("jax-ref default blocks", None)
    bench("jax-ref bq512 bk512",
          BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1))
    bench("jax-ref bq1024 bk512",
          BlockSizes(block_q=1024, block_k_major=512, block_k=512, block_b=1))


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
