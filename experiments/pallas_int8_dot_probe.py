"""Does Mosaic lower an int8 x int8 -> int32 dot inside a Pallas kernel
to the MXU's 2x-rate int8 path?

XLA reaches 376 TOP/s on plain int8 matmuls (int8_mxu_probe.py); a fused
W8A8 MLP kernel (quantize in VMEM -> int8 dot -> rescale/gelu epilogue,
no HBM int32/quant intermediates) is only worth building if the in-kernel
dot hits a comparable rate. This probes a tiled (M, K) x (K, N) int8
matmul kernel at whisper-small fc1 shapes.

Usage: python experiments/pallas_int8_dot_probe.py [m] [k] [n] [reps]
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    block_m, block_n = 512, 1024

    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @jax.jit
    def matmul(x, w, nrep):
        f = pl.pallas_call(
            kernel,
            grid=(m // block_m, n // block_n),
            in_specs=[
                pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )

        def body(_i, carry):
            y = f((x + (carry % 3).astype(jnp.int8)), w)
            return carry + y[0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, nrep, body, jnp.int32(0))

    g = np.random.default_rng(0)
    x = jnp.asarray(g.integers(-127, 127, (m, k)).astype(np.int8))
    w = jnp.asarray(g.integers(-127, 127, (k, n)).astype(np.int8))

    int(matmul(x, w, 1))

    def timed(nr):
        t0 = time.perf_counter()
        int(matmul(x, w, nr))
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(3))
    tk = min(timed(1 + reps) for _ in range(2))
    dt = max((tk - t1) / reps, 1e-9)
    tops = 2.0 * m * k * n / dt / 1e12
    print(f"pallas int8 dot ({m}x{k})x({k}x{n}): {dt*1e3:.3f} ms  "
          f"{tops:.1f} TOP/s")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
