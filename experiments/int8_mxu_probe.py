"""Does the v5e MXU run int8 matmuls at 2x bf16 throughput through XLA?

TPU v5e peak: 197 bf16 TFLOP/s, 394 int8 TOP/s. If XLA lowers an
int8 x int8 -> int32 dot to the native int8 MXU mode, a quantized
encoder path (weights AND activations int8) roughly doubles the
encoder's compute ceiling. This probe measures plain square matmuls
plus the mixed forms we could actually use in a model:

  * bf16 x bf16 -> bf16      (baseline)
  * int8 x int8 -> int32     (native quantized path)
  * int8 x int8 -> bf16 preferred element type
  * bf16 x int8 -> bf16      (weight-only, XLA dequant-fused)

In-jit chained repetition (see CLAUDE.md): the output of one matmul
feeds the next via a cheap cast/slice so XLA cannot elide iterations;
result is host-materialized.

Usage: python experiments/int8_mxu_probe.py [dim] [reps]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    key = jax.random.PRNGKey(0)
    a_f = jax.random.normal(key, (dim, dim), jnp.bfloat16)
    b_f = jax.random.normal(jax.random.PRNGKey(1), (dim, dim), jnp.bfloat16)
    a_i = (jax.random.normal(key, (dim, dim)) * 30).astype(jnp.int8)
    b_i = (jax.random.normal(jax.random.PRNGKey(1), (dim, dim)) * 30).astype(jnp.int8)

    flops = 2.0 * dim * dim * dim

    def chain(dot, feed):
        """dot: (x, b) -> y;  feed: y -> x' (cheap, keeps dtype/shape).

        ``n`` is a TRACED trip count: one compile serves every rep count
        (a static n is a new program per value — and through the relay a
        single compile of an unrolled chain measured in minutes)."""

        def run(x, b, n):
            def body(_i, c):
                return feed(dot(c, b))

            return jax.lax.fori_loop(0, n, body, x)

        return jax.jit(run)

    def timeit(name, jfn, x, b):
        y = jfn(x, b, 1)  # compile + warm (dynamic n: same program below)
        jax.block_until_ready(y)

        def timed(n):
            t0 = time.perf_counter()
            yy = jfn(x, b, n)
            _ = np.asarray(jax.device_get(jnp.ravel(yy)[0]))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk = min(timed(1 + reps) for _ in range(2))
        dt = max(tk - t1, 1e-9)
        tops = flops * reps / dt / 1e12
        print(f"{name:34s} {dt*1e3/reps:8.3f} ms/matmul  {tops:7.1f} T(FL)OP/s",
              flush=True)
        return tops

    # bf16 baseline
    r_bf16 = timeit(
        "bf16 x bf16 -> bf16",
        chain(lambda x, b: jnp.dot(x, b), lambda y: (y * 1e-2).astype(jnp.bfloat16)),
        a_f,
        b_f,
    )

    # int8 -> int32 accumulate (native quantized mode if supported)
    def dot_i8(x, b):
        return jax.lax.dot_general(
            x, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    r_i8 = timeit(
        "int8 x int8 -> int32",
        chain(dot_i8, lambda y: (y >> 8).astype(jnp.int8)),
        a_i,
        b_i,
    )

    # int8 -> bf16 preferred
    def dot_i8_bf(x, b):
        return jax.lax.dot_general(
            x.astype(jnp.int8), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )

    r_i8bf = timeit(
        "int8 x int8 -> bf16 pref",
        chain(dot_i8_bf, lambda y: (y * (1.0 / 256)).astype(jnp.int8)),
        a_i,
        b_i,
    )

    # weight-only: bf16 activations x int8 weights (XLA fuses the dequant)
    def dot_wq(x, b):
        return jnp.dot(x, b.astype(jnp.bfloat16))

    r_wq = timeit(
        "bf16 x int8(dequant) -> bf16",
        chain(dot_wq, lambda y: (y * 1e-2).astype(jnp.bfloat16)),
        a_f,
        b_i,
    )

    print(
        f"\nint8/bf16 speedup: {r_i8 / r_bf16:.2f}x (int32 acc), "
        f"{r_i8bf / r_bf16:.2f}x (bf16 pref), weight-only {r_wq / r_bf16:.2f}x"
    )


if __name__ == "__main__":
    main()
