"""Why is the Pallas flash encoder kernel 0.67x XLA at T=1500?

Ablates the kernel's components at whisper-small encoder shapes
(B*H=1536 programs, T=1500->1536, d=64). Variants:

  * full      — the production kernel (ops/flash_attention.py math)
  * nomask    — padding mask applied ONLY to the last k-block (the
                encoder's mask is pure padding; inner blocks need none)
  * exp2      — exp replaced by exp2 with log2(e) folded into scale
  * dots      — dots only, softmax replaced by a cheap rescale (isolates
                MXU vs VPU cost)
  * wide      — block_k = whole padded T (single-pass softmax)
  * XLA       — the unfused reference attention at the same shapes

Usage: python experiments/flash_ablation.py [batch] [reps]
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG2E = math.log2(math.e)
NEG_INF = -3.0e38


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    H, T, D = 12, 1500, 64
    BH = batch * H
    TP = 1536  # padded
    scale = D ** -0.5

    g = np.random.default_rng(0)
    q = jnp.asarray(g.standard_normal((BH, TP, D)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    k = jnp.asarray(g.standard_normal((BH, TP, D)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(g.standard_normal((BH, TP, D)).astype(np.float32) * 0.3,
                    jnp.bfloat16)

    def make_kernel(block_q, block_k, mode):
        # k-block loop UNROLLED in Python (nk <= 6): jk is concrete, so
        # the padding mask is emitted only for blocks that contain
        # padding (all modes but "full", which masks every block the way
        # the production kernel does).
        def kern(q_ref, k_ref, v_ref, o_ref):
            qb = q_ref[0]
            m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
            l = jnp.zeros((block_q, 1), jnp.float32)
            acc = jnp.zeros((block_q, D), jnp.float32)
            nk = TP // block_k

            for jk in range(nk):
                kb = k_ref[0, pl.ds(jk * block_k, block_k), :]
                vb = v_ref[0, pl.ds(jk * block_k, block_k), :]
                s = jax.lax.dot_general(
                    qb, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if mode == "exp2":
                    s = s * (scale * LOG2E)
                else:
                    s = s * scale
                need_mask = (mode == "full") or ((jk + 1) * block_k > T)
                if need_mask and mode != "dots":
                    kpos = jk * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 1)
                    s = jnp.where(kpos < T, s, NEG_INF)
                if mode == "dots":
                    p = (s * 1e-4).astype(vb.dtype)
                    acc = acc + jax.lax.dot_general(
                        p, vb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    l = l + 1.0
                    continue
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                e = jnp.exp2 if mode == "exp2" else jnp.exp
                p = e(s - m_new)
                alpha = e(m - m_new)
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = m_new
            o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        return kern

    def run_variant(name, block_q, block_k, mode):
        # NB: the static Python mask-selection in "nomask" mode is
        # evaluated per-block at TRACE time via the jk python value only
        # when the loop is unrolled; keep the fori_loop and accept the
        # where() in every block for modes where it can't be hoisted.
        kern = make_kernel(block_q, block_k, mode)
        f = pl.pallas_call(
            kern,
            grid=(BH, TP // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BH, TP, D), q.dtype),
        )

        @jax.jit
        def many(q, k, v, n):
            def body(_i, c):
                out = f(q + (c % 2).astype(q.dtype) * 1e-6, k, v)
                return c + out[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(many(q, k, v, 1))

        def timed(n):
            t0 = time.perf_counter()
            float(many(q, k, v, n))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(3))
        tk_ = min(timed(1 + reps) for _ in range(2))
        dt = max((tk_ - t1) / reps, 1e-9)
        flops = 4 * BH * TP * TP * D
        print(f"{name:28s} {dt*1e3:9.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
              flush=True)
        return dt

    run_variant("full  bq=256 bk=512", 256, 512, "full")
    run_variant("nomask bq=256 bk=512", 256, 512, "nomask")
    run_variant("exp2  bq=256 bk=512", 256, 512, "exp2")
    run_variant("dots  bq=256 bk=512", 256, 512, "dots")
    run_variant("full  bq=512 bk=512", 512, 512, "full")
    run_variant("full  bq=256 bk=1536", 256, 1536, "full")
    run_variant("exp2  bq=512 bk=1536", 512, 1536, "exp2")

    # XLA reference at the same shapes (one layer's attention core)
    @jax.jit
    def xla_many(q, k, v, n):
        def body(_i, c):
            qq = q + (c % 2).astype(q.dtype) * 1e-6
            s = jnp.einsum("bqd,bkd->bqk", qq, k,
                           preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bqk,bkd->bqd", w, v)
            return c + o[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(xla_many(q, k, v, 1))

    def timed(n):
        t0 = time.perf_counter()
        float(xla_many(q, k, v, n))
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(3))
    tk_ = min(timed(1 + reps) for _ in range(2))
    dt = max((tk_ - t1) / reps, 1e-9)
    flops = 4 * BH * TP * TP * D
    print(f"{'XLA attention core':28s} {dt*1e3:9.2f} ms  "
          f"{flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
