"""Fused W8A8 dense Pallas kernel: the encoder's int8 serving engine.

Why a kernel: the v5e MXU runs int8 x int8 -> int32 at 2x its bf16 peak
(measured 375 TOP/s, experiments/int8_mxu_probe.py), but composing the
same math in XLA measures 0.93x bf16 (experiments/encoder_bisect.py) —
the dynamic activation quantization and the int32 epilogue each
materialize full-size HBM intermediates that eat the entire win. This
kernel does quantize -> int8 dot -> rescale/bias/activation in ONE pass:
activations are quantized per-row in VMEM, the int32 accumulator never
leaves VMEM, and the output lands directly in bf16.

Math parity: identical to ``yoho_tpu.nn.layers.Int8Dense`` (per-row
activation absmax in f32, round/clip to [-127, 127], per-output-channel
weight scales, f32 rescale) — pinned bit-level in tests/test_ops.py.
``activation="gelu_tanh"`` fuses the tanh GELU approximation into the
epilogue (the exact-erf GELU costs ~60 ms of the whisper-small B=128
MLP stack on the VPU — experiments/gelu_probe.py; tanh-GELU is
measured free). The whole path is an opt-in serving approximation
(``Whisper(encoder_int8=True)``) — never a default.

Grid: (N/block_n, M/block_m) with M innermost, so each weight column
block stays VMEM-resident across the whole M sweep (fetched once per
j), and x tiles stream. Block defaults from the on-chip sweep
(experiments/w8a8_kernel_bench.py: bm=512/bn=1024 = 208 TOP/s vs 141
at 256/512 — program grain matters; the kernel is VPU-bound on the
quant prologue + rescale epilogue between MXU bursts, so the raw 375
TOP/s dot rate is not reachable with per-call dynamic quantization).
Interpreter mode runs the identical kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GELU_C = 0.7978845608028654  # sqrt(2/pi)


def _gelu_tanh(y):
    return 0.5 * y * (1.0 + jnp.tanh(_GELU_C * (y + 0.044715 * y * y * y)))


def _w8a8_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, activation):
    xf = x_ref[...].astype(jnp.float32)  # (bm, K)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (bm, bn)
    y = acc.astype(jnp.float32) * xs * s_ref[...]
    y = y + b_ref[...]
    if activation == "gelu_tanh":
        y = _gelu_tanh(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    o_ref[...] = y.astype(o_ref.dtype)


_VMEM_BUDGET = 10 * 1024 * 1024  # conservative slice of the ~16 MB VMEM


def _pick_blocks(k: int, n: int, block_m: int, block_n: int):
    """Choose (block_m, block_n) that fit VMEM with block_n a divisor of
    N — preferring the WHOLE N per program (x is then read once instead
    of once per column block; the narrow-N projection shapes measured
    3x slower than bf16 when x was re-streamed per j —
    experiments/w8a8_kernel_bench.py)."""

    def fits(bm, bn):
        return (k * bn                 # int8 weight block (resident)
                + 2 * bm * k * 2       # double-buffered x tiles (bf16)
                + bm * bn * 4          # int32/f32 accumulator
                + 2 * bm * bn * 2      # double-buffered out tiles
                ) <= _VMEM_BUDGET

    for bm in (block_m, block_m // 2, block_m // 4):
        if bm < 128:
            break
        for bn in [n] + [d for d in range(block_n, 127, -128) if n % d == 0]:
            if fits(bm, bn):
                return bm, bn
    raise ValueError(f"no VMEM-fitting blocks for K={k}, N={n} "
                     f"(N must be a multiple of 128)")


@functools.partial(jax.jit, static_argnames=("activation", "block_m",
                                             "block_n", "out_dtype"))
def w8a8_dense(x, w_q, w_scale, bias=None, *, activation=None,
               block_m: int = 512, block_n: int = 1024,
               out_dtype=jnp.bfloat16):
    """Fused ``act((quant(x) @ w_q) * scales + bias)``.

    x (..., K) float; w_q (K, N) int8; w_scale (1, N) or (N,) f32;
    bias (N,) f32 or None. Returns (..., N) ``out_dtype``. M and K may
    be any size (M is padded to block_m); N must divide block_n or be
    padded by the caller (whisper dims are multiples of 512 for
    block_n<=512 at every preset).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w_q.shape[-1]
    m = 1
    for d in lead:
        m *= d
    xf = x.reshape(m, k)

    block_m, block_n = _pick_blocks(k, n, block_m, block_n)
    pad_m = (-m) % block_m
    if pad_m:
        xf = jnp.pad(xf, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    scale = jnp.asarray(w_scale, jnp.float32).reshape(1, n)
    b = (jnp.zeros((1, n), jnp.float32) if bias is None
         else jnp.asarray(bias, jnp.float32).reshape(1, n))

    kernel = functools.partial(_w8a8_kernel, activation=activation)
    out = pl.pallas_call(
        kernel,
        grid=(n // block_n, mp // block_m),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 2,
            transcendentals=mp * n if activation else 0,
        ),
    )(xf, w_q, scale, b)
    return out[:m].reshape(*lead, n)
