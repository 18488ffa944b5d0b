"""Compile-time probe: Python-loop block stack vs lax.scan over stacked params.

Deep models pay jit cost proportional to the UNROLLED program (every block
traced and lowered separately); scanning one block body over a stacked
param tree keeps the HLO O(1) in depth. This probe measures trace+lower
and backend-compile wall time for both constructions and verifies they
compute the identical function (max |diff| == 0 — same params, same order).

Measured (32 blocks, dims=256, XLA:CPU, 2026-08-18):
    loop blocks: trace+lower 4.0 s, compile 5.0 s
    scan blocks: trace+lower 1.0 s, compile 4.5 s   (max diff 0.0)
Trace+lower is platform-independent (4x win); backend compile on TPU
scales with HLO size far more steeply than on CPU, so the scan variant
is the construction to reach for when a deep config's first compile
hurts — at the (unmeasured on TPU) risk of losing inter-block fusion.
Serving keeps the loop construction until a real-chip run shows scan is
runtime-neutral; the pieces (stack_block_params, encoder_block_kwargs)
are the same ones the pipeline-parallel runner uses.

Usage: python experiments/scan_blocks_compile.py [n_blocks] [dims]
"""

import sys
import time

import os

import jax

# Compile probe: CPU by default, ALWAYS — this environment exports
# JAX_PLATFORMS=axon (a setdefault would be a no-op and the probe would
# cold-compile two full models through the TPU relay). Opt into another
# backend explicitly with SCAN_PROBE_PLATFORM=tpu.
jax.config.update("jax_platforms",
                  os.environ.get("SCAN_PROBE_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402

from yoho_tpu.core.config import YOHOConfig  # noqa: E402
from yoho_tpu.nn.yoho import YOHOAudioEncoder, YOHOModel  # noqa: E402
from yoho_tpu.parallel.pipeline import (  # noqa: E402
    _single_block,
    stack_block_params,
)


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = YOHOConfig(n_mel_bands=64, max_audio_len=256, max_text_len=32,
                     dims=dims, n_audio_heads=8, n_audio_blocks=n_blocks,
                     n_text_heads=8, n_text_blocks=2)
    model = YOHOModel(cfg, vocab_size=512)
    tokens = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    mel = jnp.zeros((2, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), tokens, mel)

    def timed(fn):
        t0 = time.time()
        lowered = fn.lower(variables, tokens, mel)
        t1 = time.time()
        lowered.compile()
        return t1 - t0, time.time() - t1

    loop_fn = jax.jit(lambda v, t, m: model.apply(v, t, m))
    lt, lc = timed(loop_fn)
    print(f"loop blocks ({n_blocks}x{dims}): "
          f"trace+lower {lt:.1f}s compile {lc:.1f}s")

    enc = YOHOAudioEncoder(cfg, dtype=model.dtype)
    blk = _single_block(cfg, model.dtype)

    def scan_apply(v, t, m):
        ep = {"params": v["params"]["encoder"]}
        x = enc.apply(ep, m, method=YOHOAudioEncoder.stem)
        stacked = stack_block_params(v["params"]["encoder"],
                                     cfg.n_audio_blocks)

        def body(h, p):
            return blk.apply({"params": p}, h), None

        xa, _ = jax.lax.scan(body, x, stacked)
        return model.apply(v, t, xa, method=YOHOModel.decode_text)

    scan_fn = jax.jit(scan_apply)
    st, sc = timed(scan_fn)
    print(f"scan blocks ({n_blocks}x{dims}): "
          f"trace+lower {st:.1f}s compile {sc:.1f}s")

    diff = float(jnp.abs(loop_fn(variables, tokens, mel)
                         - scan_fn(variables, tokens, mel)).max())
    print(f"max |loop - scan| = {diff} (same function)")
    assert diff == 0.0


if __name__ == "__main__":
    main()
