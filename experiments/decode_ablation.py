"""Decode-step time breakdown on the real chip (in-jit component loops).

The serving hot loop (bench.py) is one KV-cached decode step repeated ~224
times. This tool times each component of that step in isolation — quantized
cross-attention reads, quantized self-attention cache update+read, the MLP
stack, tied-embedding logits, and the full assembled step — using the in-jit
chained-repetition methodology (per-call wall timings on tunneled dispatch
measure argument shipping, not the chip; see bench.py). All device state is
passed as jit ARGUMENTS, never closed over — closed-over arrays become
program constants, which a remote dispatch setup re-ships per compile.

For each component it reports ms/step, the HBM bytes it must move, and the
implied bandwidth — the distance to the memory-bound speed of light is the
optimization headroom (v5e peak ~819 GB/s).

Usage: python experiments/decode_ablation.py [model] [batch] [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.layers import (
        QuantizedKV,
        QuantizedKVCache,
        _attend_quantized,
        decode_mask,
    )
    from yoho_tpu.nn.whisper import Whisper

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    cfg = WHISPER_PRESETS[model_name]
    n_layer = cfg.n_text_layer
    d_model = cfg.n_text_state
    n_head = cfg.n_text_head
    head_dim = d_model // n_head
    t_cross = cfg.n_audio_ctx
    horizon = 256  # matches bench.py: 4-token prompt + 224 decode, lane-rounded

    key = jax.random.PRNGKey(0)

    def randn(shape, dtype=jnp.bfloat16):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, dtype)

    # --- component state (passed as jit args, see module docstring) -------
    ckvs = [
        QuantizedKV(
            k_q=jax.random.randint(jax.random.fold_in(key, i),
                                   (batch, n_head, head_dim, t_cross),
                                   -127, 127, jnp.int8),
            v_q=jax.random.randint(jax.random.fold_in(key, i + 100),
                                   (batch, n_head, head_dim, t_cross),
                                   -127, 127, jnp.int8),
            k_scale=jnp.full((batch, n_head, 1, t_cross), 0.01, jnp.bfloat16),
            v_scale=jnp.full((batch, n_head, 1, t_cross), 0.01, jnp.bfloat16),
        )
        for i in range(n_layer)
    ]
    self_caches = [
        QuantizedKVCache.zeros(batch, n_head, horizon, head_dim)
        for _ in range(n_layer)
    ]

    GB = 1e9
    results = {}

    def report(name, s_per_iter, bytes_moved):
        ms = s_per_iter * 1e3
        bw = bytes_moved / s_per_iter / GB if bytes_moved else 0.0
        results[name] = (ms, bw)
        print(f"{name:34s} {ms:8.3f} ms/step   "
              f"{bytes_moved / GB:6.2f} GB -> {bw:6.0f} GB/s", flush=True)

    def run_component(name, fn, carry, consts, bytes_moved):
        def run(carry, consts, n):
            return jax.lax.fori_loop(0, n, lambda _i, c: fn(c, consts), carry)

        jfn = jax.jit(run, static_argnums=2)

        def timed(n):
            t0 = time.perf_counter()
            out = jfn(carry, consts, n)
            _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            return time.perf_counter() - t0

        timed(1)  # compile + warm
        t1 = min(timed(1) for _ in range(3))
        tn = min(timed(1 + reps) for _ in range(2))
        report(name, max((tn - t1) / reps, 1e-9), bytes_moved)

    # --- 1. cross-attention reads (all layers) ---------------------------
    def cross_step(x, ckvs):
        q = x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 1, 3)
        out = x
        for ckv in ckvs:
            a = _attend_quantized(q, ckv, None, jnp.bfloat16)  # (B, 1, H, D)
            out = out + a.reshape(batch, 1, d_model)
        return out * 0.999

    cross_bytes = n_layer * (
        2 * batch * n_head * head_dim * t_cross      # int8 k_q + v_q
        + 2 * batch * n_head * t_cross * 2           # bf16 scales
    )
    run_component("cross-attend int8 (all layers)", cross_step,
                  randn((batch, 1, d_model)), ckvs, cross_bytes)

    # --- 2. self-attention cache update + read (all layers) --------------
    def self_step(carry, _consts):
        x, caches, pos = carry
        new_caches = []
        q = x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 1, 3)
        kv_new = x.reshape(batch, 1, n_head, head_dim).transpose(0, 2, 3, 1)
        out = x
        for cache in caches:
            nc = cache.update(pos, kv_new, kv_new)
            mask = decode_mask(horizon, pos, 1)
            a = _attend_quantized(q, nc.as_quantized_kv(), mask, jnp.bfloat16)
            out = out + a.reshape(batch, 1, d_model)
            new_caches.append(nc)
        return out * 0.999, new_caches, (pos + 1) % horizon

    self_bytes = n_layer * (
        2 * batch * n_head * head_dim * horizon      # int8 reads
        + 2 * batch * n_head * horizon * 2           # scales
    )
    run_component("self-attend int8 upd+read", self_step,
                  (randn((batch, 1, d_model)), self_caches, jnp.int32(0)),
                  None, self_bytes)

    # --- 3. MLP + LN stack ------------------------------------------------
    w1 = [randn((d_model, 4 * d_model)) for _ in range(n_layer)]
    w2 = [randn((4 * d_model, d_model)) for _ in range(n_layer)]

    def mlp_step(x, ws):
        w1, w2 = ws
        out = x
        for a, b in zip(w1, w2):
            h = jax.nn.gelu(out @ a, approximate=False)
            out = out + 0.01 * (h @ b)
        return out * 0.999

    mlp_bytes = n_layer * (d_model * 4 * d_model * 2) * 2
    run_component("MLP stack (all layers)", mlp_step,
                  randn((batch, 1, d_model)), (w1, w2), mlp_bytes)

    # --- 4. attn projections (self qkvo + cross q/o) -----------------------
    wq = [randn((d_model, d_model)) for _ in range(6 * n_layer)]

    def proj_step(x, wq):
        out = x
        for w in wq:
            out = out + 0.01 * (out @ w)
        return out * 0.999

    run_component("attn projections (6/layer)", proj_step,
                  randn((batch, 1, d_model)), wq,
                  len(wq) * d_model * d_model * 2)

    # --- 5. logits --------------------------------------------------------
    emb = randn((cfg.n_vocab, d_model))

    def logits_step(x, emb):
        l = jnp.einsum("bsd,vd->bsv", x, emb,
                       preferred_element_type=jnp.float32)
        nxt = jnp.argmax(l[:, -1], axis=-1)
        return x + 1e-9 * nxt.astype(jnp.bfloat16)[:, None, None]

    run_component("tied logits + argmax", logits_step,
                  randn((batch, 1, d_model)), emb, cfg.n_vocab * d_model * 2)

    # --- 6. full assembled decode step -------------------------------------
    model = Whisper(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [
            (jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02).astype(s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else jnp.zeros(s.shape, s.dtype)
            for k, s in zip(keys, leaves)
        ],
    )

    def full_step(carry, consts):
        variables, ckvs = consts
        tok, caches, pos = carry
        logits, new_caches = model.apply(
            variables, tok, caches, ckvs, pos, method=Whisper.decode_step
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return nxt[:, None], new_caches, (pos + 1) % horizon

    dec_params = variables["params"]["decoder"]
    dec_bytes = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                    for l in jax.tree_util.tree_leaves(dec_params))
    full_bytes = cross_bytes + self_bytes + dec_bytes
    run_component("FULL decode step", full_step,
                  (jnp.zeros((batch, 1), jnp.int32), self_caches, jnp.int32(0)),
                  (variables, ckvs), full_bytes)

    print()
    comp_sum = sum(v[0] for k, v in results.items() if k != "FULL decode step")
    print(f"sum of components: {comp_sum:.3f} ms vs full step "
          f"{results['FULL decode step'][0]:.3f} ms")


if __name__ == "__main__":
    main()
