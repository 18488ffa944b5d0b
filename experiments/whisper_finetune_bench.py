"""Throughput of the `yoho finetune` train step on real TPU.

Whisper-small-shaped (random init — weights don't change FLOPs), full
30 s windows, measuring audio-seconds-trained/sec/chip and MFU for the
full fine-tune step (on-device mel -> encoder+decoder fwd+bwd -> AdamW)
and the --freeze-encoder variant. In-jit chained repetition + host
materialization per bench.py / CLAUDE.md (per-call walls on the
tunneled chip measure RPC shipping, not device work).

Usage: python experiments/whisper_finetune_bench.py [model] [batch ...]
"""

import sys
import time

V5E_PEAK_BF16 = 197e12


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.audio.frontend import whisper_log_mel
    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.train.trainer import masked_ce_loss

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batches = [int(a) for a in sys.argv[2:]] or [8, 16, 32]
    cfg = WHISPER_PRESETS[model_name]
    model = Whisper(cfg, dtype=jnp.bfloat16)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), params)

    def build(batch, freeze):
        inner = optax.adamw(1e-5)
        if freeze:
            inner = optax.multi_transform(
                {"train": inner, "freeze": optax.set_to_zero()},
                param_labels=lambda p: {
                    k: ("freeze" if k == "encoder" else "train")
                    for k in p})
        tx = inner

        def make_state():
            return jax.jit(lambda p: TrainState.create(
                apply_fn=model.apply, params=p, tx=tx))(params)

        def loss_fn(p, mel, tokens, mask):
            logits = model.apply({"params": p}, mel, tokens)
            return masked_ce_loss(logits, tokens, mask)

        def step(state, audio, tokens, mask, acc):
            mel = whisper_log_mel(audio + acc * 1e-9, n_mels=cfg.n_mels)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, mel, tokens, mask)
            return state.apply_gradients(grads=grads), loss

        def run_many(state, audio, tokens, mask, n):
            def body(_i, c):
                state, acc = c
                state, loss = step(state, audio, tokens, mask, acc)
                return state, acc + loss

            _, acc = jax.lax.fori_loop(0, n, body,
                                       (state, jnp.float32(0)))
            return acc

        return make_state, jax.jit(run_many, donate_argnums=(0,))

    g = np.random.default_rng(0)
    for batch in batches:
        audio = jnp.asarray(
            g.standard_normal((batch, cfg.n_samples)).astype(np.float32)
            * 0.05)
        T = 224
        tokens = jnp.asarray(
            g.integers(0, cfg.n_vocab, (batch, T)).astype(np.int32))
        mask = jnp.ones((batch, T), jnp.uint8)
        for freeze in (False, True):
            make_state, fn = build(batch, freeze)
            t1 = None
            try:
                for _ in range(2):
                    s = make_state()
                    t0 = time.perf_counter()
                    float(fn(s, audio, tokens, mask, 1))
                    t = time.perf_counter() - t0
                    t1 = t if t1 is None else min(t1, t)
                reps = 6
                s = make_state()
                t0 = time.perf_counter()
                float(fn(s, audio, tokens, mask, reps))
                tk = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001 — OOM at this batch
                print(f"B={batch:3d} freeze={int(freeze)}: {type(e).__name__}",
                      flush=True)
                continue
            dt = (tk - t1) / (reps - 1)
            au_s = batch * cfg.chunk_seconds
            tag = "freeze-enc" if freeze else "full      "
            print(f"{model_name} B={batch:3d} {tag}: {dt * 1e3:8.2f} ms/step "
                  f"({au_s / dt:7.0f} audio-s trained /s)", flush=True)


if __name__ == "__main__":
    main()
