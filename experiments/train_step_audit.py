"""Stage-1 training-step audit: MFU + component breakdown + mel ablation.

Answers three questions the one-line training number in PERFORMANCE.md
left open:

1. What fraction of the step is the on-device mel frontend, and does the
   fused Pallas kernel (``ops/mel_kernel.fused_yoho_log_mel``, 9x the XLA
   path at inference) move end-to-end training throughput?
2. What MFU does the step reach (cost_analysis FLOPs / wall / peak)?
3. Where does throughput saturate in batch size?

Methodology: in-jit chained repetition (data-dependent ``fori_loop``) +
host materialization, per bench.py / CLAUDE.md — per-call wall times on
the tunneled TPU measure RPC shipping, not the chip.

Usage: python experiments/train_step_audit.py [batch ...]
"""

import sys
import time

import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s per chip


def build(batch, fused_mel):
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.audio.frontend import yoho_log_mel
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.train.trainer import masked_ce_loss

    cfg = YOHOConfig()
    vocab = 16000
    model = YOHOModel(cfg, vocab_size=vocab, dtype=jnp.bfloat16)

    tokens0 = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mel0 = jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), tokens0, mel0,
                           method=YOHOModel.forward_with_voiceprints)["params"]
    )()
    optimizer = optax.adamw(1e-4)

    def make_state():
        return jax.jit(lambda p: TrainState.create(
            apply_fn=model.apply, params=p, tx=optimizer))(params)

    if fused_mel:
        from yoho_tpu.ops.mel_kernel import fused_yoho_log_mel

        mel_fn = lambda audio: fused_yoho_log_mel(audio, cfg)  # noqa: E731
    else:
        mel_fn = lambda audio: yoho_log_mel(audio, cfg)  # noqa: E731

    def loss_fn(params, mel, tokens, mask):
        logits = model.apply({"params": params}, tokens, mel)
        return masked_ce_loss(logits, tokens, mask)

    def step(state, audio, tokens, mask):
        mel = mel_fn(audio)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, mel,
                                                  tokens, mask)
        return state.apply_gradients(grads=grads), loss

    g = np.random.default_rng(0)
    audio = jnp.asarray(
        g.standard_normal((batch, cfg.n_samples)).astype(np.float32) * 0.1)
    tokens = jnp.asarray(
        g.integers(0, vocab, (batch, cfg.max_text_len)).astype(np.int32))
    mask = jnp.ones((batch, cfg.max_text_len), jnp.uint8)
    mel_const = jax.jit(mel_fn)(audio)
    return (cfg, make_state, step, loss_fn, mel_fn, audio, tokens, mask,
            mel_const)


def chained(fn, n_args, donate=()):
    """Wrap a (carry, *args) -> (carry, loss) step into an n-rep chained
    jit with a data dependency between iterations."""
    import jax
    import jax.numpy as jnp

    def run_many(carry, *rest):
        *args, n = rest

        def body(_i, c):
            carry, acc = c
            carry, loss = fn(carry, *args, acc)
            return carry, acc + loss

        _, acc = jax.lax.fori_loop(0, n, body, (carry, jnp.float32(0)))
        return acc

    return jax.jit(run_many, donate_argnums=donate)


def timeit(fn, make_carry, args, reps=6):
    t1 = None
    for _ in range(2):
        c = make_carry()
        t0 = time.perf_counter()
        float(fn(c, *args, 1))
        t = time.perf_counter() - t0
        t1 = t if t1 is None else min(t1, t)
    c = make_carry()
    t0 = time.perf_counter()
    float(fn(c, *args, reps))
    tk = time.perf_counter() - t0
    return (tk - t1) / (reps - 1)


def audit(batch):
    import jax
    import jax.numpy as jnp

    (cfg, make_state, step, loss_fn, mel_fn, audio, tokens, mask,
     mel_const) = build(batch, fused_mel=False)

    # --- full step, XLA mel ---
    full = chained(lambda s, a, t, m, acc: step(s, a + acc * 1e-9, t, m),
                   3, donate=(0,))
    t_full = timeit(full, make_state, (audio, tokens, mask))

    # --- step on precomputed mel (no frontend) ---
    def step_nomel(state, mel, tokens, mask, acc):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, mel + acc * 1e-9, tokens, mask)
        return state.apply_gradients(grads=grads), loss

    nomel = chained(step_nomel, 3, donate=(0,))
    t_nomel = timeit(nomel, make_state, (mel_const, tokens, mask))

    # --- mel alone: XLA vs fused Pallas ---
    def mel_only(carry, audio, acc):
        m = mel_fn(audio + acc * 1e-9)
        return carry, jnp.sum(m[:, 0, 0])

    melx = chained(mel_only, 2)
    t_melx = timeit(melx, lambda: jnp.float32(0), (audio,))

    from yoho_tpu.ops.mel_kernel import fused_yoho_log_mel

    def mel_fused_only(carry, audio, acc):
        m = fused_yoho_log_mel(audio + acc * 1e-9, cfg)
        return carry, jnp.sum(m[:, 0, 0])

    melf = chained(mel_fused_only, 2)
    t_melf = timeit(melf, lambda: jnp.float32(0), (audio,))

    # --- full step, fused mel ---
    (_, make_state_f, step_f, *_rest) = build(batch, fused_mel=True)
    full_f = chained(lambda s, a, t, m, acc: step_f(s, a + acc * 1e-9, t, m),
                     3, donate=(0,))
    t_full_f = timeit(full_f, make_state_f, (audio, tokens, mask))

    # --- FLOPs / MFU (XLA-mel program; flops dominated by the model) ---
    lowered = jax.jit(lambda s, a, t, m: step(s, a, t, m)).lower(
        make_state(), audio, tokens, mask)
    cost = lowered.compile().cost_analysis()
    flops = (cost or {}).get("flops", float("nan"))
    mfu = flops / t_full / V5E_PEAK_BF16 if flops == flops else float("nan")

    au_s = batch * cfg.max_input_seconds
    print(f"B={batch:4d}: full {t_full * 1e3:7.2f} ms "
          f"({au_s / t_full:7.0f} au-s/s)  model-only {t_nomel * 1e3:7.2f}  "
          f"mel XLA {t_melx * 1e3:6.2f}  mel fused {t_melf * 1e3:6.2f}  "
          f"full+fused {t_full_f * 1e3:7.2f} ms "
          f"({au_s / t_full_f:7.0f} au-s/s)  "
          f"flops {flops / 1e9:.1f} G  MFU {mfu * 100:.1f}%",
          flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64]
    for b in batches:
        audit(b)


if __name__ == "__main__":
    main()
