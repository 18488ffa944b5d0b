"""Bisect the stage-1 training step's 20% MFU (see train_step_audit.py).

Times, with in-jit chained repetition: forward only, forward+backward,
encoder-only fwd+bwd, decoder-only fwd+bwd (frozen precomputed encoder
output), optimizer update alone, and the logits+CE tail alone — to find
which component keeps the step at 1/5th of the chip.

Usage: python experiments/train_step_bisect.py [batch]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.train.trainer import masked_ce_loss

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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
    state = jax.jit(lambda p: TrainState.create(
        apply_fn=model.apply, params=p, tx=optimizer))(params)

    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal(
        (batch, cfg.max_audio_len, cfg.n_mel_bands)).astype(np.float32))
    tokens = jnp.asarray(
        g.integers(0, vocab, (batch, cfg.max_text_len)).astype(np.int32))
    mask = jnp.ones((batch, cfg.max_text_len), jnp.uint8)
    xa_const = jax.jit(lambda m: model.apply(
        {"params": params}, m, method=YOHOModel.encode_audio))(mel)

    def chained(step):
        def run_many(carry, a, b, c, n):
            def body(_i, cc):
                carry, acc = cc
                return step(carry, a, b, c, acc)

            _, acc = jax.lax.fori_loop(0, n, body, (carry, jnp.float32(0)))
            return acc

        return jax.jit(run_many)

    def timeit(fn, carry, args, reps=6):
        t1 = None
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(carry, *args, 1))
            t = time.perf_counter() - t0
            t1 = t if t1 is None else min(t1, t)
        t0 = time.perf_counter()
        float(fn(carry, *args, reps))
        tk = time.perf_counter() - t0
        return (tk - t1) / (reps - 1)

    def gnorm(grads):
        return optax.global_norm(grads)

    # forward only
    def fwd(carry, mel, tokens, mask, acc):
        logits = model.apply({"params": state.params}, tokens,
                             mel + acc * 1e-9)
        return carry, acc + masked_ce_loss(logits, tokens, mask)

    # forward+backward (all grads consumed via global_norm)
    def fwdbwd(carry, mel, tokens, mask, acc):
        def loss_fn(p):
            logits = model.apply({"params": p}, tokens, mel + acc * 1e-9)
            return masked_ce_loss(logits, tokens, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return carry, acc + loss + gnorm(grads)

    # encoder-only fwd+bwd
    def enc(carry, mel, tokens, mask, acc):
        def loss_fn(p):
            xa = model.apply({"params": p}, mel + acc * 1e-9,
                             method=YOHOModel.encode_audio)
            return jnp.sum(xa.astype(jnp.float32) ** 2) * 1e-6

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return carry, acc + loss + gnorm(grads)

    # decoder-only fwd+bwd on a frozen encoder output
    def dec(carry, xa, tokens, mask, acc):
        def loss_fn(p):
            logits = model.apply({"params": p}, tokens, xa + acc * 1e-9,
                                 method=YOHOModel.decode_text)
            return masked_ce_loss(logits, tokens, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return carry, acc + loss + gnorm(grads)

    # logits+CE tail alone, fwd+bwd, on a frozen hidden state
    h_const = jnp.asarray(g.standard_normal(
        (batch, cfg.max_text_len, cfg.dims)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    def tail(carry, h, tokens, mask, acc):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, h + acc * jnp.bfloat16(1e-9),
                method=lambda m, hh: m.decoder._logits(hh))
            return masked_ce_loss(logits, tokens, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return carry, acc + loss + gnorm(grads)

    # optimizer alone (constant grads)
    grads_const = jax.jit(lambda: jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 1e-6), state.params))()

    def opt(carry_state, _a, _b, _c, acc):
        new = carry_state.apply_gradients(
            grads=jax.tree_util.tree_map(
                lambda x: x + acc * 1e-12, grads_const))
        return new, acc + new.step.astype(jnp.float32) * 1e-9

    runs = [
        ("fwd only", fwd, jnp.float32(0), (mel, tokens, mask)),
        ("fwd+bwd", fwdbwd, jnp.float32(0), (mel, tokens, mask)),
        ("encoder fwd+bwd", enc, jnp.float32(0), (mel, tokens, mask)),
        ("decoder fwd+bwd", dec, jnp.float32(0), (xa_const, tokens, mask)),
        ("logits+CE tail", tail, jnp.float32(0), (h_const, tokens, mask)),
        ("optimizer only", opt, state, (mel, tokens, mask)),
    ]
    for name, step, carry, args in runs:
        t = timeit(chained(step), carry, args)
        print(f"B={batch}: {name:16s} {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
