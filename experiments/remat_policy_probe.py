"""Remat-policy probe: can selective rematerialization SPEED UP training?

The stage-1 training-step audit (``train_step_audit.py``, PERFORMANCE.md
"Training-step audit") found the step is activation-bandwidth-bound at
20-25% MFU: at dims=384 every matmul is too narrow to hide the HBM
traffic of the residuals the backward pass re-reads, and the MXU idles.
Full-block ``nn.remat`` is shipped as a *capacity* lever (exact, trades
one extra forward for O(1) live blocks) — but on a bandwidth-bound step
with idle MXU, rematerialization can also be a *throughput* lever: the
recompute FLOPs ride otherwise-idle cycles while the saved-residual
stores+loads disappear.

This probe times the stage-1 YOHO step (reference main loop:
/root/reference/train/stages/transcription_pretrain_no_voiceprints.py:224-325)
under four policies:

  baseline    — no remat (what the audit measured)
  block       — shipped full-block ``nn.remat`` (save block inputs only)
  dots        — ``jax.checkpoint(loss_fn, policy=dots_saveable)``: save
                every matmul output, recompute elementwise (GELU, norms,
                softmax) in backward — drops e.g. the (B,T,4*dims) GELU
                output store+load per MLP without re-running any matmul
  nodots      — ``policy=dots_with_no_batch_dims_saveable``: batched
                dots are NOT saved either, so backward re-runs the
                forward matmuls too (≈ whole-fn full remat; FLOPs-heavy
                bound for comparison)

Methodology per CLAUDE.md: in-jit chained repetition with a data
dependency between iterations, donated carry, host materialization;
min-of-2 single-rep runs subtracted from a k-rep run.

Usage: python experiments/remat_policy_probe.py [batch ...]
"""

import sys
import time


def build(batch, remat_block):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.audio.frontend import yoho_log_mel
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.train.trainer import masked_ce_loss

    cfg = YOHOConfig()
    vocab = 16000
    model = YOHOModel(cfg, vocab_size=vocab, dtype=jnp.bfloat16,
                      remat=remat_block)

    tokens0 = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mel0 = jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
    # Init with the SAME method the timed loss calls (plain __call__):
    # forward_with_voiceprints would also create voiceprint-head params
    # that sit unused in the loss yet still receive AdamW updates,
    # slightly overstating every policy's absolute ms/step.
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), tokens0, mel0)["params"]
    )()
    optimizer = optax.adamw(1e-4)

    def make_state():
        return jax.jit(lambda p: TrainState.create(
            apply_fn=model.apply, params=p, tx=optimizer))(params)

    def loss_fn(params, mel, tokens, mask):
        logits = model.apply({"params": params}, tokens, mel)
        return masked_ce_loss(logits, tokens, mask)

    g = np.random.default_rng(0)
    audio = jnp.asarray(
        g.standard_normal((batch, cfg.n_samples)).astype(np.float32) * 0.1)
    tokens = jnp.asarray(
        g.integers(0, vocab, (batch, cfg.max_text_len)).astype(np.int32))
    mask = jnp.ones((batch, cfg.max_text_len), jnp.uint8)
    mel = jax.jit(lambda a: yoho_log_mel(a, cfg))(audio)
    return cfg, make_state, loss_fn, mel, tokens, mask


def chained_step(loss_fn):
    import jax

    def step(state, mel, tokens, mask, acc):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, mel + acc * 1e-9, tokens, mask)
        return state.apply_gradients(grads=grads), loss

    def run_many(state, mel, tokens, mask, n):
        import jax.numpy as jnp

        def body(_i, c):
            state, acc = c
            state, loss = step(state, mel, tokens, mask, acc)
            return state, acc + loss

        _, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc

    return jax.jit(run_many, donate_argnums=(0,))


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


def probe(batch):
    import jax

    cfg, make_state, loss_fn, mel, tokens, mask = build(batch,
                                                        remat_block=False)
    au_s = batch * cfg.max_input_seconds
    rows = []

    def run(tag, fn):
        t = timeit(chained_step(fn), make_state, (mel, tokens, mask))
        rows.append((tag, t))
        print(f"B={batch:4d} {tag:>8}: {t * 1e3:7.2f} ms/step "
              f"({au_s / t:7.0f} au-s/s)", flush=True)

    run("baseline", loss_fn)
    run("dots", jax.checkpoint(
        loss_fn, policy=jax.checkpoint_policies.dots_saveable))
    run("nodots", jax.checkpoint(
        loss_fn,
        policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable))

    _, make_state_b, loss_fn_b, *_ = build(batch, remat_block=True)
    t = timeit(chained_step(loss_fn_b), make_state_b, (mel, tokens, mask))
    rows.append(("block", t))
    print(f"B={batch:4d} {'block':>8}: {t * 1e3:7.2f} ms/step "
          f"({au_s / t:7.0f} au-s/s)", flush=True)

    base = dict(rows)["baseline"]
    for tag, t in rows:
        print(f"    {tag:>8}: {base / t:5.2f}x vs baseline", flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64]
    for b in batches:
        probe(b)


if __name__ == "__main__":
    main()
