"""Training-step throughput benchmark (audio-seconds trained per second).

Measures the full stage-1 step — on-device mel -> forward -> masked CE ->
grads -> AdamW — for the default YOHO config on the available devices, using
the in-jit chained-repetition methodology from bench.py.

Usage: python experiments/training_benchmark.py [batch_size]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.audio.frontend import yoho_log_mel
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.mesh import make_mesh, shard_batch
    from yoho_tpu.parallel.sharding import shard_params
    from yoho_tpu.train.trainer import masked_ce_loss

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = YOHOConfig()  # default: 384 dims, 4+4 blocks, 1024 frames, 128 mels
    vocab = 16000
    model = YOHOModel(cfg, vocab_size=vocab, dtype=jnp.bfloat16)
    mesh = make_mesh()

    tokens0 = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mel0 = jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), tokens0, mel0,
                           method=YOHOModel.forward_with_voiceprints)["params"]
    )()
    params = shard_params(params, mesh)
    optimizer = optax.adamw(1e-4)
    state = jax.jit(lambda p: TrainState.create(
        apply_fn=model.apply, params=p, tx=optimizer))(params)

    def loss_fn(params, mel, tokens, mask):
        logits = model.apply({"params": params}, tokens, mel)
        return masked_ce_loss(logits, tokens, mask)

    def step(state, audio, tokens, mask):
        mel = yoho_log_mel(audio, cfg)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, mel, tokens, mask)
        return state.apply_gradients(grads=grads), loss

    def run_many(state, audio, tokens, mask, n):
        def body(_i, carry):
            state, acc = carry
            state, loss = step(state, audio + acc * 1e-9, tokens, mask)
            return state, acc + loss
        state, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc

    fn = jax.jit(run_many, donate_argnums=(0,))

    g = np.random.default_rng(0)
    audio = jnp.asarray(g.standard_normal((batch, cfg.n_samples)).astype(np.float32) * 0.1)
    tokens = jnp.asarray(g.integers(0, vocab, (batch, cfg.max_text_len)).astype(np.int32))
    mask = jnp.ones((batch, cfg.max_text_len), jnp.uint8)
    audio, tokens, mask = shard_batch(mesh, (np.asarray(audio), np.asarray(tokens),
                                             np.asarray(mask)))

    def state_copy():
        return jax.jit(lambda p: TrainState.create(
            apply_fn=model.apply, params=p, tx=optimizer))(params)

    float(fn(state_copy(), audio, tokens, mask, 1))  # compile

    def timed(n):
        s = state_copy()
        t0 = time.perf_counter()
        float(fn(s, audio, tokens, mask, n))
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(2))
    tk = timed(6)
    per_step = (tk - t1) / 5
    audio_seconds = batch * cfg.max_input_seconds
    print(f"train step (B={batch}, default YOHO config, {len(jax.devices())} dev): "
          f"{per_step * 1e3:.1f} ms -> {audio_seconds / per_step:.0f} audio-s/s")


if __name__ == "__main__":
    main()
