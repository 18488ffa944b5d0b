"""Train the GENUINELY SMALLER draft for the quality fixture.

VERDICT r4 missing/weak: the only speculative-continuous measurement was
self-drafting (alpha = 1, draft as expensive as the target). This trains
a half-width, half-depth draft (32-dim, 1+1 layers vs the target's
64-dim 2+2) on the SAME tone-word corpus as
``build_quality_fixture.py`` — so draft/target token agreement (the
acceptance rate alpha) is an empirical property of two different trained
models, not an identity. Saved next to the target fixture; consumed by
``experiments/spec_continuous_bench.py`` and tests.

Usage: python experiments/build_quality_draft.py   (CPU, ~10 min)
"""

import json
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "whisper_quality"

DRAFT_CFG = dict(n_mels=80, n_audio_ctx=128, n_audio_state=32,
                 n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                 n_text_ctx=16, n_text_state=32, n_text_head=4,
                 n_text_layer=1, chunk_seconds=2.56)
STEPS, BATCH, LR = 1200, 32, 3e-3


def main() -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import build_quality_fixture as bq
    from yoho_tpu.audio.frontend import whisper_log_mel

    spec = json.loads((FIXTURE / "spec.json").read_text())
    cfg = WhisperConfig(**DRAFT_CFG)
    table = WhisperTokenTable(
        multilingual=True, text_backend=bq.WordBackend(spec["word_ids"]))
    model = Whisper(cfg)

    rng = np.random.default_rng(0)
    # Same training distribution as the target (its exact train split —
    # regenerate with the builder's seed/protocol).
    train_sents = bq.make_sentences(rng, bq.N_TRAIN)

    prompt = table.sot_sequence("en", "transcribe", timestamps=False)
    P, T = len(prompt), cfg.n_text_ctx

    def encode_batch(sents):
        tok = np.full((len(sents), T), table.eot, np.int32)
        mask = np.zeros((len(sents), T), np.float32)
        for i, s in enumerate(sents):
            ids = prompt + table.encode_text(s) + [table.eot]
            tok[i, :len(ids)] = ids
            mask[i, P:len(ids)] = 1.0
        return tok, mask

    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, LR, 100, STEPS), weight_decay=1e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, mel, tok, mask):
        def loss_fn(params):
            logits = model.apply({"params": params}, mel, tok)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], tok[:, 1:])
            return jnp.sum(ce * mask[:, 1:]) / jnp.sum(mask[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for it in range(STEPS):
        idx = rng.integers(0, bq.N_TRAIN, BATCH)
        sents = [train_sents[i] for i in idx]
        audio = np.stack([bq.synth(s, rng, bq.NOISE * 0.7, cfg.n_samples)
                          for s in sents])
        tok, mask = encode_batch(sents)
        mel = whisper_log_mel(jnp.asarray(audio), n_mels=cfg.n_mels)
        params, opt_state, loss = step(params, opt_state, mel,
                                       jnp.asarray(tok), jnp.asarray(mask))
        if it % 100 == 0:
            print(f"step {it}: loss {float(loss):.4f}", flush=True)
    print(f"final loss {float(loss):.4f}")

    bf16_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    # Draft-alone held-out WER (context for alpha: a weaker model that
    # still mostly agrees with the target).
    from yoho_tpu.eval.wer import wer
    from yoho_tpu.infer.pipeline import Transcriber

    eval_rng = np.random.default_rng(spec["eval_seed"])
    eval_audio = [bq.synth(s, eval_rng, spec["noise"], cfg.n_samples)
                  for s in spec["eval_sentences"]]
    t = Transcriber(Whisper(cfg, dtype=jnp.bfloat16),
                    {"params": bf16_params}, family="whisper",
                    token_table=table, batch_size=8, timestamps=False)
    hyps = [r.text for r in t.transcribe_many(eval_audio)]
    rate, _ = wer(spec["eval_sentences"], hyps, normalize=False)
    print(f"draft held-out WER {rate:.4f} "
          f"(target bf16: {spec['wer']['bf16']:.4f})")

    from yoho_tpu.train.checkpoint import save_params

    save_params(FIXTURE / "draft_params.msgpack", bf16_params)
    (FIXTURE / "draft_config.json").write_text(json.dumps(DRAFT_CFG))
    spec["draft_wer"] = round(float(rate), 4)
    (FIXTURE / "spec.json").write_text(json.dumps(spec, indent=1))
    print("draft written to", FIXTURE)


if __name__ == "__main__":
    main()
