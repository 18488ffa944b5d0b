"""Quality check for weight-only int8 serving on a REAL trained model.

Reuses the overfit_e2e recipe: train the tiny YOHO model to convergence on
tone-coded sentences, then transcribe held-out audio with (a) bf16 weights
and (b) the int8-quantized decoder, reporting exact-match counts and
transcript agreement. An honest, dataset-free check that the per-channel
absmax scheme does not damage a converged model (random-weight tests can
only bound logit error).

Usage: python experiments/quantization_quality.py [workdir]
(run experiments/overfit_e2e.py first, or this trains from scratch)
"""

import contextlib
import io
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/yoho_overfit"


def main():
    import jax

    if jax.default_backend() != "cpu" and os.environ.get("JAX_PLATFORMS") is None:
        pass  # run wherever we are; tiny model either way

    if not Path(WORKDIR, "sessions/ov/stages/1/checkpoint.msgpack").exists():
        print("no trained session found — running overfit_e2e first...",
              flush=True)
        subprocess.run([sys.executable,
                        str(Path(__file__).parent / "overfit_e2e.py"),
                        WORKDIR], check=True)

    os.chdir(WORKDIR)

    from yoho_tpu.core.config import load_session_config
    from yoho_tpu.infer import Transcriber
    from yoho_tpu.nn.quantize import quantize_yoho_decoder
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.text.tokenizer import YOHOTokenizer
    from yoho_tpu.train.checkpoint import load_params

    config = load_session_config("ov")
    tok = YOHOTokenizer.load(config.weights.tokenizer)
    cfg = config.yoho
    vp_dim = config.hyperparameters.voiceprint_finetune.embedding_dim

    model = YOHOModel(cfg, tok.vocab_size, voiceprint_dim=vp_dim)
    import jax.numpy as jnp

    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.max_text_len), jnp.int32),
        jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32),
        method=YOHOModel.forward_with_voiceprints,
    )["params"]
    params = load_params(config.weights.asr, template)
    assert params is not None, "stage-1 weights missing"

    q_model = YOHOModel(cfg, tok.vocab_size, voiceprint_dim=vp_dim,
                        weights_int8=True)
    q_params = quantize_yoho_decoder(params)

    SENTS = ["hello world", "good morning", "thank you"]
    TONES = [440, 880, 1320]

    def transcribe_all(m, v, label):
        t = Transcriber(m, {"params": v}, family="yoho", tokenizer=tok,
                        batch_size=1)
        texts, hits = [], 0
        for s in range(3):
            g = np.random.default_rng(9)
            audio = (g.standard_normal(cfg.n_samples) * 0.002).astype(np.float32)
            tone = 0.4 * np.sin(2 * np.pi * TONES[s]
                                * np.arange(int(0.25 * 16000)) / 16000)
            audio[800:800 + len(tone)] += tone.astype(np.float32)
            res = t.transcribe(audio)
            texts.append(res.text)
            hits += SENTS[s] in res.text
        print(f"{label}: {hits}/3 exact sentences; "
              f"transcripts: {texts}", flush=True)
        return texts, hits

    with contextlib.redirect_stderr(io.StringIO()):
        texts_bf16, hits_bf16 = transcribe_all(model, params, "bf16 weights")
        texts_int8, hits_int8 = transcribe_all(q_model, q_params,
                                               "int8 weights")

    agree = sum(a == b for a, b in zip(texts_bf16, texts_int8))
    print(f"transcript agreement int8 vs bf16: {agree}/3", flush=True)
    print(f"RESULT: bf16 {hits_bf16}/3, int8 {hits_int8}/3", flush=True)


if __name__ == "__main__":
    main()
