"""Measure the VAD silence-collapse lever end-to-end on the chip.

Builds a long-form request that is X% silence (default 50%), runs
Transcriber.transcribe() with and without vad_filter, and reports
wall-clock + effective RTF (audio-seconds of SOURCE audio per second).
Random weights (no egress), so decode runs the full horizon both ways —
exactly the dense-serving cost model; the VAD win is the skipped windows
minus the host VAD pass.

Env: VAD_MODEL (default small), VAD_BATCH (default 64),
VAD_SILENCE_FRAC (default 0.5), VAD_MINUTES (default 16).

Usage: python experiments/vad_serving_bench.py   (TPU; first compile is slow)
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    model_name = os.environ.get("VAD_MODEL", "small")
    batch = int(os.environ.get("VAD_BATCH", "64"))
    silence_frac = float(os.environ.get("VAD_SILENCE_FRAC", "0.5"))
    minutes = float(os.environ.get("VAD_MINUTES", "16"))

    cfg = WHISPER_PRESETS[model_name]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
    )

    # Source audio: alternating speech-like noise and digital silence in
    # window-sized runs, at the requested silence fraction.
    sr = cfg.sample_rate
    win = cfg.n_samples
    n_win = max(int(minutes * 60 * sr) // win, 1)
    n_speech = max(round(n_win * (1 - silence_frac)), 1)
    g = np.random.default_rng(0)
    audio = np.zeros(n_win * win, np.float32)
    # Spread the speech windows evenly through the timeline.
    speech_idx = {int(k * n_win / n_speech) for k in range(n_speech)}
    for i in sorted(speech_idx):
        audio[i * win : (i + 1) * win] = 0.1 * g.standard_normal(win)
    dur_s = len(audio) / sr

    from yoho_tpu.audio.vad import collapse_silence
    from yoho_tpu.infer.longform import chunk_audio

    results = {}
    for vad in (False, True):
        t = Transcriber(model, variables, family="whisper",
                        token_table=WhisperTokenTable(),
                        batch_size=batch, cache_dtype=jnp.bfloat16,
                        quantized_cross_kv=True, quantized_cache=True,
                        vad_filter=vad)
        src = collapse_silence(audio, sr)[0] if vad else audio
        n_windows = len(chunk_audio(src, win, t.stride_samples)[0])
        n_batches = -(-n_windows // batch)
        t.transcribe(audio[: win * 2])  # compile outside the timed region
        t0 = time.time()
        res = t.transcribe(audio)
        el = time.time() - t0
        results[vad] = el
        print(f"vad={vad}: {el:.2f}s wall for {dur_s:.0f}s source audio "
              f"({n_windows} windows -> {n_batches} batches of {batch}) "
              f"-> effective RTF {dur_s / el:.0f}x "
              f"({len(res.segments)} segments)")

    print(f"speedup from VAD at {silence_frac:.0%} silence: "
          f"{results[False] / results[True]:.2f}x")


if __name__ == "__main__":
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
