"""Continuous vs micro-batching: queue-latency mechanism demo.

Staggered requests against one Transcriber through both batchers (the
trained micro-whisper fixture keeps decode realistic: short, variable
EOT). The micro-batcher groups whatever is waiting and runs the batch to
completion — a request arriving mid-batch waits for the whole decode; the
slot engine admits it at the next K-token chunk. Measures per-request
completion latency (p50/p95) for both.

Run on CPU (mechanism, not chip perf): the interesting quantity is queue
wait, which depends on scheduling, not FLOPs.

Usage: python experiments/continuous_bench.py [n_requests] [stagger_ms]
"""

import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
FIX = REPO / "tests" / "fixtures" / "whisper_tiny"


class _WordBackend:
    def __init__(self, w):
        self.w = {k: int(v) for k, v in w.items()}
        self.r = {v: k for k, v in self.w.items()}

    def encode(self, t, add_special_tokens=False):
        return [self.w[x] for x in t.split()]

    def decode(self, ids):
        return " ".join(self.r[int(i)] for i in ids if int(i) in self.r)


def build_transcriber(draft_gamma: int = 0):
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable
    from yoho_tpu.train.checkpoint import load_params

    cfg = WhisperConfig(**json.loads((FIX / "config.json").read_text()))
    words = json.loads((FIX / "word_vocab.json").read_text())
    model = Whisper(cfg, dtype=jnp.bfloat16)
    table = WhisperTokenTable(multilingual=True,
                              text_backend=_WordBackend(words))
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), template)
    params = load_params(FIX / "params.msgpack", template)
    kw = {}
    if draft_gamma:
        # The fixture drafts for ITSELF (alpha = 1, every proposal
        # accepted): isolates the slot-composition mechanics. A real
        # deployment pairs a SMALLER draft; the throughput model is
        # experiments/speculative_bench.py's (win ~ alpha * t_target /
        # t_draft) — self-drafting measures pure mechanism overhead.
        kw = dict(draft_model=model, draft_variables={"params": params},
                  speculative_gamma=draft_gamma)
    return Transcriber(model, {"params": params}, family="whisper",
                       token_table=table, batch_size=4, timestamps=False,
                       **kw), cfg


def tone_clip(s: int, n_samples: int, tones=(440, 880, 1320)) -> np.ndarray:
    a = (np.random.default_rng(9).standard_normal(n_samples) * 0.002
         ).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * tones[s % 3]
                        * np.arange(int(0.25 * 16000)) / 16000)
    a[800:800 + len(tone)] += tone.astype(np.float32)
    return a


def drive(batcher, clips, stagger_s):
    lat = [None] * len(clips)

    def one(i):
        t0 = time.monotonic()
        batcher.submit(clips[i])
        lat[i] = time.monotonic() - t0

    threads = []
    for i in range(len(clips)):
        th = threading.Thread(target=one, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(stagger_s)
    for th in threads:
        th.join(timeout=600)
    return np.asarray(lat, np.float64)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    stagger_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

    from yoho_tpu.infer.batching import MicroBatcher
    from yoho_tpu.infer.continuous import ContinuousBatcher

    t, cfg = build_transcriber()
    # Mixed request sizes — every 3rd request is LONG (5 windows). The
    # micro-batcher pools all concurrent requests' windows into shared
    # batches, so a short request queued behind a long one waits for the
    # whole pooled decode; the slot engine interleaves them.
    clips = [
        (np.concatenate([tone_clip(i + j, cfg.n_samples) for j in range(5)])
         if i % 3 == 0 else tone_clip(i, cfg.n_samples))
        for i in range(n)
    ]
    short_idx = [i for i in range(n) if i % 3 != 0]
    # Warm each path's compiles on the SAME instance that gets measured
    # (a fresh batcher means fresh jit objects and a mid-measurement
    # recompile).
    micro = MicroBatcher(t, max_batch=4, max_wait_ms=25)
    micro.submit(clips[0])
    lat_m = drive(micro, clips, stagger_ms / 1e3)
    micro.close()

    cont = ContinuousBatcher(t, max_batch=4, chunk_tokens=4)
    cont.submit(clips[0])
    lat_c = drive(cont, clips, stagger_ms / 1e3)
    cont.close()

    # Speculative slots (VERDICT r2 item 2): same staggered load through
    # the draft-carrying engine. Self-drafting (alpha = 1) measures the
    # composition's mechanism overhead; the REAL latency lever is a
    # smaller draft (speculative_bench.py's model: alpha * t_tgt/t_draft).
    t_spec, _ = build_transcriber(draft_gamma=4)
    spec = ContinuousBatcher(t_spec, max_batch=4, chunk_tokens=8)
    spec.submit(clips[0])
    lat_s = drive(spec, clips, stagger_ms / 1e3)
    spec.close()

    def stats(x):
        return (f"p50 {np.percentile(x, 50)*1e3:6.1f} ms  "
                f"p95 {np.percentile(x, 95)*1e3:6.1f} ms  "
                f"max {x.max()*1e3:6.1f} ms")

    print(f"{n} requests (1/3 long = 5 windows), {stagger_ms:.0f} ms "
          f"stagger, 4 slots:")
    print(f"  all   micro      : {stats(lat_m)}")
    print(f"  all   continuous : {stats(lat_c)}")
    print(f"  all   cont+draft : {stats(lat_s)}")
    print(f"  short micro      : {stats(lat_m[short_idx])}")
    print(f"  short continuous : {stats(lat_c[short_idx])}")
    print(f"  short cont+draft : {stats(lat_s[short_idx])}")
    print(f"  short-request p95 speedup (cont vs micro): "
          f"{np.percentile(lat_m[short_idx],95)/np.percentile(lat_c[short_idx],95):.2f}x")
    print(f"  short-request p95 spec overhead (cont+draft vs cont): "
          f"{np.percentile(lat_s[short_idx],95)/np.percentile(lat_c[short_idx],95):.2f}x")


if __name__ == "__main__":
    main()
