"""Speculative x continuous with a GENUINELY smaller trained draft.

VERDICT r4 weak #3: the only measured spec-continuous point was
self-drafting (alpha = 1, draft cost = target cost) — a 3.4x p95
slowdown that says nothing about the composition's intended operating
point. This measures the real thing on the quality-fixture pair
(64-dim 2+2 target + 32-dim 1+1 draft, both trained on the tone-word
corpus; ``build_quality_fixture.py`` / ``build_quality_draft.py``):

  1. alpha — the measured per-round acceptance rate, by driving the
     spec slot engine directly and reading per-chunk cursor advances
     (m_bar = 1 + alpha*gamma per round, exactly);
  2. staggered-arrival wall latency p50/p95, greedy slots vs spec
     slots, CPU (mechanism; CPU step costs are dispatch-dominated, so
     the wall numbers bound overhead, not chip speedup);
  3. the chip projection: speedup = m_bar / (gamma*c + 1) with the
     measured alpha and a draft/target step-cost ratio c — the same
     cost model speculative_bench.py validated on-chip; with the
     half-width/half-depth draft here, c ~ 0.25 of the target step.

Usage: python experiments/spec_continuous_bench.py [gamma ...]
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
FIX = REPO / "tests" / "fixtures" / "whisper_quality"


def load_pair():
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import build_quality_fixture as bq
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable
    from yoho_tpu.train.checkpoint import load_params

    spec = json.loads((FIX / "spec.json").read_text())
    table = WhisperTokenTable(
        multilingual=True, text_backend=bq.WordBackend(spec["word_ids"]))

    def load(cfg_file, params_file):
        cfg = WhisperConfig(**json.loads((FIX / cfg_file).read_text()))
        model = Whisper(cfg, dtype=jnp.bfloat16)
        template = jax.eval_shape(
            Whisper(cfg).init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
            jnp.zeros((1, 4), jnp.int32))["params"]
        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                if jnp.issubdtype(s.dtype, jnp.floating)
                                else s.dtype), template)
        return model, {"params": load_params(FIX / params_file, template)}

    target, t_vars = load("config.json", "params.msgpack")
    draft, d_vars = load("draft_config.json", "draft_params.msgpack")
    eval_rng = np.random.default_rng(spec["eval_seed"])
    clips = [bq.synth(s, eval_rng, spec["noise"], target.cfg.n_samples)
             for s in spec["eval_sentences"]]
    return bq, spec, table, target, t_vars, draft, d_vars, clips


def measure_alpha(t_spec, clips, gamma):
    """Drive the spec slot engine directly; per-chunk cursor advances
    give committed-tokens-per-round exactly."""
    from yoho_tpu.infer.slot_engine import SlotEngine, _Window

    eng = SlotEngine(t_spec, slots=4, chunk_tokens=gamma + 1)  # 1 round/chunk
    prompt = np.asarray(t_spec._prompt_ids(), np.int32)
    committed, rounds = 0, 0
    todo = [_Window(np.pad(c[: t_spec.chunk_samples],
                           (0, max(0, t_spec.chunk_samples - len(c)))),
                    prompt) for c in clips]
    while todo or eng.busy:
        if todo and eng.free_slots:
            n = eng.admit_many(todo)
            del todo[:n]
        before = np.asarray(eng.pos).copy()
        active = np.asarray(eng.active).copy()
        eng.step()
        after = np.asarray(eng.pos)
        committed += int(np.sum((after - before)[active]))
        rounds += int(np.sum(active))
    m_bar = committed / max(1, rounds)
    alpha = (m_bar - 1) / gamma
    return m_bar, alpha


def drive(batcher, clips, stagger_s=0.05):
    lat = [None] * len(clips)

    def one(i):
        t0 = time.monotonic()
        batcher.submit(clips[i])
        lat[i] = time.monotonic() - t0

    threads = []
    for i, _ in enumerate(clips):
        th = threading.Thread(target=one, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(stagger_s)
    for th in threads:
        th.join(timeout=600)
    return np.asarray(lat, np.float64)


def main():
    gammas = [int(a) for a in sys.argv[1:]] or [2, 4]
    (bq, spec, table, target, t_vars, draft, d_vars, clips) = load_pair()

    from yoho_tpu.infer.continuous import ContinuousBatcher
    from yoho_tpu.infer.pipeline import Transcriber

    kw = dict(family="whisper", token_table=table, batch_size=4,
              timestamps=False)
    t_greedy = Transcriber(target, t_vars, **kw)

    # Token-exactness across the pair (the composition's correctness
    # claim, now on two DIFFERENT trained models).
    want = t_greedy.transcribe_many(clips[:8])

    greedy = ContinuousBatcher(t_greedy, max_batch=4, chunk_tokens=8)
    greedy.submit(clips[0])
    lat_g = drive(greedy, clips)
    greedy.close()

    out = {"gamma": {}, "draft_wer": spec.get("draft_wer"),
           "target_wer": spec["wer"]["bf16"]}
    for gamma in gammas:
        t_spec = Transcriber(target, t_vars, draft_model=draft,
                             draft_variables=d_vars,
                             speculative_gamma=gamma, **kw)
        got = None
        spec_b = ContinuousBatcher(t_spec, max_batch=4, chunk_tokens=8)
        spec_b.submit(clips[0])
        got = [spec_b.submit(c) for c in clips[:8]]
        lat_s = drive(spec_b, clips)
        spec_b.close()
        for w, g_res in zip(want, got):
            assert [s.tokens for s in w.segments] == \
                   [s.tokens for s in g_res.segments], (
                "spec slots diverged from greedy on the trained pair")

        m_bar, alpha = measure_alpha(t_spec, clips, gamma)
        # Chip projection (speculative_bench.py cost model): per-round
        # cost = gamma draft steps + 1 verify; committed m_bar tokens.
        # c = draft/target per-step cost; vs 1 token per target step.
        proj = {f"c={c}": round(m_bar / (gamma * c + 1), 2)
                for c in (0.15, 0.25, 0.5, 1.0)}
        out["gamma"][gamma] = {
            "m_bar": round(m_bar, 3), "alpha": round(alpha, 3),
            "wall_p50_s": round(float(np.percentile(lat_s, 50)), 3),
            "wall_p95_s": round(float(np.percentile(lat_s, 95)), 3),
            "projected_chip_speedup": proj,
        }
        print(f"gamma={gamma}: m_bar={m_bar:.3f} alpha={alpha:.3f} "
              f"proj={proj}", flush=True)

    out["greedy_wall_p50_s"] = round(float(np.percentile(lat_g, 50)), 3)
    out["greedy_wall_p95_s"] = round(float(np.percentile(lat_g, 95)), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
