"""Speculative decoding invariants: for ANY weights, speculative greedy
decode must produce exactly the target model's greedy output (the draft can
only change speed, never content). Exercises partial acceptance (independent
random draft), full acceptance (draft == target, which stresses the
draft-cache gap refill), and suppression."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn
from yoho_tpu.infer.speculative import (
    make_verify_step_fn,
    speculative_greedy_decode,
)
from yoho_tpu.nn.whisper import Whisper

EOT = 7
MAX_LEN = 20
GAMMA = 3


def _make(cfg, seed, mel):
    model = Whisper(cfg)
    g = np.random.default_rng(seed)
    tokens = jnp.asarray(g.integers(0, cfg.n_vocab, size=(mel.shape[0], 4)))
    variables = model.init(jax.random.PRNGKey(seed), mel, tokens)
    xa = model.apply(variables, mel, method=Whisper.encode_audio)
    return model, variables, xa


@pytest.fixture(scope="module")
def setup():
    cfg_t = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=4,
        n_audio_layer=2, n_vocab=50, n_text_ctx=32, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    cfg_d = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
        n_audio_layer=1, n_vocab=50, n_text_ctx=32, n_text_state=16,
        n_text_head=2, n_text_layer=1,
    )
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((3, cfg_t.n_audio_ctx * 2, 8))
                      .astype(np.float32))
    target = _make(cfg_t, 0, mel)
    draft = _make(cfg_d, 1, mel)
    return cfg_t, cfg_d, target, draft


def _target_greedy(target, prompt, suppress=()):
    model, variables, xa = target
    ckv = model.apply(variables, xa, method=Whisper.cross_kvs)
    caches = model.apply(variables, prompt.shape[0], jnp.float32,
                         method=Whisper.init_caches)
    step = make_whisper_step_fn(model, variables, ckv)
    return jax.jit(lambda c, p: greedy_decode(
        step, c, p, MAX_LEN, EOT, suppress_ids=suppress))(caches, prompt)


def _speculative(target, draft, prompt, suppress=()):
    t_model, t_vars, t_xa = target
    d_model, d_vars, d_xa = draft
    b = prompt.shape[0]
    t_ckv = t_model.apply(t_vars, t_xa, method=Whisper.cross_kvs)
    d_ckv = d_model.apply(d_vars, d_xa, method=Whisper.cross_kvs)
    # Caches need max_len + gamma workspace (module docstring).
    t_caches = t_model.apply(t_vars, b, jnp.float32, MAX_LEN + GAMMA + 2,
                             method=Whisper.init_caches)
    d_caches = d_model.apply(d_vars, b, jnp.float32, MAX_LEN + GAMMA + 2,
                             method=Whisper.init_caches)
    t_step = make_verify_step_fn(t_model, t_vars, t_ckv)
    d_step = make_verify_step_fn(d_model, d_vars, d_ckv)
    return jax.jit(lambda tc, dc, p: speculative_greedy_decode(
        t_step, d_step, tc, dc, p, MAX_LEN, EOT, gamma=GAMMA,
        suppress_ids=suppress))(t_caches, d_caches, prompt)


def test_speculative_equals_greedy_independent_draft(setup):
    _cfg_t, _cfg_d, target, draft = setup
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 3]], jnp.int32)

    tokens_g, lengths_g = _target_greedy(target, prompt)
    tokens_s, lengths_s = _speculative(target, draft, prompt)

    np.testing.assert_array_equal(np.asarray(tokens_g), np.asarray(tokens_s))
    np.testing.assert_array_equal(np.asarray(lengths_g), np.asarray(lengths_s))


def test_speculative_equals_greedy_perfect_draft(setup):
    """Draft == target: every proposal accepted; stresses the full-accept
    path (bonus token + draft-cache gap refill via the S=2 first step)."""
    _cfg_t, _cfg_d, target, _draft = setup
    prompt = jnp.asarray([[1, 2], [4, 5], [1, 3]], jnp.int32)

    tokens_g, lengths_g = _target_greedy(target, prompt)
    tokens_s, lengths_s = _speculative(target, target, prompt)

    np.testing.assert_array_equal(np.asarray(tokens_g), np.asarray(tokens_s))
    np.testing.assert_array_equal(np.asarray(lengths_g), np.asarray(lengths_s))


def test_speculative_respects_suppression(setup):
    _cfg_t, _cfg_d, target, draft = setup
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 3]], jnp.int32)
    suppress = (3, 9, 11)

    tokens_g, _ = _target_greedy(target, prompt, suppress)
    tokens_s, _ = _speculative(target, draft, prompt, suppress)

    np.testing.assert_array_equal(np.asarray(tokens_g), np.asarray(tokens_s))
    gen = np.asarray(tokens_s)[:, 2:]
    for t in suppress:
        assert not np.any(gen == t)


def test_speculative_single_stream(setup):
    """B=1 — the latency-serving configuration."""
    _cfg_t, _cfg_d, target, draft = setup
    t_model, t_vars, t_xa = target
    d_model, d_vars, d_xa = draft
    target1 = (t_model, t_vars, t_xa[:1])
    draft1 = (d_model, d_vars, d_xa[:1])
    prompt = jnp.asarray([[1, 2]], jnp.int32)

    tokens_g, lengths_g = _target_greedy(target1, prompt)
    tokens_s, lengths_s = _speculative(target1, draft1, prompt)

    np.testing.assert_array_equal(np.asarray(tokens_g), np.asarray(tokens_s))
    np.testing.assert_array_equal(np.asarray(lengths_g), np.asarray(lengths_s))


def test_streaming_with_draft_matches_plain(setup):
    """A draft-equipped Transcriber streams speculatively (same compiled
    path) and yields exactly the plain transcriber's segments."""
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.infer.streaming import StreamingTranscriber
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable
    import numpy as np

    del setup  # pipeline needs real-vocab, chunk-consistent configs
    kw = dict(n_mels=8, n_audio_ctx=16, n_vocab=51865, n_text_ctx=16,
              chunk_seconds=0.32)
    cfg_t = WhisperConfig(n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                          n_text_state=32, n_text_head=4, n_text_layer=1, **kw)
    cfg_d = WhisperConfig(n_audio_state=16, n_audio_head=2, n_audio_layer=1,
                          n_text_state=16, n_text_head=2, n_text_layer=1, **kw)

    def init(cfg, seed):
        m = Whisper(cfg)
        v = m.init(jax.random.PRNGKey(seed),
                   jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
                   jnp.zeros((1, 4), jnp.int32))
        return m, v

    t_model, t_vars = init(cfg_t, 0)
    d_model, d_vars = init(cfg_d, 1)
    table = WhisperTokenTable(multilingual=True)
    g = np.random.default_rng(3)
    audio = (0.1 * g.standard_normal(int(cfg_t.n_samples * 2.5))).astype(np.float32)

    def run(**kw):
        tr = Transcriber(t_model, t_vars, family="whisper", token_table=table,
                         batch_size=1, timestamps=False, **kw)
        st = StreamingTranscriber(tr)
        segs = []
        for i in range(0, len(audio), 4000):
            segs += st.push(audio[i : i + 4000])
        segs += st.flush()
        # Compare token ids, not rendered text — with no BPE backend every
        # text renders "", which would hide real divergence.
        return [(round(s.start, 3), tuple(s.tokens or ())) for s in segs]

    plain = run()
    spec = run(draft_model=d_model, draft_variables=d_vars,
               speculative_gamma=3)
    assert plain == spec
    assert any(toks for _s, toks in plain), "no tokens decoded at all"


def test_speculative_with_logits_fn_equals_greedy(setup):
    """A stateful logits post-processor (here: a parity rule reading the
    token buffer, like the timestamp rules do) must keep speculative ==
    greedy — the work buffer feeds it the same context."""
    _cfg_t, _cfg_d, target, draft = setup
    prompt = jnp.asarray([[1, 2], [1, 2], [1, 3]], jnp.int32)

    def rules(logits, tokens, pos):
        # After an even token, suppress all odd tokens (buffer-dependent).
        last = jnp.take_along_axis(
            tokens, jnp.full((tokens.shape[0], 1), pos - 1), axis=1)[:, 0]
        odd_vocab = (jnp.arange(logits.shape[1]) % 2 == 1)[None, :]
        mask = (last % 2 == 0)[:, None] & odd_vocab
        return jnp.where(mask, jnp.finfo(jnp.float32).min, logits)

    model, variables, xa = target
    ckv = model.apply(variables, xa, method=Whisper.cross_kvs)
    caches = model.apply(variables, 3, jnp.float32, method=Whisper.init_caches)
    step = make_whisper_step_fn(model, variables, ckv)
    tokens_g, lengths_g = jax.jit(lambda c, p: greedy_decode(
        step, c, p, MAX_LEN, EOT, logits_fn=rules))(caches, prompt)

    t_model, t_vars, t_xa = target
    d_model, d_vars, d_xa = draft
    t_ckv = t_model.apply(t_vars, t_xa, method=Whisper.cross_kvs)
    d_ckv = d_model.apply(d_vars, d_xa, method=Whisper.cross_kvs)
    t_caches = t_model.apply(t_vars, 3, jnp.float32, MAX_LEN + GAMMA + 2,
                             method=Whisper.init_caches)
    d_caches = d_model.apply(d_vars, 3, jnp.float32, MAX_LEN + GAMMA + 2,
                             method=Whisper.init_caches)
    tokens_s, lengths_s = jax.jit(lambda tc, dc, p: speculative_greedy_decode(
        make_verify_step_fn(t_model, t_vars, t_ckv),
        make_verify_step_fn(d_model, d_vars, d_ckv),
        tc, dc, p, MAX_LEN, EOT, gamma=GAMMA, logits_fn=rules,
    ))(t_caches, d_caches, prompt)

    np.testing.assert_array_equal(np.asarray(tokens_g), np.asarray(tokens_s))
    np.testing.assert_array_equal(np.asarray(lengths_g), np.asarray(lengths_s))


def test_speculative_aux_sum_logprob_matches_greedy(setup):
    """return_aux sum_logprob is the REAL cumulative logprob of the
    committed tokens — identical (f32 tolerance) to greedy's, so the
    no-speech rule and quality fallback work with a draft attached."""
    _cfg_t, _cfg_d, target, draft = setup
    prompt = jnp.asarray([[1, 2], [4, 5], [1, 3]], jnp.int32)

    t_model, t_vars, t_xa = target
    b = prompt.shape[0]
    ckv = t_model.apply(t_vars, t_xa, method=Whisper.cross_kvs)
    caches = t_model.apply(t_vars, b, jnp.float32, method=Whisper.init_caches)
    step = make_whisper_step_fn(t_model, t_vars, ckv)
    tok_g, len_g, aux_g = greedy_decode(step, caches, prompt, MAX_LEN, EOT,
                                        return_aux=True, no_speech_id=5)

    d_model, d_vars, d_xa = draft
    t_ckv = t_model.apply(t_vars, t_xa, method=Whisper.cross_kvs)
    d_ckv = d_model.apply(d_vars, d_xa, method=Whisper.cross_kvs)
    t_caches = t_model.apply(t_vars, b, jnp.float32, MAX_LEN + GAMMA + 2,
                             method=Whisper.init_caches)
    d_caches = d_model.apply(d_vars, b, jnp.float32, MAX_LEN + GAMMA + 2,
                             method=Whisper.init_caches)
    tok_s, len_s, aux_s = speculative_greedy_decode(
        make_verify_step_fn(t_model, t_vars, t_ckv),
        make_verify_step_fn(d_model, d_vars, d_ckv),
        t_caches, d_caches, prompt, MAX_LEN, EOT, gamma=GAMMA,
        return_aux=True, no_speech_id=5)

    np.testing.assert_array_equal(np.asarray(tok_g), np.asarray(tok_s))
    np.testing.assert_allclose(np.asarray(aux_s["sum_logprob"]),
                               np.asarray(aux_g["sum_logprob"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux_s["no_speech_prob"]),
                               np.asarray(aux_g["no_speech_prob"]), atol=1e-5)


def test_cli_draft_wiring(monkeypatch):
    """--draft-hf plumbs a draft model into the Transcriber (CLI surface):
    the built transcriber decodes greedy-identically to a draft-free one,
    and a vocab-mismatched draft is rejected loudly."""
    import jax
    import jax.numpy as jnp

    from yoho_tpu.cli import transcribe as cli
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.nn.whisper import Whisper

    def fake_ckpt(vocab, seed):
        cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                            n_audio_head=4, n_audio_layer=1, n_vocab=vocab,
                            n_text_ctx=16, n_text_state=32, n_text_head=4,
                            n_text_layer=1, chunk_seconds=0.32)
        params = Whisper(cfg).init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 32, 8), jnp.float32),
            jnp.zeros((1, 4), jnp.int32))["params"]
        return cfg, params

    ckpts = {"main": fake_ckpt(51865, 0), "draft": fake_ckpt(51865, 1),
             "badvocab": fake_ckpt(51866, 2)}
    monkeypatch.setattr("yoho_tpu.nn.convert.load_hf_whisper",
                        lambda path, dtype=None: ckpts[path])
    # No tokenizer files at the fake paths; the hub fallback would hang
    # without network access.
    monkeypatch.setattr("yoho_tpu.text.gpt2_bpe.load_text_backend",
                        lambda path: None)

    t = cli.build_whisper_transcriber("main", beams=0, batch=1,
                                      language="en", timestamps=False,
                                      draft_hf="draft", speculative_gamma=3)
    assert t.draft_model is not None and t.speculative_gamma == 3

    plain = cli.build_whisper_transcriber("main", beams=0, batch=1,
                                          language="en", timestamps=False)
    g = np.random.default_rng(0)
    audio = (0.1 * g.standard_normal(5120)).astype(np.float32)
    want = plain.transcribe(audio)
    got = t.transcribe(audio)
    assert [s.tokens for s in want.segments] == \
           [s.tokens for s in got.segments]

    with pytest.raises(ValueError, match="draft vocab"):
        cli.build_whisper_transcriber("main", beams=0, batch=1,
                                      language="en", timestamps=False,
                                      draft_hf="badvocab")
