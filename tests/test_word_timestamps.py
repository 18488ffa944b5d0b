"""Word-level timestamp machinery: DTW, alignment, word grouping."""

import numpy as np

from yoho_tpu.infer.word_timestamps import (
    WordTiming,
    dtw_path,
    split_words,
    token_frame_alignment,
    words_from_alignment,
)


def test_dtw_diagonal():
    # Perfect diagonal cost: path follows the diagonal.
    n = 6
    cost = np.ones((n, n)) - np.eye(n)
    ti, fi = dtw_path(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    # path is monotonic
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fi) >= 0)


def test_token_frame_alignment_block_diagonal():
    """Attention concentrated on distinct audio spans per token recovers
    those spans' start frames."""
    n_tok, n_frames = 4, 40
    attn = np.full((n_tok, n_frames), 1e-3)
    spans = [(0, 10), (10, 18), (18, 30), (30, 40)]
    for t, (a, b) in enumerate(spans):
        attn[t, a:b] = 1.0
    frames = token_frame_alignment(attn)
    for t, (a, b) in enumerate(spans):
        assert a <= frames[t] < b, (t, frames[t], spans[t])
    assert np.all(np.diff(frames) >= 0)


class _PieceDecoder:
    """Space-marker piece decoder (GPT-2/our-BPE style)."""

    PIECES = {1: " hello", 2: " wor", 3: "ld", 4: " there"}

    def __call__(self, ids):
        return "".join(self.PIECES[i] for i in ids)


def test_split_words():
    words = split_words([1, 2, 3, 4], _PieceDecoder())
    assert [w for w, _ in words] == ["hello", "world", "there"]
    assert [idx for _, idx in words] == [[0], [1, 2], [3]]


def test_words_from_alignment():
    ids = [1, 2, 3, 4]
    frames = np.asarray([0, 10, 14, 20])
    words = words_from_alignment(ids, frames, 0.02, _PieceDecoder(),
                                 max_duration=1.0)
    assert [w.word for w in words] == ["hello", "world", "there"]
    assert words[0].start == 0.0 and words[0].end == 0.2
    assert words[1].start == 0.2 and words[1].end == 0.4
    # monotonic, clamped
    assert all(w.end <= 1.0 for w in words)
    assert all(w.end > w.start for w in words)


def test_pipeline_word_timestamps_integration():
    """Transcriber(word_timestamps=True) attaches WordTiming lists via the
    cross-attention DTW path (fake text backend supplies word pieces)."""
    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    class FakeBackend:
        def convert_ids_to_tokens(self, ids):
            return [("Ġtok%d" % (i % 7)) for i in ids]

        def decode(self, ids):
            return " ".join("tok%d" % (i % 7) for i in ids)

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=2, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True, text_backend=FakeBackend())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, word_timestamps=True,
                    no_speech_threshold=1.1)  # never drop (random weights)
    g = np.random.default_rng(0)
    res = t.transcribe((0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32))
    # Words attach whenever text tokens were emitted into segments.
    for seg in res.segments:
        if seg.tokens and seg.words:
            for w in seg.words:
                assert w.end >= w.start >= 0
                assert isinstance(w.word, str) and w.word
                # Probabilities come from the same teacher-forced pass
                # (softmax values, never the 1.0 "absent" default for a
                # 51865-way random-weight softmax).
                assert 0.0 < w.probability < 1.0


def test_words_from_alignment_probabilities():
    """A word's probability is the mean of its tokens' probabilities
    (faster-whisper convention); omitted probs default to 1.0."""
    ids = [1, 2, 3, 4]
    frames = np.asarray([0, 10, 14, 20])
    probs = np.asarray([0.5, 0.7, 0.2, 0.9])
    words = words_from_alignment(ids, frames, 0.02, _PieceDecoder(),
                                 max_duration=1.0, probs=probs)
    # _PieceDecoder groups ids as [1]=hello [2,3]=world [4]=there
    assert [w.word for w in words] == ["hello", "world", "there"]
    assert words[0].probability == 0.5
    assert words[1].probability == round((0.7 + 0.2) / 2, 4)
    assert words[2].probability == 0.9
    plain = words_from_alignment(ids, frames, 0.02, _PieceDecoder(),
                                 max_duration=1.0)
    assert all(w.probability == 1.0 for w in plain)


def test_realized_token_probs_matches_manual_softmax():
    """layers.realized_token_probs == softmax(logits[:, i-1])[tok[:, i]]
    with probability 1 at the forced first position."""
    import jax.numpy as jnp

    from yoho_tpu.nn.layers import realized_token_probs

    g = np.random.default_rng(0)
    logits = g.standard_normal((2, 5, 11)).astype(np.float32)
    tokens = g.integers(0, 11, size=(2, 5))
    got = np.asarray(realized_token_probs(jnp.asarray(logits),
                                          jnp.asarray(tokens)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    sm = e / e.sum(-1, keepdims=True)
    want = np.ones((2, 5), np.float32)
    for b in range(2):
        for i in range(1, 5):
            want[b, i] = sm[b, i - 1, tokens[b, i]]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_realized_token_probs_streamed_matches_dense():
    """The S-chunk streamed variant (used by the alignment program so
    serving batches never materialize (B, S, V) f32 logits) equals the
    dense version, including at S not divisible by the chunk."""
    import jax.numpy as jnp

    from yoho_tpu.nn.layers import (
        realized_token_probs,
        realized_token_probs_streamed,
    )

    g = np.random.default_rng(1)
    for s in (5, 16, 19):
        h = jnp.asarray(g.standard_normal((3, s, 8)).astype(np.float32))
        w = jnp.asarray(g.standard_normal((8, 13)).astype(np.float32))
        tokens = jnp.asarray(g.integers(0, 13, size=(3, s)))
        dense = realized_token_probs(h @ w, tokens)
        streamed = realized_token_probs_streamed(
            h, lambda hc: hc @ w, tokens, chunk=4)
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense),
                                   rtol=1e-5, atol=1e-7)


def test_forced_alignment_api():
    """Transcriber.align: monotonic, in-range word timings for a given
    transcript (random weights — structural properties only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    class FakeBPE:
        def encode(self, text, add_special_tokens=False):
            return [ord(c) % 100 for c in text]

        def decode(self, ids):
            return "".join(" ab"[i % 3] for i in ids)

        def convert_ids_to_tokens(self, ids):
            return ["x"] * len(ids)

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=48, n_text_state=32, n_text_head=4,
                        n_text_layer=2, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True, text_backend=FakeBPE())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=False)

    audio = (0.1 * np.random.default_rng(0).standard_normal(cfg.n_samples)
             ).astype(np.float32)
    words = t.align(audio, "hello world again")
    assert words, "no word timings returned"
    dur = cfg.n_samples / cfg.sample_rate
    last_start = -1.0
    for w in words:
        assert 0.0 <= w.start <= w.end <= dur + 1e-6
        assert w.start >= last_start  # monotonic
        last_start = w.start

    import pytest

    with pytest.raises(ValueError):
        t.align(np.zeros(cfg.n_samples * 2, np.float32), "too long")


def test_align_many_matches_single():
    """Batched forced alignment equals per-pair align() word for word."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    class FakeBPE:
        def encode(self, text, add_special_tokens=False):
            return [ord(c) % 100 for c in text]

        def decode(self, ids):
            return "".join(" ab"[i % 3] for i in ids)

        def convert_ids_to_tokens(self, ids):
            return ["x"] * len(ids)

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=48, n_text_state=32, n_text_head=4,
                        n_text_layer=2, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True, text_backend=FakeBPE())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=2, timestamps=False)

    g = np.random.default_rng(1)
    pairs = [
        ((0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32),
         "hello world"),
        ((0.1 * g.standard_normal(cfg.n_samples // 2)).astype(np.float32),
         "short clip here"),
        ((0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32),
         "a third utterance"),  # spills into a second padded batch
    ]
    batched = t.align_many(pairs)
    assert len(batched) == 3
    for (audio, text), words in zip(pairs, batched):
        single = t.align(audio, text)
        assert [w.word for w in words] == [w.word for w in single]
        for wb, ws in zip(words, single):
            assert abs(wb.start - ws.start) < 1e-4
            assert abs(wb.end - ws.end) < 1e-4


def test_native_dtw_matches_python():
    """C++ DTW (native/dtw.cpp) is bit-identical to the Python DP."""
    import numpy as np

    from yoho_tpu.infer import word_timestamps as wt
    from yoho_tpu.native import dtw_path_native

    if dtw_path_native(np.zeros((2, 2), np.float32)) is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    g = np.random.default_rng(0)
    for n, m in ((5, 9), (30, 80), (1, 7), (7, 1)):
        cost = g.standard_normal((n, m)).astype(np.float32)
        nat = dtw_path_native(cost)
        # Force the pure-Python path for the reference.
        import unittest.mock as mock
        with mock.patch("yoho_tpu.native.dtw_path_native",
                        return_value=None):
            ref = wt.dtw_path(cost)
        np.testing.assert_array_equal(nat[0], ref[0])
        np.testing.assert_array_equal(nat[1], ref[1])


def test_word_timing_clamped_both_ends():
    """max_duration clamps start too — DTW drift into the padded tail
    must not produce WordTiming(start > end)."""
    import numpy as np

    from yoho_tpu.infer.word_timestamps import words_from_alignment

    frames = np.asarray([50, 60])  # both tokens deep in the padded tail
    words = words_from_alignment(
        [10, 11], frames, seconds_per_frame=0.5,
        decode_pieces=lambda ii: " w" if ii == [10] else "x",
        max_duration=10.0)
    for w in words:
        assert w.start <= w.end <= 10.0
