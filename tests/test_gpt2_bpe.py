"""Golden tests for the self-owned GPT-2 byte-level BPE codec.

Strategy (CLAUDE.md: golden values come from transformers/torch, not our
own code): train a small byte-level BPE with HF ``tokenizers``, save it in
the GPT-2 serialization formats, then assert our codec and
``transformers.GPT2Tokenizer`` produce IDENTICAL ids and text for a
battery of adversarial strings. The hand-rolled pre-tokenizer is fuzzed
against the true GPT-2 regex (``regex`` module) separately.

Reference for why this exists: the reference renders Whisper transcripts
through tiktoken's GPT-2 vocab (``yoho/src/nn/whisper.py:268-284``);
VERDICT r1 required text rendering to work without transformers.
"""

import json

import pytest

from yoho_tpu.text.gpt2_bpe import (
    GPT2BPE,
    bytes_to_unicode,
    load_text_backend,
    pretokenize,
)

SAMPLES = [
    "Hello world",
    "Hello, world! It's a test.",
    "  leading and   internal   spaces  ",
    "tabs\tand\nnewlines\r\n mixed \n\n ok",
    "numbers 123 and 3.14 and 2026-08-17",
    "don't can't we'll I'm you're they've he'd it's",
    "UPPER lower MiXeD",
    "unicode: café naïve über straße",
    "emoji \U0001f680 rocket and \U0001f1e8\U0001f1ff flags",
    "CJK 你好世界 and 日本語",
    "mixed 一二三 numerals Ⅲ ½ ²",
    "punct !!! ??? ... --- ***(nested [brackets] {braces})",
    "quotes \"double\" 'single' “curly”",
    "a", " ", "", "\n", "   ", "'s", " 's", "x's",
    "url https://example.com/path?q=1&r=2#frag",
    "snake_case camelCase kebab-case dot.case",
    "русский текст greek αβγ",
    "arabic مرحبا hebrew שלום",
    "zero​width and combining é",
]

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world, it's a beautiful day in the neighborhood",
    "numbers like 123 and 456 are common in text corpora",
    "don't stop believing, hold on to that feeling",
    "café culture and über drivers in the city",
    "speech recognition systems transcribe audio to text",
    "the rain in spain falls mainly on the plain",
] * 4


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    d = tmp_path_factory.mktemp("gpt2bpe")
    tok = tokenizers.Tokenizer(tokenizers.models.BPE())
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(
        add_prefix_space=False)
    tok.decoder = tokenizers.decoders.ByteLevel()
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=500, show_progress=False,
        initial_alphabet=tokenizers.pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    tok.model.save(str(d))  # vocab.json + merges.txt
    tok.save(str(d / "tokenizer.json"))
    return d


@pytest.fixture(scope="module")
def hf_tok(trained_dir):
    transformers = pytest.importorskip("transformers")
    return transformers.GPT2Tokenizer(
        vocab_file=str(trained_dir / "vocab.json"),
        merges_file=str(trained_dir / "merges.txt"),
    )


def test_byte_unicode_table_is_gpt2s():
    table = bytes_to_unicode()
    assert len(table) == 256 and len(set(table.values())) == 256
    assert table[ord("A")] == "A" and table[ord("~")] == "~"
    assert table[32] == "Ġ"  # space -> Ġ, the hallmark mapping
    assert table[10] == "Ċ"  # newline -> Ċ


def test_encode_matches_transformers(trained_dir, hf_tok):
    ours = GPT2BPE.from_dir(trained_dir)
    for s in SAMPLES + CORPUS:
        assert ours.encode(s) == hf_tok.encode(s), repr(s)


def test_decode_matches_transformers(trained_dir, hf_tok):
    ours = GPT2BPE.from_dir(trained_dir)
    for s in SAMPLES + CORPUS:
        ids = hf_tok.encode(s)
        assert ours.decode(ids) == hf_tok.decode(ids), repr(s)


def test_roundtrip(trained_dir):
    ours = GPT2BPE.from_dir(trained_dir)
    for s in SAMPLES:
        assert ours.decode(ours.encode(s)) == s, repr(s)


def test_tokenizer_json_loader(trained_dir):
    a = GPT2BPE.from_dir(trained_dir)
    b = GPT2BPE.from_tokenizer_json(trained_dir / "tokenizer.json")
    assert a.vocab == b.vocab and a.ranks == b.ranks
    for s in SAMPLES:
        assert a.encode(s) == b.encode(s)


def test_pretokenize_matches_gpt2_regex():
    regex = pytest.importorskip("regex")
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
        r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    import random

    rnd = random.Random(0)
    # \x1c-\x1f: str.isspace() counts these, regex \s does not — the
    # alphabet includes them so the fuzz pins the divergence fix.
    alphabet = (
        "ab c.é你 12Ⅲ'\n\t!½ \U0001f680_-\"Z9\x1c\x1d"
    )
    fuzz = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 40)))
            for _ in range(500)]
    for s in SAMPLES + fuzz + ["a \x1cb", "x\x1c\x1c ", "\x1d", " \x1c"]:
        assert pretokenize(s) == pat.findall(s), repr(s)


def test_pretokenize_reconstructs_input():
    for s in SAMPLES:
        assert "".join(pretokenize(s)) == s, repr(s)


def test_whisper_table_renders_text(trained_dir):
    """End-to-end: WhisperTokenTable + our codec render ids as text with
    timestamps, no transformers involved."""
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    backend = GPT2BPE.from_dir(trained_dir)
    table = WhisperTokenTable(multilingual=True, text_backend=backend)
    ids = backend.encode("hello world")
    rendered = table.decode_text(
        [table.timestamp_begin] + ids + [table.timestamp_begin + 50, table.eot])
    assert rendered == "<|0.00|>hello world<|1.00|>"
    assert table.encode_text("hello world") == ids


def test_load_text_backend_prefers_local_files(trained_dir):
    backend = load_text_backend(str(trained_dir))
    assert isinstance(backend, GPT2BPE)
    assert load_text_backend(str(trained_dir / "nope")) is None


def test_text_backend_without_transformers(trained_dir, monkeypatch):
    """VERDICT r1 item 2 'done' criterion: text renders from checkpoint-dir
    files alone with transformers unimportable."""
    import sys

    monkeypatch.setitem(sys.modules, "transformers", None)  # ImportError
    backend = load_text_backend(str(trained_dir))
    assert isinstance(backend, GPT2BPE)
    ids = backend.encode("hello world")
    assert backend.decode(ids) == "hello world"


def test_convert_ids_to_tokens(trained_dir):
    """Word-timestamp grouping uses the HF convert_ids_to_tokens surface."""
    backend = GPT2BPE.from_dir(trained_dir)
    ids = backend.encode("hello world")
    toks = backend.convert_ids_to_tokens(ids)
    assert "".join(toks).replace("Ġ", " ") == "hello world"


def test_transcriber_warns_loudly_without_backend():
    """A Transcriber with no text backend must warn (once) instead of
    silently returning '' (VERDICT r1 weak #2)."""
    import warnings as warnings_mod

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=32, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    table = WhisperTokenTable(multilingual=True)  # no text backend
    t = Transcriber(model, variables, family="whisper", token_table=table,
                    batch_size=1, timestamps=False)
    with pytest.warns(UserWarning, match="no text backend"):
        res = t.transcribe(np.zeros(cfg.n_samples, np.float32))
    assert res.text == ""
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")  # second call: no new warning
        t.transcribe(np.zeros(cfg.n_samples, np.float32))


# ---------------------------------------------------- tiktoken format
@pytest.fixture(scope="module")
def tiktoken_file(trained_dir, tmp_path_factory):
    """Derive a .tiktoken serialization (base64(bytes) rank) from the
    HF-trained vocab: token bytes via the inverse byte-unicode table,
    rank = vocab id (BPE ids are assigned in merge-creation order)."""
    import base64

    from yoho_tpu.text.gpt2_bpe import unicode_to_bytes

    vocab = json.loads((trained_dir / "vocab.json").read_text())
    inv = unicode_to_bytes()
    lines = []
    for tok, rank in sorted(vocab.items(), key=lambda kv: kv[1]):
        data = bytes(inv[c] for c in tok)
        lines.append(base64.b64encode(data) + b" " + str(rank).encode())
    d = tmp_path_factory.mktemp("tiktoken")
    path = d / "multilingual.tiktoken"
    path.write_bytes(b"\n".join(lines) + b"\n")
    return path


def test_tiktoken_matches_transformers(tiktoken_file, hf_tok):
    """tiktoken-format loading + rank-merge encoding produce the SAME ids
    and text as transformers' GPT2Tokenizer on every sample."""
    from yoho_tpu.text.gpt2_bpe import TiktokenBPE

    bpe = TiktokenBPE.from_file(tiktoken_file)
    for s in SAMPLES:
        ours = bpe.encode(s)
        theirs = hf_tok.encode(s)
        assert ours == theirs, f"ids diverge on {s!r}"
        assert bpe.decode(ours) == hf_tok.decode(theirs)


def test_tiktoken_convert_ids_to_tokens(tiktoken_file, hf_tok):
    from yoho_tpu.text.gpt2_bpe import TiktokenBPE

    bpe = TiktokenBPE.from_file(tiktoken_file)
    ids = bpe.encode("hello world")
    assert bpe.convert_ids_to_tokens(ids) == hf_tok.convert_ids_to_tokens(ids)


def test_load_text_backend_finds_tiktoken(tiktoken_file):
    from yoho_tpu.text.gpt2_bpe import TiktokenBPE, load_text_backend

    # Directory containing only a .tiktoken file, and the file directly.
    for target in (tiktoken_file.parent, tiktoken_file):
        backend = load_text_backend(str(target))
        assert isinstance(backend, TiktokenBPE)
        assert backend.decode(backend.encode("hello")) == "hello"
