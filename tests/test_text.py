import datetime as dt

import numpy as np
import pytest

from yoho_tpu.text.bpe import ByteBPE, train_bpe
from yoho_tpu.text.langdetect import detect_language
from yoho_tpu.text.srt import Subtitle, compose_srt, parse_srt, sort_and_reindex
from yoho_tpu.text.standardize import number_to_words, standardize_text
from yoho_tpu.text.tokenizer import (
    EOT,
    SOT,
    VOICEPRINT,
    YOHOTokenizer,
    train_tokenizer,
    yoho_special_tokens,
)
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks at the quick fox",
    "a lazy afternoon with the brown dog",
    "quick quick quick the fox runs",
] * 10


# ---------------------------------------------------------------- SRT
def test_srt_roundtrip():
    src = (
        "1\n00:00:01,000 --> 00:00:02,500\nHello there\n\n"
        "2\n00:00:03,000 --> 00:00:04,000\nSecond line\nwith wrap\n"
    )
    subs = list(parse_srt(src))
    assert len(subs) == 2
    assert subs[0].start == dt.timedelta(seconds=1)
    assert subs[0].end == dt.timedelta(seconds=2.5)
    assert subs[1].content == "Second line\nwith wrap"
    out = compose_srt(subs)
    again = list(parse_srt(out))
    assert [s.content for s in again] == [s.content for s in subs]
    assert [s.start for s in again] == [s.start for s in subs]


def test_srt_sort_and_reindex():
    subs = [
        Subtitle(5, dt.timedelta(seconds=10), dt.timedelta(seconds=11), "b"),
        Subtitle(1, dt.timedelta(seconds=1), dt.timedelta(seconds=2), "a"),
    ]
    out = sort_and_reindex(subs)
    assert [s.content for s in out] == ["a", "b"]
    assert [s.index for s in out] == [1, 2]


# ---------------------------------------------------------------- standardize
def test_number_to_words_en():
    assert number_to_words("0") == "zero"
    assert number_to_words("17") == "seventeen"
    assert number_to_words("42") == "forty-two"
    assert number_to_words("100") == "one hundred"
    assert number_to_words("124") == "one hundred twenty-four"
    assert number_to_words("1001") == "one thousand one"
    assert number_to_words("2500000") == "two million five hundred thousand"
    assert number_to_words("3.3") == "three point three"
    assert number_to_words("124,512") == "one hundred twenty-four point five one two"


def test_standardize_text():
    out = standardize_text("Some 3.3  wild (remove this) [and this] 2 text .", "en")
    assert "(" not in out and "[" not in out
    assert "three point three" in out
    assert "two" in out
    assert "  " not in out
    # punctuation spacing fixed
    assert out.endswith("text.")


# ---------------------------------------------------------------- langdetect
def test_langdetect():
    assert detect_language("the cat and the dog are in the house").language == "en"
    assert detect_language("to je ale pěkný den, že se na to musíme podívat").language == "cs"
    assert detect_language("der Hund und die Katze sind nicht zu Hause").language == "de"
    assert detect_language("").language == "und"


# ---------------------------------------------------------------- BPE
def test_bpe_roundtrip_and_compression():
    bpe = train_bpe(CORPUS, vocab_size=300 + 256, specials=["<|x|>"])
    tok = YOHOTokenizer(bpe, use_native=False)
    text = "the quick brown fox"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # merges learned: far fewer tokens than bytes
    assert len(ids) < len(text.encode())
    # unseen text still encodes (byte fallback) and roundtrips
    weird = "zebra-ish ünïcode ☂ text"
    assert tok.decode(tok.encode(weird)) == weird


def test_bpe_model_save_load(tmp_path):
    bpe = train_bpe(CORPUS, vocab_size=280 + 256, specials=["<|a|>", "<|b|>"])
    path = tmp_path / "tok.model"
    bpe.save(path)
    again = ByteBPE.load(path)
    assert again.merges == bpe.merges
    assert again.specials == bpe.specials
    text = "the lazy dog jumps"
    assert again.encode_text(text) == bpe.encode_text(text)


def test_bpe_max_token_length():
    bpe = train_bpe(CORPUS, vocab_size=4000, max_token_length=4)
    for i in range(bpe.merge_base, bpe.vocab_size):
        assert len(bpe.id_to_bytes(i)) <= 4


def test_special_tokens_scheme():
    specials = yoho_special_tokens(max_audio_len=8)
    assert specials[:3] == [SOT, EOT, VOICEPRINT]
    assert specials[3] == "<|t-0|>" and specials[-1] == "<|t-7|>"

    tok = train_tokenizer(CORPUS, vocab_size=600 + 256, max_audio_len=8,
                          backend="python")
    s = f"{SOT}<|t-0|>the quick fox<|t-5|>{VOICEPRINT}{EOT}"
    ids = tok.encode(s)
    assert ids[0] == tok.sot_id == 0
    assert ids[1] == tok.timestamp_id(0)
    assert ids[-1] == tok.eot_id == 1
    assert ids[-2] == tok.voiceprint_id == 2
    assert tok.decode(ids) == s
    assert tok.is_timestamp(ids[1])
    assert not tok.is_timestamp(tok.sot_id)


def test_native_bpe_matches_python():
    from yoho_tpu.native import NativeBPEEncoder, bpe_train_native, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")

    specials = yoho_special_tokens(max_audio_len=8)
    vocab = 700 + 256
    py_bpe = train_bpe(CORPUS, vocab, 32, specials)
    native_model = bpe_train_native(CORPUS, vocab, 32, specials)
    assert native_model is not None
    # identical training result (same merges, byte for byte)
    assert native_model == py_bpe.dump()

    # identical encoding on held-out text
    enc = NativeBPEEncoder(py_bpe.dump())
    for text in ["the quick brown fox", "unseen words zap!", "a", ""]:
        np.testing.assert_array_equal(enc.encode(text),
                                      np.asarray(py_bpe.encode_text(text), np.int32))


# ---------------------------------------------------------------- whisper ids
def test_whisper_token_table_multilingual():
    t = WhisperTokenTable(multilingual=True)
    assert t.eot == 50257
    assert t.sot == 50258
    assert t.language_token("en") == 50259
    assert t.transcribe == 50359
    assert t.no_timestamps == 50363
    assert t.timestamp_begin == 50364
    assert t.n_vocab == 51865
    assert t.sot_sequence("en", "transcribe", timestamps=False) == [
        50258, 50259, 50359, 50363,
    ]
    assert t.timestamp_token(1.0) == t.timestamp_begin + 50
    assert abs(t.timestamp_seconds(t.timestamp_begin + 50) - 1.0) < 1e-9


def test_whisper_token_table_v3_and_en():
    v3 = WhisperTokenTable(multilingual=True, v3=True)
    assert v3.n_vocab == 51866
    assert v3.language_token("yue") == v3.language_base + 99

    en = WhisperTokenTable(multilingual=False)
    assert en.eot == 50256
    assert en.n_vocab == 51864
    assert en.sot_sequence(timestamps=False) == [50257, en.no_timestamps]


def test_compose_vtt_and_segment_conversion():
    from yoho_tpu.infer.longform import Segment
    from yoho_tpu.text.srt import (
        compose_srt,
        compose_vtt,
        parse_srt,
        segments_to_subtitles,
    )

    segs = [Segment(0.5, 2.25, "hello world"), Segment(3.0, 4.5, "again"),
            Segment(5.0, 6.0, "named line")]
    segs[1].speaker = 2
    segs[2].speaker = 0
    segs[2].speaker_name = "alice"  # enrolled name beats the cluster id
    subs = segments_to_subtitles(segs)
    assert subs[0].index == 1 and subs[1].content.startswith("[speaker 2]")
    assert subs[2].content == "[alice] named line"

    vtt = compose_vtt(subs)
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.500 --> 00:00:02.250" in vtt

    srt_text = compose_srt(subs)
    rt = list(parse_srt(srt_text))
    assert [s.content for s in rt] == [s.content for s in subs]
    assert abs(rt[0].start.total_seconds() - 0.5) < 1e-3


def test_parse_srt_positional_attributes():
    """Real-world SRT cue-position attributes after the end stamp parse
    (the srt package this module replaces tolerates them)."""
    from yoho_tpu.text.srt import parse_srt

    block = ("1\n00:00:01,000 --> 00:00:04,000 X1:100 X2:600\nHello\n\n"
             "2\n00:00:05,000 --> 00:00:06,000\nWorld\n")
    subs = list(parse_srt(block))
    assert len(subs) == 2
    assert subs[0].content == "Hello"
    assert subs[0].end.total_seconds() == 4.0


def test_parse_srt_internal_blank_line_keeps_content():
    """A cue whose content contains an internal blank line must keep the
    trailing lines (a blank-line splitter silently truncates them — the
    srt package keeps content until the next cue header)."""
    block = ("12\n00:01:00,000 --> 00:01:04,000\nline one\n\nline two\n\n"
             "13\n00:01:05,000 --> 00:01:06,000\nnext cue\n")
    subs = list(parse_srt(block))
    assert len(subs) == 2
    assert subs[0].content == "line one\n\nline two"
    assert subs[1].content == "next cue"


def test_parse_srt_arrow_in_content_is_not_a_cue_boundary():
    """Content lines containing '-->' (dialogue arrows) must not be
    mistaken for timestamp headers."""
    block = ("1\n00:00:01,000 --> 00:00:02,000\ngo --> left\n\n"
             "2\n00:00:03,000 --> 00:00:04,000\nok\n")
    subs = list(parse_srt(block))
    assert [s.content for s in subs] == ["go --> left", "ok"]


def test_train_tokenizer_generator_survives_native_fallback(monkeypatch):
    """backend='auto' with an unavailable native trainer must NOT train the
    Python fallback on the generator the native attempt already exhausted
    (that silently produced a merge-less, bytes-only tokenizer)."""
    import yoho_tpu.native as native

    def fake_native(corpus, *a, **k):
        "\n".join(corpus)  # consume, like the real join-then-fail path
        return None

    monkeypatch.setattr(native, "bpe_train_native", fake_native)
    tok = train_tokenizer((s for s in CORPUS), vocab_size=600,
                          max_audio_len=16, backend="auto")
    assert len(tok.bpe.merges) > 0
    ids = tok.encode("the quick brown fox")
    assert tok.decode(ids) == "the quick brown fox"
