"""DER / EER metrics (yoho_tpu.eval.diarization).

Golden values are hand-computed from the NIST DER definition on small
segment lists (each case's arithmetic is spelled out in the comments) —
the reference ships no diarization evaluation at all.
"""

import numpy as np
import pytest

from yoho_tpu.eval.diarization import (
    DERBreakdown,
    SpeakerTurn,
    cosine_scores,
    diarization_error_rate,
    equal_error_rate,
    verification_pairs,
)

T = SpeakerTurn


def test_perfect_diarization():
    ref = [T(0, 5, "A"), T(5, 10, "B")]
    hyp = [T(0, 5, 1), T(5, 10, 2)]  # different label alphabets are fine
    out = diarization_error_rate(ref, hyp)
    assert out.der == 0.0
    assert out.missed == out.false_alarm == out.confusion == 0.0
    assert out.total_reference == 10.0


def test_label_permutation_is_free():
    ref = [T(0, 5, "A"), T(5, 10, "B")]
    hyp = [T(0, 5, "B"), T(5, 10, "A")]  # swapped names, same partition
    assert diarization_error_rate(ref, hyp).der == 0.0


def test_missed_speech():
    # ref: A speaks 0-10. hyp: silence 0-4, A 4-10. Missed = 4 of 10.
    ref = [T(0, 10, "A")]
    hyp = [T(4, 10, "x")]
    out = diarization_error_rate(ref, hyp)
    assert out.missed == pytest.approx(4.0)
    assert out.false_alarm == 0.0 and out.confusion == 0.0
    assert out.der == pytest.approx(0.4)


def test_false_alarm():
    # hyp speaks 0-12 but ref only 0-10: 2 s false alarm over 10 s ref.
    ref = [T(0, 10, "A")]
    hyp = [T(0, 12, "x")]
    out = diarization_error_rate(ref, hyp)
    assert out.false_alarm == pytest.approx(2.0)
    assert out.der == pytest.approx(0.2)


def test_confusion():
    # ref: A 0-6, B 6-10. hyp: one speaker for all 10 s. The mapping
    # assigns hyp-x to A (6 s overlap beats 4); B's 4 s become confusion.
    ref = [T(0, 6, "A"), T(6, 10, "B")]
    hyp = [T(0, 10, "x")]
    out = diarization_error_rate(ref, hyp)
    assert out.confusion == pytest.approx(4.0)
    assert out.missed == 0.0 and out.false_alarm == 0.0
    assert out.der == pytest.approx(0.4)


def test_overlapping_speech():
    # ref: A 0-10 and B 4-6 overlap. hyp finds only one speaker 0-10:
    # during 4-6 there are 2 ref speakers vs 1 hyp -> 2 s missed.
    # total ref time = 10 + 2 = 12.
    ref = [T(0, 10, "A"), T(4, 6, "B")]
    hyp = [T(0, 10, "x")]
    out = diarization_error_rate(ref, hyp)
    assert out.total_reference == pytest.approx(12.0)
    assert out.missed == pytest.approx(2.0)
    assert out.der == pytest.approx(2.0 / 12.0)


def test_collar_forgives_boundaries():
    # Boundary off by 0.2 s; collar 0.25 shrinks ref turns so the
    # mismatch falls in the forgiveness zone.
    ref = [T(0, 5, "A"), T(5, 10, "B")]
    hyp = [T(0, 5.2, "A"), T(5.2, 10, "B")]
    strict = diarization_error_rate(ref, hyp)
    assert strict.confusion == pytest.approx(0.2)
    forgiving = diarization_error_rate(ref, hyp, collar=0.25)
    assert forgiving.confusion == 0.0
    assert forgiving.der == 0.0
    # Collar zones are excluded from the reference time too:
    # each turn loses 2 x 0.25 s per boundary -> 10 - 4*0.25 = 9.
    assert forgiving.total_reference == pytest.approx(9.0)


def test_empty_reference():
    out = diarization_error_rate([], [T(0, 5, "x")])
    assert out.der == float("inf")
    assert diarization_error_rate([], []).der == 0.0


def test_der_breakdown_math():
    b = DERBreakdown(missed=1.0, false_alarm=2.0, confusion=3.0,
                     total_reference=12.0)
    assert b.der == pytest.approx(0.5)


# ------------------------------------------------------------------ RTTM
def test_rttm_roundtrip():
    from yoho_tpu.eval.diarization import compose_rttm, parse_rttm

    turns = [T(0.0, 12.5, "alice"), T(12.5, 30.0, "bob"), T(28.0, 35.0, "alice")]
    text = compose_rttm(turns, "meeting1")
    assert text.startswith("SPEAKER meeting1 1 0.000 12.500")
    parsed = parse_rttm(text)
    assert list(parsed) == ["meeting1"]
    got = parsed["meeting1"]
    assert [(t.start, t.end, t.speaker) for t in got] == \
        [(0.0, 12.5, "alice"), (12.5, 30.0, "bob"), (28.0, 35.0, "alice")]
    # Round-tripped turns score DER 0 against the originals.
    assert diarization_error_rate(turns, got).der == 0.0


def test_rttm_parses_comments_and_multiple_files():
    from yoho_tpu.eval.diarization import parse_rttm

    data = """;; a comment
SPEAKER fileA 1 0.00 5.00 <NA> <NA> spk1 <NA> <NA>
SPEAKER fileB 1 1.00 2.00 <NA> <NA> spk9 <NA>
SPKR-INFO fileA 1 <NA> <NA> <NA> unknown spk1 <NA>
"""
    parsed = parse_rttm(data)
    assert set(parsed) == {"fileA", "fileB"}
    assert parsed["fileB"][0].speaker == "spk9"
    assert parsed["fileB"][0].end == pytest.approx(3.0)


def test_rttm_rejects_short_lines():
    from yoho_tpu.eval.diarization import parse_rttm

    with pytest.raises(ValueError):
        parse_rttm("SPEAKER f 1 0.0 1.0 <NA>")


def test_segments_to_turns():
    from dataclasses import dataclass

    from yoho_tpu.eval.diarization import segments_to_turns

    @dataclass
    class Seg:
        start: float
        end: float
        speaker: object = None

    turns = segments_to_turns([Seg(0, 1, 2), Seg(1, 2)])
    assert turns[0].speaker == 2 and turns[1].speaker == 0


# ------------------------------------------------------------------ EER
def test_cosine_scores():
    a = np.asarray([[1.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    b = np.asarray([[1.0, 0.0], [0.0, 1.0], [-2.0, 0.0]])
    np.testing.assert_allclose(cosine_scores(a, b), [1.0, 0.0, -1.0],
                               atol=1e-9)


def test_eer_perfect_separation():
    scores = np.asarray([0.9, 0.8, 0.7, 0.2, 0.1, 0.0])
    labels = np.asarray([1, 1, 1, 0, 0, 0])
    eer, thr = equal_error_rate(scores, labels)
    assert eer == pytest.approx(0.0, abs=1e-9)
    assert 0.2 < thr < 0.7


def test_eer_random_scores_near_half():
    g = np.random.default_rng(0)
    scores = g.standard_normal(4000)
    labels = g.integers(0, 2, 4000)
    eer, _ = equal_error_rate(scores, labels)
    assert 0.45 < eer < 0.55


def test_eer_known_crossing():
    # pos scores {0.6, 0.4}, neg scores {0.5, 0.3}: at t in (0.4, 0.5]:
    # FRR = 1/2 (0.4 rejected), FAR = 1/2 (0.5 accepted) -> EER = 0.5? No:
    # FAR at t<=0.5 accepts 0.5 only -> 1/2; FRR rejects 0.4 only -> 1/2.
    eer, _ = equal_error_rate(np.asarray([0.6, 0.4, 0.5, 0.3]),
                              np.asarray([1, 1, 0, 0]))
    assert eer == pytest.approx(0.5, abs=0.26)  # discrete grid: 0.25-0.5


def test_eer_requires_both_classes():
    with pytest.raises(ValueError):
        equal_error_rate(np.asarray([0.1, 0.2]), np.asarray([1, 1]))


def test_verification_pairs_balanced_and_separable():
    g = np.random.default_rng(1)
    # 8 speakers, 10 embeddings each, tight clusters -> near-zero EER.
    centers = g.standard_normal((8, 16)) * 3
    embs, ids = [], []
    for s in range(8):
        embs.append(centers[s] + 0.05 * g.standard_normal((10, 16)))
        ids += [s] * 10
    embs = np.concatenate(embs)
    scores, labels = verification_pairs(embs, ids, rng=g)
    assert labels.sum() == (1 - labels).sum()  # balanced trials
    eer, _ = equal_error_rate(scores, labels)
    assert eer < 0.05


def test_verification_pairs_budget_sampling():
    """Past the budget, positive pairs are SAMPLED BY INDEX (never
    materialized): still balanced, same-speaker, distinct, and unique —
    and the call stays fast at pair counts that used to blow up as
    Python tuple lists."""
    import yoho_tpu.eval.diarization as dz

    captured = []
    orig = dz.cosine_scores
    dz.cosine_scores = lambda a, b: (captured.append((a, b)) or orig(a, b))
    try:
        n = 600  # 3 speakers x 200 -> ~19900 pos pairs per speaker
        emb = np.arange(n, dtype=np.float32)[:, None] * np.ones((1, 3))
        ids = [i % 3 for i in range(n)]
        _scores, labels = verification_pairs(emb, ids, max_pairs=400)
        a, b = captured[0]
        npos = int(labels.sum())
        assert npos == 200 and (labels == 0).sum() == 200
        ia, ib = a[:npos, 0].astype(int), b[:npos, 0].astype(int)
        assert all(x % 3 == y % 3 for x, y in zip(ia, ib))
        assert all(x != y for x, y in zip(ia, ib))
        assert len({tuple(sorted(p)) for p in zip(ia, ib)}) == npos
    finally:
        dz.cosine_scores = orig


def test_verification_pairs_single_speaker_raises():
    """All-one-speaker input raises instead of spinning forever looking
    for a different-speaker pair."""
    import numpy as np
    import pytest

    from yoho_tpu.eval.diarization import verification_pairs

    embs = np.random.default_rng(0).standard_normal((4, 8))
    with pytest.raises(ValueError, match="speaker"):
        verification_pairs(embs, ["a", "a", "a", "a"])
