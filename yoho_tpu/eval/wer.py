"""Transcription quality metrics: WER / CER with whisper-style text
normalization.

The north-star target is exact-match transcripts vs the CPU reference on
LibriSpeech test-clean (BASELINE.md); this module provides the measurement
machinery (the reference has none): Levenshtein edit distance with
substitution/insertion/deletion counts and the standard English text
normalization (lowercase, punctuation strip, whitespace squeeze) so scores
are comparable to published numbers.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import List, Sequence, Tuple

_PUNCT = re.compile(r"[^\w\s']", re.UNICODE)


def normalize_for_wer(text: str) -> str:
    """Basic English normalization: NFKC, lowercase, strip punctuation
    (apostrophes kept), squeeze whitespace."""
    text = unicodedata.normalize("NFKC", text).lower()
    text = _PUNCT.sub(" ", text)
    return re.sub(r"\s+", " ", text).strip()


@dataclass
class EditStats:
    substitutions: int
    insertions: int
    deletions: int
    hits: int

    @property
    def errors(self) -> int:
        return self.substitutions + self.insertions + self.deletions

    @property
    def ref_len(self) -> int:
        return self.substitutions + self.deletions + self.hits

    @property
    def rate(self) -> float:
        return self.errors / max(self.ref_len, 1)


def edit_distance(ref: Sequence, hyp: Sequence) -> EditStats:
    """Levenshtein alignment with S/I/D breakdown (O(len(ref)*len(hyp)))."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, subs, ins, dels, hits)
    prev = [(j, 0, j, 0, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i, 0)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                c, s, ins, d, h = prev[j - 1]
                cand = (c, s, ins, d, h + 1)
            else:
                c, s, ins, d, h = prev[j - 1]
                cand = (c + 1, s + 1, ins, d, h)
            c, s, ins, d, h = prev[j]
            cand_del = (c + 1, s, ins, d + 1, h)
            c, s, ins, d, h = cur[j - 1]
            cand_ins = (c + 1, s, ins + 1, d, h)
            cur.append(min(cand, cand_del, cand_ins))
        prev = cur
    _c, s, ins, d, h = prev[m]
    return EditStats(substitutions=s, insertions=ins, deletions=d, hits=h)


def wer(refs: Sequence[str], hyps: Sequence[str],
        normalize: bool = True) -> Tuple[float, EditStats]:
    """Corpus word error rate over paired (reference, hypothesis) texts."""
    assert len(refs) == len(hyps)
    total = EditStats(0, 0, 0, 0)
    for r, h in zip(refs, hyps):
        if normalize:
            r, h = normalize_for_wer(r), normalize_for_wer(h)
        st = edit_distance(r.split(), h.split())
        total.substitutions += st.substitutions
        total.insertions += st.insertions
        total.deletions += st.deletions
        total.hits += st.hits
    return total.rate, total


def cer(refs: Sequence[str], hyps: Sequence[str],
        normalize: bool = True) -> Tuple[float, EditStats]:
    """Corpus character error rate."""
    assert len(refs) == len(hyps)
    total = EditStats(0, 0, 0, 0)
    for r, h in zip(refs, hyps):
        if normalize:
            r, h = normalize_for_wer(r), normalize_for_wer(h)
        st = edit_distance(list(r), list(h))
        total.substitutions += st.substitutions
        total.insertions += st.insertions
        total.deletions += st.deletions
        total.hits += st.hits
    return total.rate, total
