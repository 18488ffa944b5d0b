"""Tiny stopword-profile language detector.

The reference uses the ``eld`` package to whitelist transcript languages
(``train/utils/dataloaders.py:44-50``); this dependency-free replacement
scores text against per-language stopword/character profiles. It covers the
languages a YOHO-style training setup realistically whitelists; unknown
inputs return the best guess with a low score, so callers can threshold.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import NamedTuple

_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was",
           "on", "are", "with", "as", "this", "you", "not", "be", "have"},
    "cs": {"a", "se", "na", "je", "to", "v", "že", "s", "z", "do", "o", "ale",
           "i", "by", "jak", "co", "tak", "pro", "už", "nebo"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ich", "zu", "mit", "ein",
           "auf", "den", "es", "sie", "von", "dem", "auch", "sich", "für", "war"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pas", "je",
           "dans", "pour", "qui", "vous", "il", "sur", "ce", "au", "du"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "es", "no",
           "se", "por", "con", "para", "su", "al", "lo", "como", "más"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "è", "per", "non", "in",
           "con", "si", "sono", "del", "le", "mi", "ma", "questo", "della"},
    "pl": {"i", "w", "na", "się", "nie", "z", "to", "że", "do", "jest", "o",
           "jak", "ale", "po", "co", "tak", "za", "od", "czy", "tego"},
    "ru": {"и", "в", "не", "на", "что", "я", "с", "он", "как", "это", "по",
           "но", "они", "мы", "из", "у", "за", "вы", "так", "же"},
}

_WORD = re.compile(r"[^\W\d_]+", re.UNICODE)


class Detection(NamedTuple):
    language: str
    score: float  # fraction of tokens that matched the winning profile


def detect_language(text: str) -> Detection:
    words = [w.lower() for w in _WORD.findall(text)]
    if not words:
        return Detection("und", 0.0)
    counts = Counter(words)
    total = sum(counts.values())
    best_lang, best_hits = "und", 0
    for lang, profile in _PROFILES.items():
        hits = sum(c for w, c in counts.items() if w in profile)
        # Ties resolve to the FIRST profile in _PROFILES order (strict >):
        # deterministic, but no diacritic disambiguation is attempted.
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return Detection(best_lang, best_hits / max(total, 1))
