"""Text standardization for tokenizer/ASR training.

Capability parity with the reference ``train/utils/standardize_text.py``
(strip parenthesized/ bracketed asides, numbers -> words, whitespace/punct
cleanup). The reference delegates numbers to the ``num2words`` package; this
implementation ships its own English verbalizer (covering integers up to
999 trillion and decimals) and gates other languages behind ``num2words``
when it happens to be installed, passing digits through otherwise.
"""

from __future__ import annotations

import re
from typing import Optional

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
    "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen", "sixteen",
    "seventeen", "eighteen", "nineteen",
]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty",
         "ninety"]
_SCALE = [(10**12, "trillion"), (10**9, "billion"), (10**6, "million"), (10**3, "thousand")]


def _int_to_words_en(n: int) -> str:
    if n < 0:
        return "minus " + _int_to_words_en(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, rest = divmod(n, 10)
        return _TENS[tens] + (f"-{_ONES[rest]}" if rest else "")
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        out = f"{_ONES[hundreds]} hundred"
        return out + (f" {_int_to_words_en(rest)}" if rest else "")
    for value, name in _SCALE:
        if n >= value:
            major, rest = divmod(n, value)
            out = f"{_int_to_words_en(major)} {name}"
            return out + (f" {_int_to_words_en(rest)}" if rest else "")
    return str(n)  # beyond supported range: pass through


def number_to_words(num_str: str, lang: str = "en") -> str:
    """Verbalize ``"124.5"``-style numerals. English built-in; other
    languages use num2words when importable, else digits pass through."""
    num_str = num_str.replace(",", ".")
    if lang not in ("en", "en-us", "en-gb"):
        try:
            from num2words import num2words  # optional; absent in this image

            # num2words doesn't use ISO-639 codes for some languages
            # (parity with reference standardize_text.py:8-14).
            corrections = {"cs": "cz", "da": "dk", "tgk": "tg"}
            return num2words(num_str, lang=corrections.get(lang, lang))
        except Exception:
            return num_str
    if "." in num_str:
        whole, frac = num_str.split(".", 1)
        words = _int_to_words_en(int(whole)) if whole else "zero"
        if frac:
            digits = " ".join(_ONES[int(d)] for d in frac if d.isdigit())
            return f"{words} point {digits}"
        return words
    return _int_to_words_en(int(num_str))


def standardize_text(text: str, lang: str = "en") -> Optional[str]:
    """Normalize one utterance (same pipeline shape as the reference):
    drop asides, verbalize numerals, squeeze whitespace, fix punct spacing."""
    text = re.sub(r"\(.*?\)", "", text)
    text = re.sub(r"\[.*?\]", "", text)
    text = re.sub(r"\d+([.,]\d+)?", lambda m: number_to_words(m.group(), lang), text)
    text = re.sub(r"\s+", " ", text).strip()
    text = re.sub(r"\s+([,.;?!])", r"\1", text)
    return text
