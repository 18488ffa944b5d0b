"""Multilingual number verbalizers (yoho_tpu.text.numbers).

Golden values are hand-checked standard orthography for each language
(the num2words package the reference used is absent from this image, so
these spellings are the specification).
"""

import pytest

from yoho_tpu.text.numbers import (
    decimal_to_words,
    int_to_words,
    supported_languages,
)
from yoho_tpu.text.standardize import number_to_words, standardize_text


def test_supported_languages():
    assert set(supported_languages()) == {"en", "de", "es", "fr", "cs"}


@pytest.mark.parametrize("n,expected", [
    (0, "null"),
    (1, "eins"),
    (7, "sieben"),
    (16, "sechzehn"),
    (21, "einundzwanzig"),
    (30, "dreißig"),
    (42, "zweiundvierzig"),
    (100, "einhundert"),
    (101, "einhunderteins"),
    (234, "zweihundertvierunddreißig"),
    (1000, "eintausend"),
    (1001, "eintausendeins"),
    (2024, "zweitausendvierundzwanzig"),
    (21000, "einundzwanzigtausend"),
    (1000000, "eine Million"),
    (2000000, "zwei Millionen"),
    (2500000, "zwei Millionen fünfhunderttausend"),
    (1000000000, "eine Milliarde"),
    (-5, "minus fünf"),
])
def test_german(n, expected):
    assert int_to_words(n, "de") == expected


@pytest.mark.parametrize("n,expected", [
    (0, "cero"),
    (15, "quince"),
    (16, "dieciséis"),
    (21, "veintiuno"),
    (30, "treinta"),
    (31, "treinta y uno"),
    (42, "cuarenta y dos"),
    (100, "cien"),
    (101, "ciento uno"),
    (200, "doscientos"),
    (500, "quinientos"),
    (999, "novecientos noventa y nueve"),
    (1000, "mil"),
    (1001, "mil uno"),
    (2024, "dos mil veinticuatro"),
    (1000000, "un millón"),
    (2000000, "dos millones"),
    (-8, "menos ocho"),
])
def test_spanish(n, expected):
    assert int_to_words(n, "es") == expected


@pytest.mark.parametrize("n,expected", [
    (0, "zéro"),
    (17, "dix-sept"),
    (21, "vingt et un"),
    (42, "quarante-deux"),
    (70, "soixante-dix"),
    (71, "soixante et onze"),
    (72, "soixante-douze"),
    (80, "quatre-vingts"),
    (81, "quatre-vingt-un"),
    (90, "quatre-vingt-dix"),
    (99, "quatre-vingt-dix-neuf"),
    (100, "cent"),
    (101, "cent un"),
    (200, "deux cents"),
    (231, "deux cent trente et un"),
    (1000, "mille"),
    (2024, "deux mille vingt-quatre"),
    (1000000, "un million"),
    (3000000, "trois millions"),
    (-4, "moins quatre"),
])
def test_french(n, expected):
    assert int_to_words(n, "fr") == expected


@pytest.mark.parametrize("n,expected", [
    (0, "nula"),
    (2, "dva"),
    (11, "jedenáct"),
    (21, "dvacet jedna"),
    (42, "čtyřicet dva"),
    (100, "sto"),
    (200, "dvě stě"),
    (300, "tři sta"),
    (500, "pět set"),
    (999, "devět set devadesát devět"),
    (1000, "tisíc"),
    (2000, "dva tisíce"),
    (5000, "pět tisíc"),
    (12000, "dvanáct tisíc"),
    (22000, "dvacet dva tisíce"),
    (1000000, "milion"),
    (2000000, "dva miliony"),
    (5000000, "pět milionů"),
    (-3, "minus tři"),
])
def test_czech(n, expected):
    assert int_to_words(n, "cs") == expected


def test_decimals_per_language():
    assert decimal_to_words("3.5", "en") == "three point five"
    assert decimal_to_words("3.5", "de") == "drei Komma fünf"
    assert decimal_to_words("3.5", "es") == "tres coma cinco"
    assert decimal_to_words("3.5", "fr") == "trois virgule cinq"
    assert decimal_to_words("3.5", "cs") == "tři celá pět"
    assert decimal_to_words("12.34", "en") == "twelve point three four"


def test_number_to_words_dispatch():
    # Comma decimal separator normalizes (European transcripts).
    assert number_to_words("3,5", "de") == "drei Komma fünf"
    assert number_to_words("42", "fr") == "quarante-deux"
    # Regioned codes map to the base language.
    assert number_to_words("42", "en-us") == "forty-two"
    # Unsupported language without num2words: digits pass through.
    assert number_to_words("42", "zh") == "42"


def test_standardize_multilingual():
    assert standardize_text("Es kostet 21 Euro", "de") == \
        "Es kostet einundzwanzig Euro"
    assert standardize_text("mám 2 psy (fakt)", "cs") == "mám dva psy"
    assert standardize_text("il a 80 ans", "fr") == "il a quatre-vingts ans"


def test_verbalizer_agreement_fixes():
    """Linguistic agreement cases that diverge from naive composition
    (parity targets: num2words behavior)."""
    from yoho_tpu.text.numbers import (
        decimal_to_words,
        int_to_words_cs,
        int_to_words_es,
        int_to_words_fr,
    )

    # French: plural -s drops before the numeral 'mille', stays before
    # the nouns million/milliard.
    assert int_to_words_fr(80000) == "quatre-vingt mille"
    assert int_to_words_fr(200000) == "deux cent mille"
    assert int_to_words_fr(200000000) == "deux cents millions"
    # Spanish: 'uno' apocopates before mil/millones.
    assert int_to_words_es(21000) == "veintiún mil"
    assert int_to_words_es(31000) == "treinta y un mil"
    assert int_to_words_es(21 * 10**6) == "veintiún millones"
    # Czech: miliarda is feminine — 'dvě miliardy'.
    assert int_to_words_cs(2 * 10**9) == "dvě miliardy"
    assert int_to_words_cs(2 * 10**6) == "dva miliony"
    # Negative fraction with zero integer part keeps its sign.
    assert decimal_to_words("-0.5", "en") == "minus zero point five"
