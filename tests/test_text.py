"""Text frontend golden tests.

Goldens come from the reference README (README.md:18-23) and the reference's
own smoke cases (text/korean.py:396-407, text/__init__.py:97-111).
"""

import pytest

from tacotron2_vae_tpu.text import text_to_sequence, sequence_to_text
from tacotron2_vae_tpu.text import korean
from tacotron2_vae_tpu.text.korean import normalize, tokenize
from tacotron2_vae_tpu.text.numbers_en import normalize_numbers
from tacotron2_vae_tpu.text import cleaners

README_TEXT = "감정있는 한국어 목소리 생성"
README_TOKENS = [
    "ᄀ", "ㅏ", "ㅁ", "ᄌ", "ㅓ", "ㅇ", "ᄋ", "ㅣ", "ㅆ", "ᄂ", "ㅡ", "ㄴ",
    " ", "ᄒ", "ㅏ", "ㄴ", "ᄀ", "ㅜ", "ㄱ", "ᄋ", "ㅓ", " ", "ᄆ", "ㅗ",
    "ㄱ", "ᄉ", "ㅗ", "ᄅ", "ㅣ", " ", "ᄉ", "ㅐ", "ㅇ", "ᄉ", "ㅓ", "ㅇ", "~",
]
README_IDS = [
    2, 21, 57, 14, 25, 62, 13, 41, 61, 4, 39, 45, 79, 20, 21, 45, 2, 34, 42,
    13, 25, 79, 8, 29, 42, 11, 29, 7, 41, 79, 11, 22, 62, 11, 25, 62, 1,
]


def test_symbol_inventory_sizes():
    assert len(korean.ALL_SYMBOLS_1) == 80  # matches hparams n_symbols=80


def test_readme_golden_tokens():
    assert tokenize(README_TEXT, as_id=False) == README_TOKENS


def test_readme_golden_ids():
    assert text_to_sequence(README_TEXT, ["korean_cleaners"]) == README_IDS


def test_korean_cleaners_matches_tokenize():
    assert cleaners.korean_cleaners(README_TEXT) == README_TOKENS


def test_tail_digeut_quirk():
    # The reference type-1 table maps tail ㄷ to 'ㅇ' (korean.py:151), so both
    # 닫 and 당 end with id 62.
    assert tokenize("닫", as_id=True) == [5, 21, 62, 1]
    assert tokenize("당", as_id=True) == [5, 21, 62, 1]


def test_normalize_english_and_upper():
    assert (
        normalize("JTBC는 JTBCs를 DY는 A가 Absolute")
        == "제이티비씨는 JTBCs를 디와이는 에이가 Absolute"
    )


def test_normalize_date_paren_and_counter():
    assert normalize("오늘(13일) 101마리 강아지가") == "오늘 백한마리 강아지가"


def test_normalize_negative_decimal_percent_and_counters():
    assert (
        normalize("지금은 -12.35%였고 종류는 5가지와 19가지, 그리고 55가지였다")
        == "지금은 마이너스 십이쩜 삼오퍼센트였고 종류는 다섯가지와 열아홉가지, "
        "그리고 쉰다섯가지였다"
    )


def test_normalize_dates_hours_age():
    assert (
        normalize("JTBC는 TH와 K 양이 2017년 9월 12일 오후 12시에 24살이 된다")
        == "제이티비씨는 티에이치와 케이 양이 이천일십칠년 구월 십이일 오후 "
        "열두시에 스물네살이 된다"
    )


def test_sequence_roundtrip():
    seq = text_to_sequence(README_TEXT, ["korean_cleaners"])
    text = sequence_to_text(seq, ["korean_cleaners"])
    assert text == "".join(README_TOKENS[:-1]) + "~"


def test_english_cleaners():
    out = cleaners.english_cleaners("Dr. Smith bought 2 apples for $3.50.")
    assert out == (
        "doctor smith bought two apples for three dollars, fifty cents."
    )


def test_english_sequence_has_eos():
    seq = text_to_sequence("hello world.", ["english_cleaners"])
    assert seq[-1] == 64  # '~' is the last of the 65 english symbols
    assert all(0 <= i < 65 for i in seq)


def test_normalize_numbers_en():
    # 1000 < n < 3000 gets the year-style reading (reference numbers_.py:49-61)
    assert normalize_numbers("1,234 dogs") == "twelve thirty-four dogs"
    assert normalize_numbers("5,234") == "five thousand two hundred thirty-four"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("2005") == "two thousand five"
    assert normalize_numbers("1987") == "nineteen eighty-seven"
    assert normalize_numbers("1900") == "nineteen hundred"
    assert normalize_numbers("3.14") == "three point fourteen"


def test_zero_and_units():
    # '%' is dictionary-replaced to 퍼센트 before number expansion; zero keeps
    # no *count* unit but literal unit text survives.
    assert normalize("0%는") == "영퍼센트는"
    assert normalize("0마리") == "영"  # reference drops count unit on zero
    assert normalize("3km를 더") == "삼킬로미터를 더"


def test_quote_normalization():
    out = normalize("그는 “반갑다. 잘 지냈니?” 라고 했다")
    assert out == "그는 '반갑다.' '잘 지냈니?' 라고 했다"


def test_hparams_symbol_count_consistency():
    from tacotron2_vae_tpu.config import create_hparams

    hp = create_hparams()
    assert hp.n_symbols == len(korean.ALL_SYMBOLS_1)
