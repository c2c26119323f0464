"""Text frontend: text → symbol-id sequences.

Public API parity with reference ``text/__init__.py:30-95``
(``text_to_sequence``, ``sequence_to_text``), minus the import-time global
hparams coupling: the symbol table is selected per call from the cleaner
names instead of mutating module globals.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Sequence

from . import cleaners as _cleaners_mod
from .symbols import eng_symbols

# Text enclosed in curly braces is treated as an ARPAbet phone sequence.
_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")


@lru_cache(maxsize=None)
def _tables(cleaner_names: tuple, symbol_type: int = 1):
    if tuple(cleaner_names) == ("english_cleaners",):
        symbols = eng_symbols
    elif tuple(cleaner_names) == ("korean_cleaners",):
        symbols = change_symbol(symbol_type)
    else:
        # Default to the Korean inventory for unknown cleaner combos.
        symbols = change_symbol(symbol_type)
    symbol_to_id = {s: i for i, s in enumerate(symbols)}
    id_to_symbol = {i: s for i, s in enumerate(symbols)}
    return symbol_to_id, id_to_symbol


def change_symbol(symbol_type: int = 1):
    """Return the Korean symbol inventory for ``symbol_type`` (1..4).

    Functional equivalent of reference ``text/__init__.py::change_symbol``,
    which mutates the module-global symbol maps; here the table is selected
    per call (pass ``symbol_type=`` to ``text_to_sequence``) so concurrent
    callers can use different inventories.
    """
    from .korean import (
        ALL_SYMBOLS_1,
        ALL_SYMBOLS_2,
        ALL_SYMBOLS_3,
        ALL_SYMBOLS_4,
    )

    tables = {1: ALL_SYMBOLS_1, 2: ALL_SYMBOLS_2,
              3: ALL_SYMBOLS_3, 4: ALL_SYMBOLS_4}
    if symbol_type not in tables:
        raise ValueError(f"symbol_type must be 1..4, got {symbol_type}")
    return tables[symbol_type]


def text_to_sequence(text: str, cleaner_names: Sequence[str],
                     symbol_type: int = 1) -> List[int]:
    """Convert text to a list of symbol ids (EOS '~' appended).

    Curly-brace spans are read as ARPAbet: "Turn left on {HH AW1 S} Street."
    ``symbol_type`` selects the Korean symbol inventory (1..4) — the
    non-mutating analog of the reference's ``change_symbol``.
    """
    cleaner_names = tuple(cleaner_names)
    symbol_to_id, _ = _tables(cleaner_names, symbol_type)
    sequence: List[int] = []
    while text:
        m = _curly_re.match(text)
        if not m:
            sequence.extend(
                _symbols_to_sequence(_clean_text(text, cleaner_names, symbol_type), symbol_to_id)
            )
            break
        sequence.extend(
            _symbols_to_sequence(_clean_text(m.group(1), cleaner_names, symbol_type), symbol_to_id)
        )
        sequence.extend(_arpabet_to_sequence(m.group(2), symbol_to_id))
        text = m.group(3)
    sequence.append(symbol_to_id["~"])
    return sequence


def sequence_to_text(
    sequence: Sequence[int],
    cleaner_names: Sequence[str] = ("korean_cleaners",),
    symbol_type: int = 1,
) -> str:
    """Convert a sequence of ids back to a string."""
    _, id_to_symbol = _tables(tuple(cleaner_names), symbol_type)
    result = ""
    for sid in sequence:
        s = id_to_symbol.get(int(sid))
        if s is None:
            continue
        if len(s) > 1 and s.startswith("@"):
            s = "{%s}" % s[1:]
        result += s
    return result.replace("}{", " ")


def _clean_text(text: str, cleaner_names: tuple, symbol_type: int = 1):
    for name in cleaner_names:
        cleaner = getattr(_cleaners_mod, name, None)
        if cleaner is None:
            raise ValueError(f"Unknown cleaner: {name}")
        if name == "korean_cleaners":
            text = cleaner(text, symbol_type=symbol_type)
        else:
            text = cleaner(text)
    return text


def _symbols_to_sequence(symbols, symbol_to_id):
    return [
        symbol_to_id[s]
        for s in symbols
        if s in symbol_to_id and s not in ("_", "~")
    ]


def _arpabet_to_sequence(text: str, symbol_to_id):
    return _symbols_to_sequence(["@" + s for s in text.split()], symbol_to_id)
