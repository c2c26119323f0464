"""ARPAbet (CMU pronouncing dictionary) support for the English text path.

Capability parity with reference ``text/cmudict.py:19-65``.  The ARPAbet
phone inventory is the standard public CMUdict set (39 phones x stress marks).
"""

from __future__ import annotations

import re

_PHONES = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z", "ZH",
]
_VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH", "IY",
           "OW", "OY", "UH", "UW"}

# Vowel phones carry stress digits 0/1/2; consonants do not.
valid_symbols = sorted(
    [p for p in _PHONES if p not in _VOWELS]
    + [p + s for p in _PHONES if p in _VOWELS for s in ("", "0", "1", "2")]
)

_valid_symbol_set = set(valid_symbols)
_alt_re = re.compile(r"\([0-9]+\)")


class CMUDict:
    """Thin wrapper around CMUdict data (same API as the reference)."""

    def __init__(self, file_or_path, keep_ambiguous: bool = True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding="latin-1") as f:
                entries = _parse(f)
        else:
            entries = _parse(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self) -> int:
        return len(self._entries)

    def lookup(self, word: str):
        """Return the list of ARPAbet pronunciations for ``word`` (or None)."""
        return self._entries.get(word.upper())


def _parse(file) -> dict:
    entries: dict[str, list[str]] = {}
    for line in file:
        if not line or not ("A" <= line[0] <= "Z" or line[0] == "'"):
            continue
        parts = line.split("  ")
        if len(parts) < 2:
            continue
        word = _alt_re.sub("", parts[0])
        phones = parts[1].strip().split(" ")
        if all(p in _valid_symbol_set for p in phones):
            entries.setdefault(word, []).append(" ".join(phones))
    return entries
