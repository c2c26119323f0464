"""Symbol inventories for text input (reference ``text/symbols.py:10-21``).

``kor_symbols`` is the 80-symbol jamo inventory used by ``korean_cleaners``
(matches hparams ``n_symbols=80``); ``eng_symbols`` is the 65-symbol ASCII
inventory for ``english_cleaners``.
"""

from .korean import ALL_SYMBOLS_1
from . import cmudict

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_end = "~"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

# ARPAbet symbols get an '@' prefix for uniqueness (kept available but, as in
# the reference, not part of the default English inventory).
_arpabet = ["@" + s for s in cmudict.valid_symbols]

eng_symbols = [_pad] + list(_special) + list(_punctuation) + list(_letters) + [_end]
kor_symbols = ALL_SYMBOLS_1
