"""Low-level parameterized ops and recurrent scans."""

from . import layers, rnn  # noqa: F401
