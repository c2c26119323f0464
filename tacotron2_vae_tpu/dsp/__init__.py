"""DSP front-end: STFT, mel filterbank, inversion, audio IO."""

from .mel import mel_filterbank  # noqa: F401
from .stft import (  # noqa: F401
    TacotronSTFT,
    dynamic_range_compression,
    dynamic_range_decompression,
    stft_complex,
    stft_magnitude,
)
from .invert import griffin_lim, istft, window_sumsquare  # noqa: F401
from .audio import load_wav, save_wav  # noqa: F401
