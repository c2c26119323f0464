"""Model components: encoder, decoder, postnet, VAE-GST, Tacotron2, WaveGlow."""

from . import decoder, encoder, postnet, tacotron2, vae_gst  # noqa: F401
from .tacotron2 import Tacotron2Output  # noqa: F401
