"""tacotron2_vae_tpu — a TPU-native (JAX/XLA/Pallas) emotional TTS framework.

A from-scratch rebuild of the capabilities of jinhan/tacotron2-vae:
Tacotron2 + VAE-GST prosody control for emotional Korean speech synthesis,
vocoded by WaveGlow — designed for TPU (static shapes, lax.scan recurrences,
shard_map data parallelism, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"

from .config import HParams, create_hparams  # noqa: F401
