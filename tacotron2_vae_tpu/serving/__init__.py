"""Serving: Synthesizer class and web demo/API."""

from .synthesizer import Synthesizer  # noqa: F401
