"""Data pipeline: datasets, collate, loaders."""

from .dataset import (  # noqa: F401
    Batch,
    DataLoader,
    TextMelDataset,
    collate,
    load_filepaths_and_text,
)
from .prefetch import prefetch  # noqa: F401
