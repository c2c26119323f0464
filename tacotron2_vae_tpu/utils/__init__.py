"""Utilities: plotting, misc helpers."""


def str2bool(v) -> bool:
    """Parse a boolean CLI flag (reference utils.py:31-34)."""
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "1")
