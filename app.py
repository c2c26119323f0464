#!/usr/bin/env python
"""Web demo / API CLI shim (same surface as reference app.py)."""

from tacotron2_vae_tpu.serving.app import main

if __name__ == "__main__":
    main()
