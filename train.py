#!/usr/bin/env python
"""Training CLI shim (same surface as reference train.py)."""

from tacotron2_vae_tpu.training.train import main

if __name__ == "__main__":
    main()
