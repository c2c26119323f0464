#!/usr/bin/env python
"""Synthesizer shim (same import surface as reference synthesizer.py)."""

import argparse
import os

from tacotron2_vae_tpu.serving.synthesizer import Synthesizer  # noqa: F401
from tacotron2_vae_tpu.utils import str2bool

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_path", required=True)
    parser.add_argument("--waveglow_path", default=None)
    parser.add_argument("--sample_path", default="samples")
    parser.add_argument("--text", required=True)
    parser.add_argument("--ref_audio", default=None)
    parser.add_argument("--ratios", default="1,0,0,0",
                        help="neu,sad,hap,ang emotion mix")
    parser.add_argument("--is_korean", default=True, type=str2bool)
    config = parser.parse_args()

    os.makedirs(config.sample_path, exist_ok=True)
    synth = Synthesizer()
    synth.load(config.load_path, config.waveglow_path)
    out = os.path.join(config.sample_path, "synth.wav")
    ratios = [float(x) for x in config.ratios.split(",")]
    synth.synthesize(
        config.text, out,
        condition_on_ref=config.ref_audio is not None,
        ref_audio=config.ref_audio, ratios=ratios,
    )
    print(out)
