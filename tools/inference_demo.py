#!/usr/bin/env python
"""Inference recipes (the reference inference.ipynb, README.md:59-253).

Three generation modes plus latent-space visualization:
  * latents:   extract mu/z for a filelist, save scatter + t-SNE plots
               (README.md:88-146)
  * ref:       condition on a reference wav (generate_audio_vae_by_ref,
               README.md:158-174)
  * interp:    interpolate between two emotion centroids with ratio ladder
               [1.0, 0.64, 0.34, 0.0] (generate_audio_vae, README.md:189-221)
  * mix:       arbitrary emotion ratio mix (generate_audio_vae_mix,
               README.md:232-252)

Usage:
  python tools/inference_demo.py latents --checkpoint C --filelist F -o outdir
  python tools/inference_demo.py ref --checkpoint C --waveglow W \
      --text "..." --ref_audio ref.wav -o outdir
  python tools/inference_demo.py interp --checkpoint C --waveglow W \
      --text "..." --from neu --to hap -o outdir
  python tools/inference_demo.py mix --checkpoint C --waveglow W \
      --text "..." --ratios 0.25,0.25,0.25,0.25 -o outdir
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron2_vae_tpu.serving.synthesizer import Synthesizer  # noqa: E402

INTERP_RATIOS = [1.0, 0.64, 0.34, 0.0]  # README.md:189-221
EMOTIONS = ["neu", "sad", "ang", "hap"]  # label order (synthesizer.py:107-110)


def cmd_latents(args, synth):
    from tacotron2_vae_tpu.models import vae_gst
    from tacotron2_vae_tpu.utils.plotting import plot_scatter, plot_tsne

    entries = [
        line.strip().split("|")
        for line in open(args.filelist, encoding="utf-8")
        if line.strip()
    ]
    mus, zs, labels = [], [], []
    for audio_path, _t, _s, emotion in entries:
        mel = synth.load_mel(audio_path)
        (_, mu, _logvar, z), _ = vae_gst.apply(
            synth.params["vae_gst"], synth.model_state["vae_gst"], mel,
            train=False,
        )
        mus.append(np.asarray(mu)[0])
        zs.append(np.asarray(z)[0])
        labels.append(int(emotion))
    mus, zs, labels = np.stack(mus), np.stack(zs), np.asarray(labels)
    np.savez(os.path.join(args.outdir, "latents.npz"),
             mus=mus, zs=zs, emotions=labels)

    from PIL import Image  # pillow ships with matplotlib

    Image.fromarray(plot_scatter(mus, labels, names=tuple(EMOTIONS))).save(
        os.path.join(args.outdir, "scatter.png")
    )
    Image.fromarray(plot_tsne(zs, labels, names=tuple(EMOTIONS))).save(
        os.path.join(args.outdir, "tsne.png")
    )
    print(f"saved latents + scatter + tsne to {args.outdir}")


def cmd_ref(args, synth):
    out = os.path.join(args.outdir, "ref_conditioned.wav")
    synth.synthesize(args.text, out, True, args.ref_audio, None)
    print(out)


def cmd_interp(args, synth):
    for i, r in enumerate(INTERP_RATIOS):
        style = synth.interpolate(args.frm, args.to, 1.0 - r)
        mel, mel_post, *_ = synth.synthesize_mel(args.text, style)
        wav = synth.vocode(mel_post)
        from tacotron2_vae_tpu.dsp import save_wav

        out = os.path.join(
            args.outdir, f"interp_{args.frm}{r:.2f}_{args.to}{1 - r:.2f}.wav"
        )
        save_wav(out, wav, synth.hparams.sampling_rate)
        print(out)


def cmd_mix(args, synth):
    ratios = [float(x) for x in args.ratios.split(",")]
    out = os.path.join(args.outdir, "mix.wav")
    synth.synthesize(args.text, out, False, None, ratios)
    print(out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["latents", "ref", "interp", "mix"])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--waveglow", default=None)
    parser.add_argument("--filelist", default=None)
    parser.add_argument("--text", default="감정있는 한국어 목소리 생성")
    parser.add_argument("--ref_audio", default=None)
    parser.add_argument("--from", dest="frm", default="neu", choices=EMOTIONS)
    parser.add_argument("--to", default="hap", choices=EMOTIONS)
    parser.add_argument("--ratios", default="1,0,0,0")
    parser.add_argument("-o", "--outdir", default="samples")
    args = parser.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    synth = Synthesizer()
    synth.load(args.checkpoint, args.waveglow, centroid_filelist=args.filelist)
    {"latents": cmd_latents, "ref": cmd_ref,
     "interp": cmd_interp, "mix": cmd_mix}[args.mode](args, synth)


if __name__ == "__main__":
    main()
