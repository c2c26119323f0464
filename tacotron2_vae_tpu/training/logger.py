"""TensorBoard logging (tensorboardX), matching the reference scalar names.

Parity target: reference ``Tacotron2Logger`` (logger.py:8-57): training
scalars (training.loss, grad.norm, learning.rate, duration, kl_div,
kl_weight, recon_loss), validation loss, parameter histograms, and
alignment / mel / gate / latent-scatter images.
"""

from __future__ import annotations

import numpy as np

try:
    from tensorboardX import SummaryWriter

    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False

from ..utils.plotting import (
    plot_alignment_to_numpy,
    plot_gate_outputs_to_numpy,
    plot_scatter,
    plot_spectrogram_to_numpy,
)


class Tacotron2Logger:
    def __init__(self, logdir: str):
        if not _HAS_TB:
            raise RuntimeError("tensorboardX is unavailable")
        self.writer = SummaryWriter(logdir)
        # CSV sidecars (TPU-native addition): the same scalars tensorboardX
        # gets, but trivially machine-readable — curve regeneration
        # (tools/curves_run.py) and CI read these instead of event files.
        import os

        self._train_csv = os.path.join(logdir, "metrics.csv")
        self._val_csv = os.path.join(logdir, "val_metrics.csv")
        if not os.path.exists(self._train_csv):
            with open(self._train_csv, "w") as f:
                f.write("iteration,loss,grad_norm,learning_rate,duration,"
                        "kl_div,kl_weight,recon_loss\n")
        if not os.path.exists(self._val_csv):
            with open(self._val_csv, "w") as f:
                f.write("iteration,loss,recon_loss,kl_div\n")

    def log_training(self, reduced_loss, grad_norm, learning_rate, duration,
                     kl_div, kl_weight, recon_loss, iteration):
        w = self.writer
        w.add_scalar("training.loss", float(reduced_loss), iteration)
        w.add_scalar("grad.norm", float(grad_norm), iteration)
        w.add_scalar("learning.rate", float(learning_rate), iteration)
        w.add_scalar("duration", float(duration), iteration)
        w.add_scalar("kl_div", float(kl_div), iteration)
        w.add_scalar("kl_weight", float(kl_weight), iteration)
        w.add_scalar("recon_loss", float(recon_loss), iteration)
        with open(self._train_csv, "a") as f:
            f.write(f"{iteration},{float(reduced_loss):.6f},"
                    f"{float(grad_norm):.6f},{float(learning_rate):.8f},"
                    f"{float(duration):.4f},{float(kl_div):.6f},"
                    f"{float(kl_weight):.6f},{float(recon_loss):.6f}\n")

    def log_validation(self, reduced_loss, params, outputs, targets, iteration,
                       components=None):
        """outputs: Tacotron2Output; targets: (mel_target, gate_target).

        ``components`` (optional): val-set-averaged {recon_loss, kl_loss} —
        logged alongside the total (the reference logs only the total,
        logger.py:24; the components are already computed by the loss aux)."""
        w = self.writer
        w.add_scalar("validation.loss", float(reduced_loss), iteration)
        recon = kl = float("nan")
        if components:
            recon = float(components.get("recon_loss", float("nan")))
            kl = float(components.get("kl_loss", float("nan")))
            w.add_scalar("validation.recon_loss", recon, iteration)
            w.add_scalar("validation.kl_div", kl, iteration)
        with open(self._val_csv, "a") as f:
            f.write(f"{iteration},{float(reduced_loss):.6f},"
                    f"{recon:.6f},{kl:.6f}\n")

        # Parameter histograms (logger.py:31-33).
        def walk(tree, path=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, f"{path}.{k}" if path else k)
            elif isinstance(tree, (list, tuple)):
                for i, v in enumerate(tree):
                    walk(v, f"{path}.{i}")
            else:
                w.add_histogram(path, np.asarray(tree), iteration)

        walk(params)

        mel_target, gate_target = targets
        idx = 0
        align = np.asarray(outputs.alignments[idx]).T  # (S, T)
        w.add_image(
            "alignment", plot_alignment_to_numpy(align), iteration,
            dataformats="HWC",
        )
        w.add_image(
            "mel_target",
            plot_spectrogram_to_numpy(np.asarray(mel_target[idx])),
            iteration, dataformats="HWC",
        )
        w.add_image(
            "mel_predicted",
            plot_spectrogram_to_numpy(np.asarray(outputs.mel_outputs_postnet[idx])),
            iteration, dataformats="HWC",
        )
        w.add_image(
            "gate",
            plot_gate_outputs_to_numpy(
                np.asarray(gate_target[idx]),
                _sigmoid(np.asarray(outputs.gate_outputs[idx])),
            ),
            iteration, dataformats="HWC",
        )
        # Latent scatter colored by emotion (logger.py:49-56).
        emotions = np.asarray(outputs.emotions)
        if emotions.size and emotions.ndim == 2:
            labels = emotions.argmax(axis=1)
            w.add_image(
                "latent_mu",
                plot_scatter(np.asarray(outputs.mu), labels),
                iteration, dataformats="HWC",
            )

    def close(self):
        self.writer.close()


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))
