"""Matplotlib-Agg plotting to numpy RGB images (reference plotting_utils.py)."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pylab as plt  # noqa: E402


def _fig_to_numpy(fig) -> np.ndarray:
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def plot_alignment_to_numpy(alignment: np.ndarray, info: str | None = None):
    """alignment: (encoder_steps, decoder_steps)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep" + (f"\n\n{info}" if info else "")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Encoder timestep")
    fig.tight_layout()
    return _fig_to_numpy(fig)


def plot_spectrogram_to_numpy(spectrogram: np.ndarray):
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Frames")
    ax.set_ylabel("Channels")
    fig.tight_layout()
    return _fig_to_numpy(fig)


def plot_gate_outputs_to_numpy(gate_targets, gate_outputs):
    # per-step gate predictions (n_frames_per_step > 1) are upsampled to
    # the per-frame target axis so both series share x; ceil-repeat then
    # trim so non-divisible lengths (frame-trimmed targets) still align
    if len(gate_outputs) != len(gate_targets):
        reps = -(-len(gate_targets) // len(gate_outputs))
        gate_outputs = np.repeat(
            np.asarray(gate_outputs), reps
        )[: len(gate_targets)]
    fig, ax = plt.subplots(figsize=(12, 3))
    ax.scatter(
        range(len(gate_targets)), gate_targets, alpha=0.5,
        color="green", marker="+", s=1, label="target",
    )
    ax.scatter(
        range(len(gate_outputs)), gate_outputs, alpha=0.5,
        color="red", marker=".", s=1, label="predicted",
    )
    ax.set_xlabel("Frames (Green target, Red predicted)")
    ax.set_ylabel("Gate State")
    fig.tight_layout()
    return _fig_to_numpy(fig)


def plot_scatter(mus: np.ndarray, labels: np.ndarray, names=("neu", "sad", "ang", "hap")):
    """2-D scatter of the first two latent dims colored by emotion label."""
    colors = "r", "b", "g", "y", "c", "m"
    fig, ax = plt.subplots(figsize=(6, 6))
    for i in range(min(len(names), int(labels.max(initial=0)) + 1)):
        sel = labels == i
        if sel.any():
            ax.scatter(
                mus[sel, 0], mus[sel, 1], alpha=0.6,
                color=colors[i % len(colors)], label=names[i],
            )
    ax.legend()
    fig.tight_layout()
    return _fig_to_numpy(fig)


def plot_tsne(zs: np.ndarray, labels: np.ndarray, names=("neu", "sad", "ang", "hap")):
    """t-SNE of latents colored by emotion (inference.ipynb parity,
    README.md:128-146). Falls back to the first two dims without sklearn."""
    try:
        from sklearn.manifold import TSNE

        pts = TSNE(n_components=2, random_state=0).fit_transform(zs)
    except Exception:
        pts = zs[:, :2]
    return plot_scatter(pts, labels, names)
