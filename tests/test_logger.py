"""TensorBoard logger writes the reference's scalar/image set."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.models.tacotron2 import Tacotron2Output


def test_logger_writes_events(tmp_path):
    pytest.importorskip("tensorboardX")
    from tacotron2_vae_tpu.training.logger import Tacotron2Logger

    logdir = str(tmp_path / "tb")
    logger = Tacotron2Logger(logdir)
    logger.log_training(
        reduced_loss=0.5, grad_norm=1.2, learning_rate=1e-3, duration=0.1,
        kl_div=30.0, kl_weight=0.01, recon_loss=0.45, iteration=10,
    )

    B, T, S, Z = 2, 12, 7, 4
    rng = np.random.RandomState(0)
    out = Tacotron2Output(
        mel_outputs=jnp.asarray(rng.randn(B, 80, T)),
        mel_outputs_postnet=jnp.asarray(rng.randn(B, 80, T)),
        gate_outputs=jnp.asarray(rng.randn(B, T)),
        alignments=jnp.asarray(np.abs(rng.rand(B, T, S))),
        mu=jnp.asarray(rng.randn(B, Z)),
        logvar=jnp.asarray(rng.randn(B, Z)),
        z=jnp.asarray(rng.randn(B, Z)),
        emotions=jnp.asarray(np.eye(4)[:B]),
    )
    params = {"layer": {"w": jnp.ones((3, 3))}}
    targets = (jnp.asarray(rng.randn(B, 80, T)), jnp.zeros((B, T)))
    logger.log_validation(0.4, params, out, targets, iteration=10)
    logger.close()

    files = os.listdir(logdir)
    assert any("tfevents" in f for f in files)
    total = sum(os.path.getsize(os.path.join(logdir, f)) for f in files)
    assert total > 10_000  # images + histograms actually serialized
