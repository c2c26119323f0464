"""n_frames_per_step > 1: the decoder emits r mel frames per scan step.

The reference only plumbs r through its layer dims and declares r>1
unsupported (hparams.py:87); here it is a first-class capability (the scan
shortens to T/r steps — a large training-throughput lever).  These tests pin
the r>1 semantics: frame grouping/ungrouping, per-step gate targets and
masking, custom-BPTT/autodiff path agreement, bounded-while inference, and
a full train step that descends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.data.dataset import collate
from tacotron2_vae_tpu.models import decoder as dec
from tacotron2_vae_tpu.models import decoder_bptt as bptt
from tacotron2_vae_tpu.models import tacotron2
from tacotron2_vae_tpu.training.loss import tacotron2_vae_loss
from tacotron2_vae_tpu.training.train_state import (
    create_train_state,
    make_train_step,
)

TINY_R2 = (
    "batch_size=2,symbols_embedding_dim=32,encoder_embedding_dim=32,"
    "attention_rnn_dim=32,decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,"
    "postnet_embedding_dim=32,E=32,ref_enc_gru_size=16,z_latent_dim=4,"
    "ref_enc_filters=[2,2,4,4,8,8],attention_location_n_filters=4,"
    "encoder_n_convolutions=2,postnet_n_convolutions=3,"
    "compute_dtype='float32',anneal_function='constant',n_frames_per_step=2"
)


def _batch(hp, B=2, S=12, T=24, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32)
    mel = (rng.randn(B, hp.n_mel_channels, T) * 0.1).astype(np.float32)
    gate = np.zeros((B, T), np.float32)
    gate[:, -1] = 1.0
    return {
        "text": jnp.asarray(text),
        "input_lengths": jnp.full((B,), S, jnp.int32),
        "mel": jnp.asarray(mel),
        "gate": jnp.asarray(gate),
        "output_lengths": jnp.full((B,), T, jnp.int32),
        "emotions": jnp.asarray(
            np.eye(hp.n_emotions, dtype=np.float32)[
                rng.randint(0, hp.n_emotions, size=B)
            ]
        ),
    }


@pytest.fixture(scope="module")
def hp():
    return create_hparams(TINY_R2)


def test_group_ungroup_roundtrip():
    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(3, 5, 12).astype(np.float32))
    for r in (1, 2, 3, 4):
        g = dec.group_frames(mels, r)  # (B, T/r, r*n_mel)
        assert g.shape == (3, 12 // r, 5 * r)
        # ungroup expects time-major (Tg, B, r*n_mel)
        back = dec.ungroup_mel(jnp.swapaxes(g, 0, 1), 5, r)
        np.testing.assert_allclose(np.asarray(back), np.asarray(mels))
        # group g's step i must hold frames [i*r, (i+1)*r) in order
        np.testing.assert_allclose(
            np.asarray(g[1, 2]).reshape(r, 5),
            np.asarray(mels[1, :, 2 * r : 3 * r]).T,
        )


def test_collate_pads_to_multiple_of_r():
    rng = np.random.RandomState(0)
    items = [
        (np.arange(5, dtype=np.int32), rng.randn(4, 11).astype(np.float32),
         np.eye(1, dtype=np.float32)[0], np.eye(4, dtype=np.float32)[0]),
        (np.arange(3, dtype=np.int32), rng.randn(4, 7).astype(np.float32),
         np.eye(1, dtype=np.float32)[0], np.eye(4, dtype=np.float32)[1]),
    ]
    b = collate(items, n_frames_per_step=3)
    assert b.mel.shape[2] % 3 == 0
    assert b.mel.shape[2] >= 11
    # gate target: 1.0 from each item's last real frame on (incl. padding)
    assert b.gate[0, int(b.output_lengths[0]) - 1 :].min() == 1.0
    assert b.gate[0, : int(b.output_lengths[0]) - 1].max() == 0.0


def test_teacher_forced_shapes_and_path_agreement(hp):
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(1)
    B, S, T = 2, 9, 12
    memory = jnp.asarray(
        rng.randn(B, S, hp.encoder_embedding_dim).astype(np.float32) * 0.3
    )
    mels = jnp.asarray(rng.randn(B, hp.n_mel_channels, T).astype(np.float32))
    lengths = jnp.asarray([S, S - 2])

    hp_nd = hp.replace(p_attention_dropout=0.0, p_decoder_dropout=0.0)
    mel_a, gate_a, align_a = dec.teacher_forced(
        params, memory, mels, lengths, hp_nd, train=False,
        rng=jax.random.PRNGKey(5), dtype=None, prenet_dropout_enabled=False,
    )
    assert mel_a.shape == (B, hp.n_mel_channels, T)
    assert gate_a.shape == (B, T // 2)
    assert align_a.shape == (B, T // 2, S)

    mel_b, gate_b, align_b = bptt.teacher_forced(
        params, memory, mels, lengths, hp_nd, train=False,
        rng=jax.random.PRNGKey(5), dtype=None, prenet_dropout_enabled=False,
    )
    np.testing.assert_allclose(np.asarray(mel_b), np.asarray(mel_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_b), np.asarray(gate_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(align_b), np.asarray(align_a), atol=1e-5)


def test_bptt_grads_flow_at_r2(hp):
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(1)
    B, S, T = 2, 9, 12
    memory = jnp.asarray(
        rng.randn(B, S, hp.encoder_embedding_dim).astype(np.float32) * 0.3
    )
    mels = jnp.asarray(rng.randn(B, hp.n_mel_channels, T).astype(np.float32))
    lengths = jnp.asarray([S, S - 2])

    def loss(params):
        mel, gate, align = bptt.teacher_forced(
            params, memory, mels, lengths, hp, train=True,
            rng=jax.random.PRNGKey(7), dtype=None,
        )
        return jnp.mean((mel - mels) ** 2) + jnp.mean(gate ** 2)

    grads = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )
    assert not np.allclose(np.asarray(grads["attention_rnn"]["wi"]), 0.0)
    # the projection now maps to r*n_mel outputs
    assert params["proj"]["w"].shape[1] == 2 * hp.n_mel_channels


def test_loss_subsamples_gate_targets(hp):
    """Per-step gate loss takes the target at each group's LAST frame, so
    the stop group carries a 1 and clean groups a 0."""
    B, T, r = 2, 12, 2
    gate_target = np.zeros((B, T), np.float32)
    gate_target[:, -3:] = 1.0  # last real frame at T-3, padding after

    class Out:
        mel_outputs = jnp.zeros((B, hp.n_mel_channels, T))
        mel_outputs_postnet = jnp.zeros((B, hp.n_mel_channels, T))
        gate_outputs = jnp.zeros((B, T // r))
        mu = jnp.zeros((B, 4))
        logvar = jnp.zeros((B, 4))

    total, aux = tacotron2_vae_loss(
        Out(), jnp.zeros((B, hp.n_mel_channels, T)),
        jnp.asarray(gate_target), 0, hp,
    )
    # subsampled target = target[:, 1::2] = [0,0,0,0,1,1]: BCE of 0-logits
    expected = -np.log(0.5)
    assert abs(float(aux["gate_loss"]) - expected) < 1e-6


def test_mask_outputs_per_step_gate():
    mel = jnp.ones((1, 4, 8))
    gate = jnp.zeros((1, 4))  # r = 2
    out_len = jnp.asarray([5])
    m, mp, g = tacotron2._mask_outputs(mel, mel, gate, out_len, 4)
    # frames 5..7 zeroed
    assert float(jnp.sum(m[0, :, 5:])) == 0.0
    # steps start at frames 0,2,4,6 -> step 3 (frame 6) is fully padded
    np.testing.assert_allclose(np.asarray(g[0]), [0.0, 0.0, 0.0, 1e3])


def test_infer_emits_r_frames_per_step(hp):
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(1)
    B, S = 2, 9
    memory = jnp.asarray(
        rng.randn(B, S, hp.encoder_embedding_dim).astype(np.float32) * 0.3
    )
    mel, gate, align, lengths = dec.infer(
        params, memory, hp, rng=jax.random.PRNGKey(2), max_steps=7,
        use_pallas=False,
    )
    assert mel.shape == (B, hp.n_mel_channels, 7 * 2)
    assert gate.shape == (B, 7)
    assert align.shape == (B, 7, S)
    assert np.asarray(lengths).max() <= 14
    assert (np.asarray(lengths) % 2 == 0).all()


def test_full_train_step_descends_at_r2(hp):
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    batch = _batch(hp)
    losses = []
    for i in range(120):
        ts, metrics = step(ts, batch, jax.random.PRNGKey(1000 + i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # stochastic (prenet dropout, VAE sampling) and slower per step than r=1
    # (half as many optimizer steps per frame) but must clearly descend
    assert np.mean(losses[-5:]) < 0.75 * np.mean(losses[:5])


def test_r1_unchanged_against_r2_init_shapes():
    """r only changes prenet-input/projection dims; all recurrent params
    keep their shapes, so r is a pure data-layout knob for the scan."""
    hp1 = create_hparams(TINY_R2.replace("n_frames_per_step=2",
                                         "n_frames_per_step=1"))
    hp2 = create_hparams(TINY_R2)
    p1 = dec.init(jax.random.PRNGKey(0), hp1)
    p2 = dec.init(jax.random.PRNGKey(0), hp2)
    assert p1["attention_rnn"]["wi"].shape == p2["attention_rnn"]["wi"].shape
    assert p2["prenet"][0]["w"].shape[0] == 2 * p1["prenet"][0]["w"].shape[0]
    assert p2["proj"]["w"].shape[1] == 2 * p1["proj"]["w"].shape[1]
