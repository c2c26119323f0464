"""WaveGlow converter tests: weight-norm folding and WN-layer parity against
a torch reconstruction of the NVIDIA glow.py structure."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from convert_torch_ckpt import _fold_weight_norm, convert_waveglow

from tacotron2_vae_tpu.models import waveglow as wg


def _build_torch_waveglow_sd(cfg, seed=0):
    """state_dict with NVIDIA glow.py names + weight_norm g/v split."""
    torch.manual_seed(seed)
    sd = {}
    up = nn.ConvTranspose1d(cfg.n_mel_channels, cfg.n_mel_channels,
                            cfg.upsample_kernel, stride=cfg.upsample_stride)
    sd["upsample.weight"] = up.weight.detach()
    sd["upsample.bias"] = up.bias.detach()
    cond_dim = cfg.n_mel_channels * cfg.n_group
    for k, chans in enumerate(cfg.audio_channels()):
        n_half = chans // 2
        conv = nn.Conv1d(chans, chans, 1)
        sd[f"convinv.{k}.conv.weight"] = conv.weight.detach()
        start = nn.utils.weight_norm(nn.Conv1d(n_half, cfg.n_channels, 1))
        sd[f"WN.{k}.start.weight_g"] = start.weight_g.detach()
        sd[f"WN.{k}.start.weight_v"] = start.weight_v.detach()
        sd[f"WN.{k}.start.bias"] = start.bias.detach()
        end = nn.Conv1d(cfg.n_channels, 2 * n_half, 1)
        sd[f"WN.{k}.end.weight"] = end.weight.detach()
        sd[f"WN.{k}.end.bias"] = end.bias.detach()
        cond = nn.utils.weight_norm(
            nn.Conv1d(cond_dim, 2 * cfg.n_channels * cfg.n_layers, 1))
        sd[f"WN.{k}.cond_layer.weight_g"] = cond.weight_g.detach()
        sd[f"WN.{k}.cond_layer.weight_v"] = cond.weight_v.detach()
        sd[f"WN.{k}.cond_layer.bias"] = cond.bias.detach()
        for i in range(cfg.n_layers):
            inl = nn.utils.weight_norm(
                nn.Conv1d(cfg.n_channels, 2 * cfg.n_channels,
                          cfg.kernel_size, dilation=2 ** i,
                          padding=(cfg.kernel_size - 1) * 2 ** i // 2))
            sd[f"WN.{k}.in_layers.{i}.weight_g"] = inl.weight_g.detach()
            sd[f"WN.{k}.in_layers.{i}.weight_v"] = inl.weight_v.detach()
            sd[f"WN.{k}.in_layers.{i}.bias"] = inl.bias.detach()
            out_ch = (2 * cfg.n_channels if i < cfg.n_layers - 1
                      else cfg.n_channels)
            rs = nn.utils.weight_norm(nn.Conv1d(cfg.n_channels, out_ch, 1))
            sd[f"WN.{k}.res_skip_layers.{i}.weight_g"] = rs.weight_g.detach()
            sd[f"WN.{k}.res_skip_layers.{i}.weight_v"] = rs.weight_v.detach()
            sd[f"WN.{k}.res_skip_layers.{i}.bias"] = rs.bias.detach()
    return sd


CFG = wg.WaveGlowConfig(n_flows=2, n_group=8, n_early_every=4, n_early_size=2,
                        n_layers=2, n_channels=16, upsample_kernel=64,
                        upsample_stride=16)


def test_weight_norm_folding_matches_torch():
    conv = nn.utils.weight_norm(nn.Conv1d(4, 8, 3))
    sd = {"c.weight_g": conv.weight_g.detach().numpy(),
          "c.weight_v": conv.weight_v.detach().numpy(),
          "c.bias": conv.bias.detach().numpy()}
    folded = _fold_weight_norm(sd)
    np.testing.assert_allclose(
        folded["c.weight"], conv.weight.detach().numpy(), atol=1e-6
    )


def test_wn_layer_parity_after_conversion():
    """Converted WN conditioner matches a torch reimplementation of the
    NVIDIA fused-gate WaveNet layer stack."""
    sd = _build_torch_waveglow_sd(CFG)
    params = convert_waveglow({k: v.numpy() for k, v in sd.items()}, CFG)

    rng = np.random.RandomState(0)
    T = 24
    n_half = CFG.audio_channels()[0] // 2
    audio0 = rng.randn(1, T, n_half).astype(np.float32)
    cond = rng.randn(1, T, CFG.n_mel_channels * CFG.n_group).astype(np.float32)

    b_j, logs_j = wg._wn(params["flows"][0]["wn"], jnp.asarray(audio0),
                         jnp.asarray(cond), CFG)

    # torch reference of glow.py WN.forward
    folded = _fold_weight_norm({k: v.numpy() for k, v in sd.items()})
    def conv1d_t(x, w, b, dilation=1):
        pad = (w.shape[2] - 1) * dilation // 2
        return torch.nn.functional.conv1d(
            x, torch.from_numpy(w.copy()), torch.from_numpy(b.copy()),
            dilation=dilation, padding=pad)
    x = torch.from_numpy(audio0.transpose(0, 2, 1))
    c = torch.from_numpy(cond.transpose(0, 2, 1))
    x = conv1d_t(x, folded["WN.0.start.weight"], folded["WN.0.start.bias"])
    call = conv1d_t(c, folded["WN.0.cond_layer.weight"],
                    folded["WN.0.cond_layer.bias"])
    nc = CFG.n_channels
    out = torch.zeros_like(x)
    for i in range(CFG.n_layers):
        a = conv1d_t(x, folded[f"WN.0.in_layers.{i}.weight"],
                     folded[f"WN.0.in_layers.{i}.bias"], dilation=2 ** i)
        co = call[:, i * 2 * nc:(i + 1) * 2 * nc]
        acts = torch.tanh(a[:, :nc] + co[:, :nc]) * torch.sigmoid(
            a[:, nc:] + co[:, nc:])
        rs = conv1d_t(acts, folded[f"WN.0.res_skip_layers.{i}.weight"],
                      folded[f"WN.0.res_skip_layers.{i}.bias"])
        if i < CFG.n_layers - 1:
            x = x + rs[:, :nc]
            out = out + rs[:, nc:]
        else:
            out = out + rs
    final = conv1d_t(out, folded["WN.0.end.weight"], folded["WN.0.end.bias"])
    b_t = final[:, :n_half].numpy().transpose(0, 2, 1)
    logs_t = final[:, n_half:].numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(np.asarray(b_j), b_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logs_j), logs_t, atol=1e-4)


def test_full_converted_model_infers():
    sd = _build_torch_waveglow_sd(CFG)
    params = convert_waveglow({k: v.numpy() for k, v in sd.items()}, CFG)
    mel = jnp.asarray(np.random.RandomState(1).randn(1, 80, 16)
                      .astype(np.float32))
    wav = wg.infer(params, mel, CFG, sigma=0.666)
    assert np.isfinite(np.asarray(wav)).all()
    assert wav.shape[1] > 0


@pytest.mark.slow
def test_production_config_convert_and_infer():
    """The REAL WaveGlow shape (12 flows, 256 channels, 8 WN layers,
    1024/256 upsampler — NVIDIA waveglow_256channels): converter handles
    every early-output split and inference stays finite end-to-end."""
    cfg = wg.WaveGlowConfig()  # production defaults
    sd = _build_torch_waveglow_sd(cfg, seed=2)
    params = convert_waveglow({k: v.numpy() for k, v in sd.items()}, cfg)
    assert len(params["flows"]) == cfg.n_flows
    # channel bookkeeping across n_early_every splits
    chans = cfg.audio_channels()
    assert chans[0] == cfg.n_group and len(chans) == cfg.n_flows
    mel = jnp.asarray(np.random.RandomState(3).randn(1, 80, 6)
                      .astype(np.float32) * 0.3)
    wav = wg.infer(params, mel, cfg, sigma=0.666)
    assert np.isfinite(np.asarray(wav)).all()
    assert wav.shape[1] == 6 * cfg.upsample_stride
