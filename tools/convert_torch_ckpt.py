#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to this framework's param pytrees.

Two converters:
  * Tacotron2-VAE: ``torch.load(ckpt)['state_dict']`` (reference
    train.py:113-119 format) -> params dict for models/tacotron2.py.
  * WaveGlow: NVIDIA pickled-model checkpoints -> params dict for
    models/waveglow.py, with weight-norm folded.

Usage:
    python tools/convert_torch_ckpt.py tacotron2 checkpoint_250000 out.npz
    python tools/convert_torch_ckpt.py waveglow waveglow_256ch.pt out.npz

Layout conventions (see ops/layers.py): torch Linear (out, in) -> (in, out);
torch Conv1d (out, in, k) -> (k, in, out); torch Conv2d (out, in, kh, kw) ->
(kh, kw, in, out); LSTM/GRU packed weights -> transposed.

IMPORTANT — converted Tacotron2-VAE checkpoints need
``ref_enc_raw_reshape=True``: the reference trains its VAE reference
encoder on a raw-memory reshape of the mel (modules.py:67 scrambles
channel/time), while this framework defaults to the corrected transpose
layout.  Without the flag a converted checkpoint's style/prosody branch
emits different embeddings than the original model.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _lin(sd, name):
    p = {"w": sd[f"{name}.weight"].T.copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def _conv1d(sd, name):
    p = {"w": np.transpose(sd[f"{name}.weight"], (2, 1, 0)).copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def _conv2d(sd, name):
    p = {"w": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)).copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def _bn(sd, name):
    return (
        {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()},
        {"mean": sd[f"{name}.running_mean"].copy(),
         "var": sd[f"{name}.running_var"].copy()},
    )


def _lstm_cell(sd, name):
    return {
        "wi": sd[f"{name}.weight_ih"].T.copy(),
        "wh": sd[f"{name}.weight_hh"].T.copy(),
        "bi": sd[f"{name}.bias_ih"].copy(),
        "bh": sd[f"{name}.bias_hh"].copy(),
    }


def _lstm_dir(sd, name, suffix=""):
    return {
        "wi": sd[f"{name}.weight_ih_l0{suffix}"].T.copy(),
        "wh": sd[f"{name}.weight_hh_l0{suffix}"].T.copy(),
        "bi": sd[f"{name}.bias_ih_l0{suffix}"].copy(),
        "bh": sd[f"{name}.bias_hh_l0{suffix}"].copy(),
    }


def convert_tacotron2(state_dict: dict, hp=None):
    """torch state_dict (reference model.py names) -> (params, model_state)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    enc_convs, enc_bns, enc_bn_state = [], [], []
    i = 0
    while f"encoder.convolutions.{i}.0.conv.weight" in sd:
        enc_convs.append(_conv1d(sd, f"encoder.convolutions.{i}.0.conv"))
        bn_p, bn_s = _bn(sd, f"encoder.convolutions.{i}.1")
        enc_bns.append(bn_p)
        enc_bn_state.append(bn_s)
        i += 1

    post_convs, post_bns, post_bn_state = [], [], []
    i = 0
    while f"postnet.convolutions.{i}.0.conv.weight" in sd:
        post_convs.append(_conv1d(sd, f"postnet.convolutions.{i}.0.conv"))
        bn_p, bn_s = _bn(sd, f"postnet.convolutions.{i}.1")
        post_bns.append(bn_p)
        post_bn_state.append(bn_s)
        i += 1

    ref_convs, ref_bns, ref_bn_state = [], [], []
    i = 0
    while (
        f"vae_gst.ref_encoder.convs.{i}.weight" in sd
        or f"vae_gst.ref_encoder.convs.{i}.conv.weight" in sd
    ):
        # conv 0 is CoordConv2d (wraps .conv); the rest are plain Conv2d
        name = (
            f"vae_gst.ref_encoder.convs.{i}.conv"
            if f"vae_gst.ref_encoder.convs.{i}.conv.weight" in sd
            else f"vae_gst.ref_encoder.convs.{i}"
        )
        ref_convs.append(_conv2d(sd, name))
        bn_p, bn_s = _bn(sd, f"vae_gst.ref_encoder.bns.{i}")
        ref_bns.append(bn_p)
        ref_bn_state.append(bn_s)
        i += 1

    params = {
        "embedding": {"table": sd["transcript_embedding.weight"].copy()},
        "speaker_embedding": _lin(sd, "speaker_embedding.linear_layer"),
        "emotion_embedding": _lin(sd, "emotion_embedding.linear_layer"),
        "encoder": {
            "convs": enc_convs,
            "bns": enc_bns,
            "lstm": {
                "fwd": _lstm_dir(sd, "encoder.lstm"),
                "bwd": _lstm_dir(sd, "encoder.lstm", "_reverse"),
            },
        },
        "decoder": {
            "prenet": [
                _lin(sd, "decoder.prenet.layers.0.linear_layer"),
                _lin(sd, "decoder.prenet.layers.1.linear_layer"),
            ],
            "attention_rnn": _lstm_cell(sd, "decoder.attention_rnn"),
            "attention": {
                "query": _lin(sd, "decoder.attention_layer.query_layer.linear_layer"),
                "memory": _lin(sd, "decoder.attention_layer.memory_layer.linear_layer"),
                "v": _lin(sd, "decoder.attention_layer.v.linear_layer"),
                "loc_conv": _conv1d(
                    sd, "decoder.attention_layer.location_layer.location_conv.conv"
                ),
                "loc_dense": _lin(
                    sd, "decoder.attention_layer.location_layer.location_dense.linear_layer"
                ),
            },
            "decoder_rnn": _lstm_cell(sd, "decoder.decoder_rnn"),
            "proj": _lin(sd, "decoder.linear_projection.linear_layer"),
            "gate": _lin(sd, "decoder.gate_layer.linear_layer"),
        },
        "postnet": {"convs": post_convs, "bns": post_bns},
        "vae_gst": {
            "convs": ref_convs,
            "bns": ref_bns,
            "gru": {
                "wi": sd["vae_gst.ref_encoder.gru.weight_ih_l0"].T.copy(),
                "wh": sd["vae_gst.ref_encoder.gru.weight_hh_l0"].T.copy(),
                "bi": sd["vae_gst.ref_encoder.gru.bias_ih_l0"].copy(),
                "bh": sd["vae_gst.ref_encoder.gru.bias_hh_l0"].copy(),
            },
            "fc1": _lin(sd, "vae_gst.fc1"),
            "fc2": _lin(sd, "vae_gst.fc2"),
            "fc3": _lin(sd, "vae_gst.fc3"),
        },
    }
    model_state = {
        "encoder": {"bns": enc_bn_state},
        "postnet": {"bns": post_bn_state},
        "vae_gst": {"bns": ref_bn_state},
    }
    return params, model_state


# --- WaveGlow --------------------------------------------------------------------


def _fold_weight_norm(sd: dict) -> dict:
    """Fold weight_g/weight_v pairs into plain weights."""
    out = {}
    for k in list(sd):
        if k.endswith("weight_g"):
            base = k[: -len("weight_g")]
            g = np.asarray(sd[k])
            v = np.asarray(sd[base + "weight_v"])
            norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                        keepdims=True))
            out[base + "weight"] = g * v / norm
        elif k.endswith("weight_v"):
            continue
        else:
            out[k] = np.asarray(sd[k])
    return out


def _load_waveglow_state_dict(path: str) -> dict:
    """Load an NVIDIA WaveGlow checkpoint.

    Handles both plain state_dicts and full pickled models: torch pickles
    modules by reference, so stub classes are enough to unpickle (__init__
    is never called during unpickling).
    """
    import torch

    glow_stub = types.ModuleType("glow")

    class _Stub(torch.nn.Module):
        pass

    for cls in ("WaveGlow", "WN", "Invertible1x1Conv", "WaveGlowLoss"):
        setattr(glow_stub, cls, type(cls, (_Stub,), {}))
    sys.modules.setdefault("glow", glow_stub)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        model = blob["model"]
        sd = model.state_dict() if hasattr(model, "state_dict") else model
    elif isinstance(blob, dict) and "state_dict" in blob:
        sd = blob["state_dict"]
    elif hasattr(blob, "state_dict"):
        sd = blob.state_dict()
    else:
        sd = blob
    return {k: np.asarray(v.float()) for k, v in sd.items()}


def convert_waveglow(path_or_sd, cfg=None):
    """NVIDIA WaveGlow checkpoint -> params for models/waveglow.py."""
    from tacotron2_vae_tpu.models.waveglow import WaveGlowConfig

    cfg = cfg or WaveGlowConfig()
    sd = (
        _load_waveglow_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else {k: np.asarray(v) for k, v in path_or_sd.items()}
    )
    sd = _fold_weight_norm(sd)

    params = {
        "upsample": {
            # ConvTranspose1d weight (in, out, k) -> (k, in, out)
            "w": np.transpose(sd["upsample.weight"], (2, 0, 1)).copy(),
            "b": sd["upsample.bias"].copy(),
        },
        "flows": [],
    }
    for k in range(cfg.n_flows):
        wn = {
            "start": _conv1d(sd, f"WN.{k}.start"),
            "end": _conv1d(sd, f"WN.{k}.end"),
            "cond": _conv1d(sd, f"WN.{k}.cond_layer"),
            "in": [
                _conv1d(sd, f"WN.{k}.in_layers.{i}")
                for i in range(cfg.n_layers)
            ],
            "res_skip": [
                _conv1d(sd, f"WN.{k}.res_skip_layers.{i}")
                for i in range(cfg.n_layers)
            ],
        }
        # Invertible1x1Conv stores weight (c, c, 1); einsum layout needs W^T
        # (we compute x @ W == conv1x1 with kernel W^T).
        w = sd[f"convinv.{k}.conv.weight"][:, :, 0]
        params["flows"].append({"inv_conv": {"w": w.T.copy()}, "wn": wn})
    return params


def main():
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    import pickle

    if kind == "tacotron2":
        import torch

        blob = torch.load(src, map_location="cpu", weights_only=False)
        sd = blob.get("state_dict", blob)
        params, model_state = convert_tacotron2(sd)
        with open(dst, "wb") as f:
            pickle.dump({"params": params, "model_state": model_state,
                         "iteration": int(blob.get("iteration", 0))}, f)
    elif kind == "waveglow":
        params = convert_waveglow(src)
        with open(dst, "wb") as f:
            pickle.dump({"waveglow": params}, f)
    else:
        raise SystemExit(f"unknown kind {kind}")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
