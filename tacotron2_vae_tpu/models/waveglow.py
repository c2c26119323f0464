"""WaveGlow vocoder in JAX (flow-based mel -> waveform).

The reference consumes NVIDIA WaveGlow as a pickled torch model
(``synthesizer.py:79-80,163``, submodule at ``.gitmodules:1-4``); this is a
from-scratch JAX implementation of the architecture (arXiv:1811.00002):
squeeze-to-groups, 12 flows of [invertible 1x1 conv + affine coupling with a
non-causal WaveNet conditioner], early channel outputs every 4 flows, and a
ConvTranspose mel upsampler.  Both directions are provided: ``forward``
(audio -> z, used for tests/training) and ``infer`` (z -> audio, the serving
path, ``sigma=0.666`` like reference synthesizer.py:163).

Layout: channel-last (B, T, C); conv weights (k, in, out).  The torch
checkpoint converter (tools/convert_waveglow.py) folds weight norm and
transposes into this layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    # WN (WaveNet conditioner)
    n_layers: int = 8
    n_channels: int = 256
    kernel_size: int = 3
    # mel upsampler
    upsample_kernel: int = 1024
    upsample_stride: int = 256

    def audio_channels(self) -> list[int]:
        """Audio channel count entering each flow (forward direction)."""
        chans, c = [], self.n_group
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                c -= self.n_early_size
            chans.append(c)
        return chans

    @property
    def n_remaining_channels(self) -> int:
        return self.audio_channels()[-1]


def _conv_init(key, k, cin, cout, scale=0.05):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (k, cin, cout)) * scale,
        "b": jnp.zeros((cout,)),
    }


def init(key, cfg: WaveGlowConfig = WaveGlowConfig()):
    keys = jax.random.split(key, cfg.n_flows + 1)
    cond_dim = cfg.n_mel_channels * cfg.n_group
    flows = []
    for k_idx, c in enumerate(cfg.audio_channels()):
        n_half = c // 2
        fk = jax.random.split(keys[k_idx], cfg.n_layers * 2 + 4)
        # Orthogonal 1x1 mixing matrix (det != 0 guaranteed).
        w = jax.random.orthogonal(fk[0], c)
        wn = {
            "start": _conv_init(fk[1], 1, n_half, cfg.n_channels),
            # end is zero-init (identity coupling at init, standard for glow)
            "end": {
                "w": jnp.zeros((1, cfg.n_channels, 2 * n_half)),
                "b": jnp.zeros((2 * n_half,)),
            },
            "cond": _conv_init(fk[2], 1, cond_dim, 2 * cfg.n_channels * cfg.n_layers),
            "in": [],
            "res_skip": [],
        }
        for i in range(cfg.n_layers):
            wn["in"].append(
                _conv_init(fk[3 + 2 * i], cfg.kernel_size, cfg.n_channels,
                           2 * cfg.n_channels)
            )
            out_ch = 2 * cfg.n_channels if i < cfg.n_layers - 1 else cfg.n_channels
            wn["res_skip"].append(
                _conv_init(fk[4 + 2 * i], 1, cfg.n_channels, out_ch)
            )
        flows.append({"inv_conv": {"w": w}, "wn": wn})
    upsample = _conv_init(keys[-1], cfg.upsample_kernel, cfg.n_mel_channels,
                          cfg.n_mel_channels)
    return {"upsample": upsample, "flows": flows}


def _conv1d(p, x, dilation=1, dtype=None):
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    if w.shape[0] == 1:  # 1x1 conv == matmul (keeps the MXU busy)
        return jnp.dot(x, w[0], preferred_element_type=jnp.float32) + p["b"]
    pad = (w.shape[0] - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"]


def _upsample_mel(p, mel, cfg: WaveGlowConfig):
    """ConvTranspose1d(80, 80, 1024, stride 256): (B, T, 80) -> (B, T', 80).

    Implemented as einsum + overlap-add instead of an lhs-dilated conv —
    XLA computes the dilated form densely (O(T*s*k*C^2), ~1000x the useful
    FLOPs); the scatter form is one MXU einsum and k/s shifted adds.
    Parity-tested against torch ConvTranspose1d.
    """
    k, s = cfg.upsample_kernel, cfg.upsample_stride
    assert k % s == 0, "upsample kernel must be a multiple of the stride"
    B, T, _ = mel.shape
    w = p["w"]  # (k, in, out), w[dk, i, o] = torch_w[i, o, dk]
    # contribution of input frame t to output sample t*s + dk
    contrib = jnp.einsum("bti,kio->btko", mel, w,
                         preferred_element_type=jnp.float32)
    n_chunks = k // s
    c = contrib.reshape(B, T, n_chunks, s, -1)
    out = jnp.zeros((B, T + n_chunks - 1, s, c.shape[-1]), jnp.float32)
    for j in range(n_chunks):
        out = out.at[:, j : j + T].add(c[:, :, j])
    out = out.reshape(B, -1, c.shape[-1])[:, : (T - 1) * s + k]
    y = out + p["b"]
    # Trim the transposed-conv tail (NVIDIA glow.py trims kernel - stride).
    return y[:, : y.shape[1] - (k - s)]


def _squeeze_mel(mel_up, cfg: WaveGlowConfig):
    """(B, T*group, n_mel) -> (B, T, n_mel*group) matching torch's
    unfold(2, n_group, n_group) + permute ordering: for output channel
    (m, g) the value is mel_up[t*group + g, m], flattened mel-major."""
    B, T_up, M = mel_up.shape
    T = T_up // cfg.n_group
    x = mel_up[:, : T * cfg.n_group].reshape(B, T, cfg.n_group, M)
    return jnp.swapaxes(x, 2, 3).reshape(B, T, M * cfg.n_group)


def _squeeze_audio(audio, cfg: WaveGlowConfig):
    """(B, samples) -> (B, T, n_group)."""
    B, n = audio.shape
    T = n // cfg.n_group
    return audio[:, : T * cfg.n_group].reshape(B, T, cfg.n_group)


def _unsqueeze_audio(audio):
    B, T, C = audio.shape
    return audio.reshape(B, T * C)


def _wn(wn, audio_0, cond, cfg: WaveGlowConfig, dtype=None):
    """Non-causal WaveNet conditioner -> (b, log_s)."""
    x = _conv1d(wn["start"], audio_0, dtype=dtype)
    cond_all = _conv1d(wn["cond"], cond, dtype=dtype)  # (B, T, 2*ch*n_layers)
    output = jnp.zeros_like(x)
    nc = cfg.n_channels
    for i in range(cfg.n_layers):
        a = _conv1d(wn["in"][i], x, dilation=2 ** i, dtype=dtype)
        c = jax.lax.dynamic_slice_in_dim(cond_all, i * 2 * nc, 2 * nc, axis=2)
        acts = jnp.tanh(a[..., :nc] + c[..., :nc]) * jax.nn.sigmoid(
            a[..., nc:] + c[..., nc:]
        )
        rs = _conv1d(wn["res_skip"][i], acts, dtype=dtype)
        if i < cfg.n_layers - 1:
            x = x + rs[..., :nc]
            output = output + rs[..., nc:]
        else:
            output = output + rs
    out = _conv1d(wn["end"], output, dtype=dtype)
    n_half = out.shape[-1] // 2
    return out[..., :n_half], out[..., n_half:]  # (b, log_s)


def forward(params, audio, mel, cfg: WaveGlowConfig = WaveGlowConfig()):
    """Training direction: (audio (B, samples), mel (B, n_mel, T_mel)) ->
    (z (B, T, n_group), log_s_list, log_det_w_list)."""
    mel_up = _upsample_mel(params["upsample"], jnp.swapaxes(mel, 1, 2), cfg)
    x = _squeeze_audio(audio, cfg)
    cond = _squeeze_mel(mel_up[:, : x.shape[1] * cfg.n_group], cfg)
    cond = cond[:, : x.shape[1]]

    out_z, log_s_all, log_det_all = [], [], []
    for k, flow in enumerate(params["flows"]):
        if k % cfg.n_early_every == 0 and k > 0:
            out_z.append(x[..., : cfg.n_early_size])
            x = x[..., cfg.n_early_size :]
        # invertible 1x1
        w = flow["inv_conv"]["w"]
        x = jnp.einsum("btc,cd->btd", x, w)
        # NVIDIA glow.py Invertible1x1Conv.forward: log_det_W =
        # batch_size * n_of_groups * logdet(W) — the Jacobian term counts
        # once per (batch item, time position)
        log_det_all.append(
            x.shape[0] * x.shape[1] * jnp.linalg.slogdet(w)[1] * jnp.ones(())
        )
        # affine coupling
        n_half = x.shape[-1] // 2
        x0, x1 = x[..., :n_half], x[..., n_half:]
        b, log_s = _wn(flow["wn"], x0, cond, cfg)
        x1 = x1 * jnp.exp(log_s) + b
        log_s_all.append(log_s)
        x = jnp.concatenate([x0, x1], axis=-1)
    out_z.append(x)
    z = jnp.concatenate(out_z, axis=-1)
    return z, log_s_all, log_det_all


@partial(jax.jit, static_argnums=(3, 4))
def _inverse_impl(params, z, cond, cfg: WaveGlowConfig, dtype_name=None):
    """Deterministic inverse flow: z (B, T, n_group) -> audio (B, T, n_group).

    z channel layout matches ``forward``'s output: early outputs in emission
    order, then the final remaining channels.
    """
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    chans = cfg.audio_channels()
    # Split z into [early_1, early_2, ..., final] parts.
    sizes = [cfg.n_early_size
             for k in range(cfg.n_flows)
             if k % cfg.n_early_every == 0 and k > 0]
    sizes.append(cfg.n_remaining_channels)
    parts, off = [], 0
    for s in sizes:
        parts.append(z[..., off : off + s])
        off += s
    x = parts.pop()  # final

    for k in reversed(range(cfg.n_flows)):
        flow = params["flows"][k]
        n_half = chans[k] // 2
        x0, x1 = x[..., :n_half], x[..., n_half:]
        b, log_s = _wn(flow["wn"], x0, cond, cfg, dtype=dtype)
        x1 = (x1 - b) * jnp.exp(-log_s)
        x = jnp.concatenate([x0, x1], axis=-1)
        w_inv = jnp.linalg.inv(flow["inv_conv"]["w"])
        x = jnp.einsum("btc,cd->btd", x, w_inv)
        if k % cfg.n_early_every == 0 and k > 0:
            x = jnp.concatenate([parts.pop(), x], axis=-1)
    return x


def _cond_from_mel(params, mel, cfg: WaveGlowConfig):
    mel_up = _upsample_mel(params["upsample"], jnp.swapaxes(mel, 1, 2), cfg)
    return _squeeze_mel(mel_up, cfg)


def inverse(params, z, mel, cfg: WaveGlowConfig = WaveGlowConfig()):
    """Deterministic z -> audio (for tests and importance sampling)."""
    cond = _cond_from_mel(params, mel, cfg)
    T = min(cond.shape[1], z.shape[1])
    return _unsqueeze_audio(_inverse_impl(params, z[:, :T], cond[:, :T], cfg))


@partial(jax.jit, static_argnums=(2, 5))
def _infer_impl(params, mel, cfg, sigma, key, dtype_name):
    cond = _cond_from_mel(params, mel, cfg)
    B, T, _ = cond.shape
    z = sigma * jax.random.normal(key, (B, T, cfg.n_group))
    return _unsqueeze_audio(_inverse_impl(params, z, cond, cfg, dtype_name))


def infer(params, mel, cfg: WaveGlowConfig = WaveGlowConfig(),
          sigma: float = 0.666, key=None, dtype_name: str | None = None):
    """Serving direction: mel (B, n_mel, T_mel) -> waveform (B, samples).

    Fully jitted (upsampler + inverse flows). dtype_name optionally selects
    the WaveNet-conv compute dtype (fp32 default).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    return _infer_impl(params, mel, cfg, jnp.asarray(sigma, jnp.float32),
                       key, dtype_name)


def waveglow_loss(z, log_s_list, log_det_w_list, sigma: float = 1.0):
    """Flow negative log-likelihood (NVIDIA WaveGlowLoss semantics:
    sum(z^2)/(2 sigma^2) - sum(log_s) - sum(log_det_W), normalized by
    z.size).  The reference repo never trains its vocoder (it loads a
    pickled pretrained model, synthesizer.py:79-80); this makes the vocoder
    trainable inside the framework — see tools/train_waveglow.py.
    """
    loss = jnp.sum(z * z) / (2.0 * sigma * sigma)
    for log_s in log_s_list:
        loss = loss - jnp.sum(log_s)
    for log_det in log_det_w_list:
        loss = loss - log_det
    return loss / z.size


def make_waveglow_train_step(cfg: WaveGlowConfig, optimizer,
                             sigma: float = 1.0):
    """(opt_state, params, audio, mel) -> (opt_state, params, loss) train
    step for the flow NLL; jit at the call site."""

    import optax

    def step(opt_state, params, audio, mel):
        def loss_fn(p):
            z, log_s, log_det = forward(p, audio, mel, cfg)
            return waveglow_loss(z, log_s, log_det, sigma)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Flow NLLs blow up on rare segments (log_s spikes through exp);
        # one poisoned update NaNs the weights permanently — skip the whole
        # update when loss or grads go non-finite (same guard as the
        # Tacotron2 step, train_state.py; observed for real at ~29k steps
        # of the round-4 vocoder run).
        ok = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        return new_opt_state, new_params, loss

    return step
