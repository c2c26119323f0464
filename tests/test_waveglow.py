"""WaveGlow tests: flow invertibility (forward o inverse == identity),
upsampler parity with torch ConvTranspose1d, shape/latency sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.models import waveglow as wg

CFG = wg.WaveGlowConfig(
    n_mel_channels=80, n_flows=6, n_group=8, n_early_every=2, n_early_size=2,
    n_layers=2, n_channels=16, upsample_kernel=1024, upsample_stride=256,
)


@pytest.fixture(scope="module")
def params():
    return wg.init(jax.random.PRNGKey(0), CFG)


def test_channel_schedule():
    assert CFG.audio_channels() == [8, 8, 6, 6, 4, 4]
    assert CFG.n_remaining_channels == 4
    full = wg.WaveGlowConfig()
    assert full.audio_channels() == [8] * 4 + [6] * 4 + [4] * 4
    assert full.n_remaining_channels == 4


def test_forward_inverse_roundtrip(params):
    rng = np.random.RandomState(0)
    B, n_mel_frames = 1, 17
    samples = n_mel_frames * 256
    audio = rng.randn(B, samples).astype(np.float32) * 0.1
    mel = rng.randn(B, 80, n_mel_frames).astype(np.float32)

    z, log_s_list, log_det_list = wg.forward(params, jnp.asarray(audio),
                                             jnp.asarray(mel), CFG)
    assert z.shape[-1] == 8
    recon = wg.inverse(params, z, jnp.asarray(mel), CFG)
    T = min(recon.shape[1], samples)
    np.testing.assert_allclose(
        np.asarray(recon)[0, :T], audio[0, :T], atol=2e-3, rtol=1e-2
    )


def test_infer_shapes_and_finite(params):
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 80, 23).astype(np.float32))
    audio = wg.infer(params, mel, CFG, sigma=0.666, key=jax.random.PRNGKey(1))
    assert audio.shape[0] == 2
    # ~ mel_frames * hop samples
    assert abs(audio.shape[1] - 23 * 256) <= CFG.n_group * 8
    assert np.isfinite(np.asarray(audio)).all()


def test_upsample_matches_torch_conv_transpose(params):
    torch = pytest.importorskip("torch")
    ct = torch.nn.ConvTranspose1d(80, 80, 1024, stride=256)
    w_t = ct.weight.detach().numpy()  # (in, out, k)
    b_t = ct.bias.detach().numpy()
    p = {"w": jnp.asarray(np.transpose(w_t, (2, 0, 1))), "b": jnp.asarray(b_t)}

    x = np.random.RandomState(0).randn(1, 80, 9).astype(np.float32)
    out_t = ct(torch.from_numpy(x)).detach().numpy()  # (1, 80, (9-1)*256+1024)
    # NVIDIA trims kernel - stride from the tail.
    out_t = out_t[:, :, : out_t.shape[2] - (1024 - 256)]

    out_j = wg._upsample_mel(p, jnp.asarray(np.transpose(x, (0, 2, 1))), CFG)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j), (0, 2, 1)), out_t, atol=1e-4
    )


def test_log_det_terms(params):
    rng = np.random.RandomState(1)
    audio = rng.randn(1, 8 * 16).astype(np.float32)
    mel = rng.randn(1, 80, 16).astype(np.float32)
    _, log_s_list, log_det_list = wg.forward(
        params, jnp.asarray(audio), jnp.asarray(mel), CFG
    )
    assert len(log_s_list) == CFG.n_flows
    assert len(log_det_list) == CFG.n_flows
    assert all(np.isfinite(float(d)) for d in log_det_list)


def test_waveglow_loss_and_training_descends(params):
    """Flow-NLL training (the reference never trains its vocoder — it loads
    a pickled pretrained model, synthesizer.py:79-80): a few Adam steps on
    one batch must reduce the NLL, and the loss must be finite/grad-clean."""
    import optax

    rng = np.random.RandomState(0)
    B, n_mel_frames = 2, 9
    samples = n_mel_frames * 256
    audio = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1)
    mel = jnp.asarray(rng.randn(B, 80, n_mel_frames).astype(np.float32))

    opt = optax.adam(1e-3)
    p = wg.init(jax.random.PRNGKey(1), CFG)
    step = jax.jit(wg.make_waveglow_train_step(CFG, opt))
    opt_state = opt.init(p)
    losses = []
    for _ in range(30):
        opt_state, p, loss = step(opt_state, p, audio, mel)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses[::10]


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_waveglow_mesh_training_parity(params, mesh_shape):
    """dp and dp+tp mesh train steps must match the single-device step:
    same loss trace and same updated params after 2 steps (the reference
    never trains its vocoder at all; this framework trains it on a mesh)."""
    import optax

    from tacotron2_vae_tpu.parallel import (
        make_mesh,
        make_waveglow_parallel_train_step,
        shard_waveglow_state,
    )

    data, model = mesh_shape
    opt = optax.adam(1e-4)
    rng = np.random.RandomState(0)
    B, n_mel_frames = 8, 9
    samples = n_mel_frames * 256
    audio = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 0.1)
    mel = jnp.asarray(rng.randn(B, 80, n_mel_frames).astype(np.float32))

    # single-device trajectory
    step1 = jax.jit(wg.make_waveglow_train_step(CFG, opt, 1.0))
    p1, o1 = params, opt.init(params)
    for _ in range(2):
        o1, p1, l1 = step1(o1, p1, audio, mel)

    # mesh trajectory (donated args: re-init fresh trees)
    mesh = make_mesh(devices=jax.devices()[: data * model],
                     data=data, model=model)
    pm, om = shard_waveglow_state(
        wg.init(jax.random.PRNGKey(0), CFG), opt.init(params), mesh
    )
    step_m = make_waveglow_parallel_train_step(CFG, opt, mesh, 1.0)
    for _ in range(2):
        om, pm, lm = step_m(om, pm, audio, mel)

    np.testing.assert_allclose(float(l1), float(lm), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flatm = jax.tree_util.tree_leaves(pm)
    assert len(flat1) == len(flatm)
    for a, b in zip(flat1, flatm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=2e-5)


def test_train_cli_export_only_roundtrip(tmp_path):
    """tools/train_waveglow.py: a short train run, then the export-only
    invocation (--resume <ckpt> --steps 0 --export) must write a serving
    pickle whose params match the checkpoint — the path that turns the
    BEST held-out-NLL checkpoint (not the last one) into the served
    artifact (TRAINING_SMOKE.md round-5 provenance section)."""
    import os
    import pickle
    import subprocess
    import sys

    from tacotron2_vae_tpu.dsp.audio import save_wav

    rng = np.random.RandomState(0)
    flist = tmp_path / "train.txt"
    lines = []
    for i in range(2):
        p = tmp_path / f"w{i}.wav"
        save_wav(str(p), (0.1 * rng.randn(4000)).astype(np.float32), 16000)
        lines.append(f"{p}|x|0|0")
    flist.write_text("\n".join(lines) + "\n")

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiny = ["--n_flows", "2", "--n_channels", "8", "--n_layers", "1",
            "--segment", "2048", "--batch", "1",
            "--filelist", str(flist)]
    r1 = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train_waveglow.py"),
         "--output_dir", str(tmp_path / "wg"), "--steps", "2",
         "--checkpoint_every", "2",
         "--export", str(tmp_path / "last.pkl"), *tiny],
        capture_output=True, text=True, env=env, timeout=600)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    ckpt = str(tmp_path / "wg" / "waveglow_2")
    assert os.path.isdir(ckpt)

    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train_waveglow.py"),
         "--output_dir", str(tmp_path / "wg2"), "--steps", "0",
         "--resume", ckpt,
         "--export", str(tmp_path / "only.pkl"), *tiny],
        capture_output=True, text=True, env=env, timeout=600)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "exported only" in r2.stdout

    with open(tmp_path / "last.pkl", "rb") as f:
        a = pickle.load(f)
    with open(tmp_path / "only.pkl", "rb") as f:
        b = pickle.load(f)
    assert a["config"] == b["config"]
    fa = jax.tree_util.tree_leaves(a["waveglow"])
    fb = jax.tree_util.tree_leaves(b["waveglow"])
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
