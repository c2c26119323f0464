"""Serving tests: Synthesizer end-to-end (text -> wav), centroid caching,
style paths, and the HTTP demo/API routes."""

import json
import os
import pickle
import threading
import urllib.request

import jax
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.dsp.audio import load_wav, save_wav
from tacotron2_vae_tpu.models import tacotron2
from tacotron2_vae_tpu.models import waveglow as wg

TINY = (
    "batch_size=2,symbols_embedding_dim=32,encoder_embedding_dim=32,"
    "attention_rnn_dim=32,decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,"
    "postnet_embedding_dim=32,E=32,ref_enc_gru_size=16,z_latent_dim=4,"
    "ref_enc_filters=[2,2,4,4,8,8],attention_location_n_filters=4,"
    "encoder_n_convolutions=2,postnet_n_convolutions=3,"
    "compute_dtype='float32',max_decoder_steps=40"
)

WG_CFG = wg.WaveGlowConfig(
    n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    n_layers=2, n_channels=8,
)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    hp = create_hparams(TINY)
    params, state = tacotron2.init(jax.random.PRNGKey(0), hp)
    ckpt = os.path.join(str(d), "model.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(
            {
                "params": jax.device_get(params),
                "model_state": jax.device_get(state),
            },
            f,
        )
    wg_params = wg.init(jax.random.PRNGKey(1), WG_CFG)
    wg_path = os.path.join(str(d), "waveglow.pkl")
    with open(wg_path, "wb") as f:
        pickle.dump({"waveglow": jax.device_get(wg_params)}, f)

    # tiny centroid filelist with real wavs
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        wav = (0.2 * np.sin(2 * np.pi * 220 * (i + 1)
                            * np.arange(4096) / 16000)).astype(np.float32)
        p = os.path.join(str(d), f"ref_{i}.wav")
        save_wav(p, wav, 16000)
        lines.append(f"{p}|텍스트|0|{i}")
    filelist = os.path.join(str(d), "test_filelist.txt")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return str(d), hp, ckpt, wg_path, filelist


def _make_synth(artifacts, with_waveglow=True):
    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    d, hp, ckpt, wg_path, filelist = artifacts
    synth = Synthesizer(hp)
    synth.waveglow_cfg = WG_CFG
    synth.load(ckpt, wg_path if with_waveglow else None,
               centroid_filelist=filelist)
    return synth


def test_synthesize_ratio_path(artifacts, tmp_path):
    synth = _make_synth(artifacts)
    out = str(tmp_path / "out.wav")
    synth.synthesize("안녕하세요", out, False, None, [0.5, 0.5, 0.0, 0.0])
    wav, sr = load_wav(out)
    assert sr == 16000 and len(wav) > 100
    assert np.isfinite(wav).all()


def test_synthesize_ref_path(artifacts, tmp_path):
    d, *_ = artifacts
    synth = _make_synth(artifacts)
    out = str(tmp_path / "ref_out.wav")
    synth.synthesize("반갑습니다", out, True, os.path.join(d, "ref_0.wav"), None)
    assert os.path.exists(out)


def test_centroid_cache_written(artifacts):
    d, hp, ckpt, _, filelist = artifacts
    synth = _make_synth(artifacts)
    npz = [f for f in os.listdir(d) if f.endswith(".npz")]
    assert npz, "centroid cache .npz expected beside the checkpoint"
    assert synth.neu.shape == (hp.z_latent_dim,)


def test_centroid_cache_invalidated_by_checkpoint_resave(artifacts):
    """Re-saving the checkpoint IN PLACE (same basename) must change the
    centroid cache key — stale centroids from the old weights were silently
    served before the fingerprint key."""
    import time as _time

    from tacotron2_vae_tpu.serving.synthesizer import _ckpt_fingerprint

    d, hp, ckpt, _, filelist = artifacts
    fp1 = _ckpt_fingerprint(ckpt)
    _make_synth(artifacts, with_waveglow=False)
    n_npz = len([f for f in os.listdir(d) if f.endswith(".npz")])
    assert fp1 in "".join(os.listdir(d))
    _time.sleep(0.01)  # ensure mtime_ns advances
    with open(ckpt, "rb") as f:
        blob = f.read()
    with open(ckpt, "wb") as f:
        f.write(blob)
    fp2 = _ckpt_fingerprint(ckpt)
    assert fp2 != fp1
    _make_synth(artifacts, with_waveglow=False)
    names = [f for f in os.listdir(d) if f.endswith(".npz")]
    # fresh cache under the NEW fingerprint; the superseded one is evicted
    # (stale .npz files would otherwise accumulate per re-save)
    assert any(fp2 in f for f in names), names
    assert not any(fp1 in f for f in names), names
    assert len(names) == n_npz


def test_centroid_eviction_spares_prefix_sibling_checkpoint(artifacts, tmp_path):
    """Step-numbered checkpoints in one directory: `ckpt_15`'s eviction glob
    `ckpt_15_*_test.npz` also matches `ckpt_1500_<fp>_test.npz` (middle
    `00_<fp>`), so recomputing ckpt_15's centroids must NOT delete the
    sibling's valid cache — only middles that are exactly one fingerprint
    (hex, no '_') are eviction candidates."""
    import shutil

    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    d, hp, ckpt, _, filelist = artifacts
    sdir = str(tmp_path / "ckpts")
    os.makedirs(sdir)
    short = os.path.join(sdir, "ckpt_15")
    long = os.path.join(sdir, "ckpt_1500")
    shutil.copy(ckpt, short)
    shutil.copy(ckpt, long)

    def load(path):
        s = Synthesizer(hp)
        s.load(path, None, centroid_filelist=filelist)

    load(long)
    sib = [f for f in os.listdir(sdir)
           if f.startswith("ckpt_1500_") and f.endswith(".npz")]
    assert len(sib) == 1
    load(short)  # recompute + evict pass for ckpt_15
    names = os.listdir(sdir)
    assert sib[0] in names, f"sibling cache evicted: {names}"
    assert any(f.startswith("ckpt_15_") and f.endswith(".npz")
               for f in names), names
    # and ckpt_15's own stale fingerprints ARE still evicted on re-save
    import time as _time

    _time.sleep(0.01)
    with open(short, "rb") as f:
        blob = f.read()
    with open(short, "wb") as f:
        f.write(blob)
    load(short)
    own = [f for f in os.listdir(sdir)
           if f.startswith("ckpt_15_") and f.endswith(".npz")
           and not f.startswith("ckpt_1500_")]
    assert len(own) == 1, own
    assert sib[0] in os.listdir(sdir)


def test_waveglow_export_self_describing(artifacts, tmp_path):
    """`tools/train_waveglow.py --export` writes a self-describing pickle
    {"waveglow": params, "config": asdict(cfg)} (possibly float16 storage).
    Synthesizer.load must adopt the EMBEDDED config over its own default and
    upcast storage to float32 before vocoding — otherwise a vocoder trained
    at a non-default size (e.g. reduced flows) desyncs from the serving
    config and the flow inversion produces garbage shapes."""
    import dataclasses

    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    d, hp, ckpt, _, filelist = artifacts
    alt_cfg = wg.WaveGlowConfig(
        n_flows=3, n_group=8, n_early_every=2, n_early_size=2,
        n_layers=2, n_channels=8,
    )
    alt_params = wg.init(jax.random.PRNGKey(7), alt_cfg)
    export = str(tmp_path / "wg_export.pkl")
    with open(export, "wb") as f:
        pickle.dump(
            {
                "waveglow": jax.tree_util.tree_map(
                    lambda x: np.asarray(x, np.float16),
                    jax.device_get(alt_params)),
                "config": dataclasses.asdict(alt_cfg),
            },
            f,
        )

    synth = Synthesizer(hp)  # default waveglow_cfg: NOT alt_cfg
    synth.load(ckpt, export, centroid_filelist=filelist)
    assert synth.waveglow_cfg == alt_cfg  # embedded config adopted
    leaves = jax.tree_util.tree_leaves(synth.waveglow)
    assert all(np.asarray(p).dtype == np.float32 for p in leaves)

    T = 24
    mel = np.zeros((1, hp.n_mel_channels, T), np.float32) - 4.0
    wav = np.asarray(synth.vocode(mel))
    assert wav.ndim == 1 and len(wav) >= T * hp.hop_length * 3 // 4
    assert np.all(np.isfinite(wav))


def test_centroid_precompute_skips_sub_pad_clips(artifacts, tmp_path):
    """One sub-pad-length clip in the manifest must not abort the bulk
    centroid featurization (it is skipped like an unreadable file)."""
    d, hp, ckpt, _, filelist = artifacts
    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    short = str(tmp_path / "short.wav")
    save_wav(short, np.zeros(64, np.float32), 16000)
    mixed = str(tmp_path / "mixed.txt")
    with open(filelist, encoding="utf-8") as f:
        body = f.read()
    with open(mixed, "w", encoding="utf-8") as f:
        f.write(body + f"{short}|짧은|0|0\n")
    synth = Synthesizer(hp)
    with pytest.warns(UserWarning, match="skipped 1/5"):
        synth.load(ckpt, None, centroid_filelist=mixed)
    assert synth.centroids_loaded


def test_interpolation_path(artifacts):
    synth = _make_synth(artifacts)
    # The tiny test net collapses all inputs to one latent (2-channel convs
    # with dead ReLUs — a test-config artifact); set distinct centroids to
    # exercise the interpolation machinery itself.
    rng = np.random.RandomState(0)
    synth.neu = rng.randn(synth.hparams.z_latent_dim).astype(np.float32)
    synth.hap = rng.randn(synth.hparams.z_latent_dim).astype(np.float32)
    s0 = np.asarray(synth.interpolate("neu", "hap", 0.0))
    s1 = np.asarray(synth.interpolate("neu", "hap", 1.0))
    mid = np.asarray(synth.interpolate("neu", "hap", 0.5))
    assert s0.shape == (synth.hparams.E,)
    assert not np.allclose(s0, s1)
    # fc3 is affine, so the midpoint maps to the midpoint
    np.testing.assert_allclose(mid, (s0 + s1) / 2, atol=1e-5)


def test_griffin_lim_fallback(artifacts, tmp_path):
    synth = _make_synth(artifacts, with_waveglow=False)
    out = str(tmp_path / "gl.wav")
    synth.synthesize("테스트", out, False, None, [1.0, 0.0, 0.0, 0.0])
    wav, sr = load_wav(out)
    assert len(wav) > 100 and np.isfinite(wav).all()


def test_demo_ref_static_routes():
    """The demo's random-ref flow: /uploads/demo_refs.txt resolves, and the
    wavs it lists are servable via /samples/ (no 404s out of the box)."""
    from tacotron2_vae_tpu.serving import app as app_mod

    server = app_mod.make_server(0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/uploads/demo_refs.txt"
        ) as r:
            assert r.status == 200
            lines = r.read().decode("utf-8").strip().split("\n")
        assert len(lines) == 8
        wav = lines[0].split("|")[0]  # samples/refs/ref_neu.wav
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/{wav}") as r:
            assert r.status == 200
            assert r.read(4) == b"RIFF"
        # the reference's dataset manifest is also served
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/uploads/koemo_spk_emo_all_test.txt"
        ) as r:
            assert r.status == 200
    finally:
        server.shutdown()


def test_missing_centroid_filelist_warns_loudly(artifacts, tmp_path):
    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    d, hp, ckpt, _, _ = artifacts
    synth = Synthesizer(hp)
    with pytest.warns(UserWarning, match="centroids are ZERO"):
        synth.load(ckpt, None,
                   centroid_filelist=str(tmp_path / "nonexistent.txt"))
    assert not synth.centroids_loaded
    with pytest.warns(UserWarning, match="ratios have no effect"):
        synth.style_from_ratios([1.0, 0.0, 0.0, 0.0])
    with pytest.warns(UserWarning, match="no effect"):
        synth.interpolate("neu", "hap", 0.5)


def test_centroid_precompute_skips_unreadable_wavs(artifacts, tmp_path):
    """Shipped dataset manifests carry the original corpus' absolute paths;
    precompute must skip what it can't read and still embed the rest."""
    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    d, hp, ckpt, _, filelist = artifacts
    mixed = str(tmp_path / "mixed.txt")
    with open(filelist, encoding="utf-8") as f:
        lines = f.read().strip().split("\n")
    lines.insert(0, "/home/jinhan/Storage/KoreanEmotionSpeech/missing.wav|x|0|0")
    with open(mixed, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    ckpt2 = str(tmp_path / "model2.pkl")
    import shutil

    shutil.copy(ckpt, ckpt2)
    synth = Synthesizer(hp)
    with pytest.warns(UserWarning, match="skipped 1/5"):
        synth.load(ckpt2, None, centroid_filelist=mixed)
    assert synth.centroids_loaded
    assert synth.neu.shape == (hp.z_latent_dim,)


def test_shipped_serving_data_contract():
    """The filelists + uploads manifests the reference ships must exist and
    parse (reference filelists/, web/static/uploads/)."""
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = [
        "koemo_spk_emo_all_train.txt", "koemo_spk_emo_all_valid.txt",
        "koemo_spk_emo_all_test.txt", "koemo_spk_emo_all6_train.txt",
        "koemo_spk_emo_all6_valid.txt", "koemo_spk_emo_all6_test.txt",
        "iemocap_spk_emo_all_train.txt", "iemocap_spk_emo_all_valid.txt",
        "iemocap_spk_emo_all_test.txt",
    ]
    for name in names:
        path = os.path.join(base, "filelists", name)
        assert os.path.exists(path), name
        with open(path, encoding="utf-8") as f:
            first = f.readline().strip().split("|")
        assert len(first) == 4  # path|text|speaker|emotion
    uploads = os.path.join(base, "web", "static", "uploads")
    assert os.path.exists(os.path.join(uploads, "koemo_spk_emo_all_test.txt"))
    # demo_refs.txt points at wavs that actually ship in the repo
    with open(os.path.join(uploads, "demo_refs.txt"), encoding="utf-8") as f:
        for line in f:
            wav = line.strip().split("|")[0]
            assert os.path.exists(os.path.join(base, wav)), wav


def test_http_api(artifacts, tmp_path, monkeypatch):
    from tacotron2_vae_tpu.serving import app as app_mod

    synth = _make_synth(artifacts)
    monkeypatch.setattr(app_mod, "synthesizer", synth)
    monkeypatch.setattr(app_mod, "_WEB", str(tmp_path / "web"))

    server = app_mod.make_server(0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        from urllib.parse import quote

        q = quote("안녕")
        # index page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/?text={q}") as r:
            assert r.status == 200
            assert "안녕" in r.read().decode("utf-8")
        # /generate ratio path
        url = (f"http://127.0.0.1:{port}/generate?text={q}&con=false"
               "&n=1&s=0&h=0&a=0")
        with urllib.request.urlopen(url) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "audio/wav"
            assert len(r.read()) > 44
        # POST /api
        body = json.dumps({"text": "안녕", "neu": 1, "sad": 0,
                           "hap": 0, "ang": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
            assert payload["params"]["text"] == "안녕"
            assert len(payload["data"]) > 100  # base64 wav
    finally:
        server.shutdown()


def test_http_api_concurrent_requests_micro_batch(artifacts, tmp_path,
                                                  monkeypatch):
    """Concurrent /api requests ride the micro-batch queue: every request
    succeeds with distinct audio, and at least one worker batch groups
    multiple requests (the round-3 global lock serialized them 1-by-1)."""
    from tacotron2_vae_tpu.serving import app as app_mod

    synth = _make_synth(artifacts)
    monkeypatch.setattr(app_mod, "synthesizer", synth)
    monkeypatch.setattr(app_mod, "_WEB", str(tmp_path / "web"))
    monkeypatch.setattr(app_mod, "_batcher", None)  # fresh queue

    batch_sizes = []
    real = synth.synthesize_batch

    def spy(reqs, **kw):
        batch_sizes.append(len(reqs))
        return real(reqs, **kw)

    monkeypatch.setattr(synth, "synthesize_batch", spy)

    server = app_mod.make_server(0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    texts = ["안녕하세요", "반갑습니다", "테스트", "음성 합성", "파도", "하늘"]
    results: dict[int, bytes] = {}
    errors = []

    def hit(i):
        body = json.dumps({"text": texts[i], "neu": 1, "sad": 0,
                           "hap": 0, "ang": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                results[i] = json.loads(r.read())["data"].encode()
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    try:
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        assert len(results) == len(texts)
        assert all(len(v) > 100 for v in results.values())
        # the queue grouped at least once (first request compiles while the
        # rest pile up -> subsequent batch carries >= 2)
        assert sum(batch_sizes) == len(texts)
        assert max(batch_sizes) >= 2, batch_sizes
    finally:
        server.shutdown()


def test_synthesize_mel_batch_matches_single(artifacts):
    """The batched mel path must agree with the single path run on the same
    padded shapes: per-item lengths, shapes, and finite outputs (stochastic
    prenet dropout means values differ run-to-run by design)."""
    synth = _make_synth(artifacts, with_waveglow=False)
    hp = synth.hparams
    style = np.zeros(hp.E, np.float32)
    items = synth.synthesize_mel_batch(
        ["안녕하세요", "네", "반갑습니다"], [style, style, style]
    )
    assert len(items) == 3
    for mel, mel_post, gate, align, n in items:
        assert mel.shape == (1, hp.n_mel_channels, n)
        assert mel_post.shape == mel.shape
        assert np.isfinite(mel).all() and np.isfinite(mel_post).all()
        assert 0 < n <= hp.max_decoder_steps * hp.n_frames_per_step


def test_synthesize_with_r2_checkpoint(tmp_path):
    """End-to-end serving from an n_frames_per_step=2 checkpoint: the
    decoder emits 2 frames per step; lengths are frame counts and gate/
    alignment trimming is per-step (serving/synthesizer.py)."""
    import pickle

    from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

    hp = create_hparams(TINY + ",n_frames_per_step=2")
    params, state = tacotron2.init(jax.random.PRNGKey(0), hp)
    ckpt = str(tmp_path / "model_r2.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "model_state": jax.device_get(state)}, f)
    synth = Synthesizer(hp)
    synth.load(ckpt, None, centroid_filelist=str(tmp_path / "missing.txt"))
    mel, mel_post, gate, align, n = synth.synthesize_mel(
        "안녕", np.zeros(hp.E, np.float32)
    )
    # serving pins max_decoder_steps=600 (reference synthesizer.py:50-51);
    # at r=2 that is up to 1200 frames
    assert mel.shape[2] == n and n % 2 == 0 and n <= 600 * 2
    assert gate.shape[1] == (n + 1) // 2
    out = str(tmp_path / "r2.wav")
    synth.synthesize("안녕하세요", out, False, None, [1.0, 0.0, 0.0, 0.0])
    wav, sr = load_wav(out)
    assert sr == 16000 and np.isfinite(wav).all()


def test_micro_batcher_adaptive_window():
    """A lone request at an idle worker skips the companion window (round-5
    fix: the fixed 10 ms sleep was +33% latency on a ~30 ms decode for zero
    batching benefit); sustained concurrency still groups, and a full batch
    ends the wait early instead of sleeping out the window."""
    import time

    from tacotron2_vae_tpu.serving.app import MicroBatcher

    calls = []

    def run_batch(reqs):
        calls.append(len(reqs))
        time.sleep(0.02)  # stand-in for one decode
        return [f"r{r}" for r in reqs]

    window = 0.25  # huge window so skipping vs paying it is unambiguous
    mb = MicroBatcher(run_batch, max_batch=4, window_s=window)

    # Lone request, idle worker, no concurrency history: served immediately.
    t0 = time.perf_counter()
    assert mb.submit(1) == "r1"
    lone = time.perf_counter() - t0
    assert lone < window, f"lone request paid the window: {lone:.3f}s"
    assert calls == [1]

    # Concurrent burst: grouped (the window now applies and may be cut
    # short by the batch filling).
    results = {}

    def hit(i):
        results[i] = mb.submit(i)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(2, 6)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    burst = time.perf_counter() - t0
    assert results == {i: f"r{i}" for i in range(2, 6)}
    assert max(calls[1:]) >= 2, calls  # grouping happened
    # full batch (4 == max_batch) cuts the wait short of a full window
    assert burst < 2 * window + 1.0
