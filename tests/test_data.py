"""Data pipeline tests: filelist parsing, mel extraction, collate invariants,
and an end-to-end tiny training run with checkpoint save/resume."""

import os

import jax
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.data import DataLoader, TextMelDataset, collate
from tacotron2_vae_tpu.dsp.audio import save_wav

TINY = (
    "batch_size=2,symbols_embedding_dim=32,encoder_embedding_dim=32,"
    "attention_rnn_dim=32,decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,"
    "postnet_embedding_dim=32,E=32,ref_enc_gru_size=16,z_latent_dim=4,"
    "ref_enc_filters=[2,2,4,4,8,8],attention_location_n_filters=4,"
    "encoder_n_convolutions=2,postnet_n_convolutions=3,"
    "compute_dtype='float32',anneal_function='constant',"
    "text_bucket_size=8,mel_bucket_size=16,epochs=1,iters_per_checkpoint=2"
)

TEXTS = [
    "감정있는 한국어 목소리",
    "안녕하세요 반갑습니다",
    "오늘 날씨가 좋네요",
    "테스트 문장입니다",
]


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("koemo")
    lines = []
    rng = np.random.RandomState(0)
    for i, text in enumerate(TEXTS):
        n = 4000 + 800 * i
        wav = (0.3 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(n) / 16000)
               + 0.01 * rng.randn(n)).astype(np.float32)
        path = os.path.join(str(d), f"utt_{i}.wav")
        save_wav(path, wav, 16000)
        lines.append(f"{path}|{text}|0|{i % 4}")
    filelist = os.path.join(str(d), "train.txt")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return str(d), filelist


@pytest.fixture(scope="module")
def hp(dataset_dir):
    _, filelist = dataset_dir
    return create_hparams(TINY).replace(
        training_files=filelist, validation_files=filelist
    )


def test_dataset_items(hp):
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    assert len(ds) == 4
    text, mel, speaker, emotion = ds[0]
    assert text.dtype == np.int32 and text[-1] == 1  # EOS id
    assert mel.shape[0] == hp.n_mel_channels
    assert mel.min() >= np.log(1e-5) - 1e-4
    assert speaker.shape == (hp.n_speakers,) and speaker.sum() == 1.0
    assert emotion.shape == (hp.n_emotions,) and emotion.sum() == 1.0


def test_collate_invariants(hp):
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    items = [ds[i] for i in range(3)]
    b = collate(items, text_bucket=8, mel_bucket=16)
    B, S = b.text.shape
    _, _, T = b.mel.shape
    assert S % 8 == 0 and T % 16 == 0
    # sorted by text length descending (reference data_utils.py:95-97)
    assert list(b.input_lengths) == sorted(b.input_lengths, reverse=True)
    for i in range(B):
        L = b.output_lengths[i]
        # gate is 1.0 from the last valid frame on (data_utils.py:133)
        assert b.gate[i, L - 1] == 1.0
        assert np.all(b.gate[i, L - 1 :] == 1.0)
        assert np.all(b.gate[i, : L - 1] == 0.0)
        # mel padding is zero
        assert np.all(b.mel[i, :, L:] == 0.0)
        # text padding is zero
        assert np.all(b.text[i, b.input_lengths[i] :] == 0)


def test_dataloader_sharding(hp):
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    dl0 = DataLoader(ds, 1, hp, shuffle=False, shard=(0, 2))
    dl1 = DataLoader(ds, 1, hp, shuffle=False, shard=(1, 2))
    b0 = [b.text[0].tolist() for b in dl0.epoch(0)]
    b1 = [b.text[0].tolist() for b in dl1.epoch(0)]
    assert len(b0) == len(b1) == 2
    assert all(x != y for x, y in zip(b0, b1))


def test_prepare_dataloaders_multihost_disjoint_coverage(hp):
    """prepare_dataloaders(shard=(r, world)): the hosts' slices of each
    global step are disjoint and their union covers the global batch
    (DistributedSampler semantics, reference train.py:59-60)."""
    from tacotron2_vae_tpu.training.train import prepare_dataloaders

    hp2 = hp.replace(batch_size=4)
    world = 2
    per_host = []
    for rank in range(world):
        tl, _ = prepare_dataloaders(hp2, shard=(rank, world))
        assert tl.batch_size == hp2.batch_size // world
        batches = list(tl.epoch(0))
        assert len(batches) == 1
        # identify items by their (unpadded) text id tuple
        ids = {
            tuple(b.text[i, : b.input_lengths[i]].tolist())
            for b in batches for i in range(b.text.shape[0])
        }
        per_host.append(ids)
        # fixed multi-host shapes: padded to the dataset-wide bucketed max
        assert batches[0].text.shape[1] == tl.fixed_lengths[0]
        assert batches[0].mel.shape[2] % hp2.mel_bucket_size == 0
    assert per_host[0].isdisjoint(per_host[1])
    assert len(per_host[0] | per_host[1]) == 4  # full coverage


def test_prepare_dataloaders_rejects_indivisible_batch(hp):
    from tacotron2_vae_tpu.training.train import prepare_dataloaders

    with pytest.raises(ValueError, match="not divisible"):
        prepare_dataloaders(hp.replace(batch_size=3), shard=(0, 2))


def test_mel_cache_write_once_and_reuse(hp):
    """First featurization writes <wav>.<stft-config>.npy; later calls are
    pure np.loads with identical contents; config changes miss the cache."""
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    wav = ds.entries[0][0]
    cache = ds.mel_cache_path(wav)
    if os.path.exists(cache):
        os.remove(cache)
    mel1 = ds.get_mel(wav)
    assert os.path.exists(cache)
    # poison the STFT: a second call must not featurize again
    ds.stft = None
    mel2 = ds.get_mel(wav)
    np.testing.assert_array_equal(mel1, mel2)
    # a different STFT config gets a different cache key
    hp2 = hp.replace(hop_length=hp.hop_length * 2)
    ds2 = TextMelDataset(hp.training_files, hp2, shuffle=False)
    assert ds2.mel_cache_path(wav) != cache
    # mel_cache=False bypasses reads and writes
    ds3 = TextMelDataset(hp.training_files, hp.replace(mel_cache=False),
                         shuffle=False)
    os.remove(cache)
    ds3.get_mel(wav)
    assert not os.path.exists(cache)


def test_warm_mel_cache_matches_serial_path(hp):
    """The bulk featurizer (one batched device call, host reflect-padding)
    writes caches equal to the per-item path for every frame."""
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    # serial reference mels, computed with the cache off
    ds_ref = TextMelDataset(
        hp.training_files, hp.replace(mel_cache=False), shuffle=False
    )
    ref = {e[0]: ds_ref.get_mel(e[0]) for e in ds.entries}
    for e in ds.entries:
        c = ds.mel_cache_path(e[0])
        if os.path.exists(c):
            os.remove(c)
    # tiny chunking: multiple chunks per utterance, cross-utterance batches
    written = ds.warm_mel_cache(chunk_frames=8, batch_chunks=5)
    assert written == len(ds.entries)
    for e in ds.entries:
        assert os.path.exists(ds.mel_cache_path(e[0]))
        got = ds.get_mel(e[0])
        assert got.shape == ref[e[0]].shape
        np.testing.assert_allclose(got, ref[e[0]], atol=2e-4)
    # second warm is a no-op
    assert ds.warm_mel_cache() == 0


def test_prefetch_order_transform_and_errors():
    from tacotron2_vae_tpu.data.prefetch import prefetch

    out = list(prefetch(range(10), depth=3, transform=lambda x: x * 2))
    assert out == [x * 2 for x in range(10)]

    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)

    # early exit stops the worker without hanging
    slow = prefetch(iter(range(1000)), depth=1)
    assert next(slow) == 0
    slow.close()


def test_prefetch_map_order_errors_and_early_exit():
    from tacotron2_vae_tpu.data.prefetch import prefetch_map

    # order-preserving under real concurrency (sleep inversely to index)
    import time as _time

    def slow_sq(x):
        _time.sleep(0.002 * (8 - x % 8))
        return x * x

    out = list(prefetch_map(slow_sq, range(32), workers=4))
    assert out == [x * x for x in range(32)]

    # workers<=1 degenerates to the serial prefetch path
    assert list(prefetch_map(lambda x: x + 1, range(5), workers=1)) == [
        1, 2, 3, 4, 5]

    # exception in fn surfaces at that item's position
    def boom(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    it = prefetch_map(boom, range(6), workers=2)
    assert next(it) == 0
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        list(it)

    # early close doesn't hang
    it = prefetch_map(lambda x: x, range(1000), workers=2, depth=4)
    assert next(it) == 0
    it.close()


def test_multiworker_epoch_matches_serial(hp):
    """num_workers>1 must yield byte-identical batches in the same order."""
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    serial = DataLoader(ds, 2, hp, shuffle=True, num_workers=1)
    pooled = DataLoader(ds, 2, hp, shuffle=True, num_workers=4)
    a = list(serial.epoch(3))
    b = list(pooled.epoch(3))
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        for k, v in x.asdict().items():
            np.testing.assert_array_equal(v, y.asdict()[k])


def test_warm_mel_cache_sharded_disjoint_and_complete(hp, dataset_dir):
    """Sharded warming covers the corpus exactly once across ranks."""
    d, filelist = dataset_dir
    ds = TextMelDataset(filelist, hp, shuffle=False)
    paths = [ds.mel_cache_path(e[0]) for e in ds.entries]
    for p in paths:
        if os.path.exists(p):
            os.remove(p)
    w0 = ds.warm_mel_cache(shard=(0, 2))
    done_r0 = {p for p in paths if os.path.exists(p)}
    w1 = ds.warm_mel_cache(shard=(1, 2))
    done_all = {p for p in paths if os.path.exists(p)}
    assert w0 + w1 == len(paths)
    assert 0 < len(done_r0) < len(paths)
    assert done_all == set(paths)


def test_prefetched_epoch_matches_sync_epoch(hp):
    from tacotron2_vae_tpu.data.prefetch import prefetch

    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    dl = DataLoader(ds, 2, hp, shuffle=False)
    sync = [b.text for b in dl.epoch(0)]
    pre = [b.text for b in prefetch(dl.epoch(0), depth=2)]
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a, b)


def test_max_lengths_matches_featurized(hp):
    """Header-derived max lengths must match the real featurized maxima."""
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    max_s, max_t = ds.max_lengths()
    real_s = max(len(ds[i][0]) for i in range(len(ds)))
    real_t = max(ds[i][1].shape[1] for i in range(len(ds)))
    assert max_s == real_s
    assert max_t == real_t


def test_dataloader_fixed_lengths_uniform_shapes(hp):
    ds = TextMelDataset(hp.training_files, hp, shuffle=False)
    max_s, max_t = ds.max_lengths()
    dl = DataLoader(ds, 2, hp, shuffle=False,
                    fixed_lengths=(max_s + 5, max_t + 10))
    shapes = {(b.text.shape, b.mel.shape, b.gate.shape) for b in dl.epoch(0)}
    assert shapes == {
        ((2, max_s + 5), (2, 80, max_t + 10), (2, max_t + 10))
    }


def test_windowed_metric_fetch_keeps_every_csv_row(hp, tmp_path):
    """hp.log_fetch_window defers the host fetch of step metrics (step i is
    logged at step i+window so the device pipeline never drains on the
    tunnel's completion latency) — but per-iteration logging is a reference
    semantic (train.py prints/logs loss every step): every iteration must
    still land exactly once in metrics.csv, in order, including the final
    in-flight steps at loop exit."""
    import csv

    from tacotron2_vae_tpu.training.train import train

    outdir = str(tmp_path / "out")
    train(outdir, "logs", None, False,
          hp.replace(epochs=3, log_fetch_window=5))  # window > epoch length
    with open(os.path.join(outdir, "logs", "metrics.csv")) as f:
        its = [int(row["iteration"]) for row in csv.DictReader(f)]
    assert its == [0, 1, 2, 3, 4, 5]  # 3 epochs x 2 iters, no gaps/dupes


def test_end_to_end_train_and_resume(hp, tmp_path):
    from tacotron2_vae_tpu.training.train import train
    from tacotron2_vae_tpu.training.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )
    from tacotron2_vae_tpu.training.train_state import create_train_state

    outdir = str(tmp_path / "out")
    # 2 epochs x 2 iters => the in-loop validate + checkpoint at iteration 2
    ts, iteration = train(outdir, None, None, False, hp.replace(epochs=2))
    assert iteration == 4
    ckpt = latest_checkpoint(outdir)
    assert ckpt is not None and ckpt.endswith("checkpoint_2")
    from tacotron2_vae_tpu.training.checkpoint import save_checkpoint

    path = save_checkpoint(ts, hp.learning_rate, outdir)
    ts2 = create_train_state(jax.random.PRNGKey(99), hp)
    ts2, it, lr = load_checkpoint(path, ts2)
    assert it == 4 and lr == hp.learning_rate
    a = np.asarray(jax.device_get(ts.params)["decoder"]["proj"]["w"])
    b = np.asarray(ts2.params["decoder"]["proj"]["w"])
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def npy_corpus(tmp_path_factory):
    """64 entries with widely-spread mel lengths (60..627 frames) as
    pre-featurized .npy mels (load_mel_from_disk path, data_utils.py:53-57)
    — exercises length-pooled batching without any STFT cost."""
    d = tmp_path_factory.mktemp("npy_corpus")
    rng = np.random.RandomState(7)
    lines = []
    for i in range(64):
        T = 60 + 9 * i
        mel = (rng.randn(80, T) * 0.3).astype(np.float32)
        path = os.path.join(str(d), f"m{i:02d}.npy")
        np.save(path, mel)
        lines.append(f"{path}|{TEXTS[i % 4]}|0|{i % 4}")
    filelist = os.path.join(str(d), "train.txt")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return filelist


def test_sort_by_length_pooled_batching(npy_corpus):
    hp = create_hparams(TINY).replace(
        training_files=npy_corpus, validation_files=npy_corpus,
        load_mel_from_disk=True, sort_by_length=True,
    )
    hp_off = hp.replace(sort_by_length=False)
    ds = TextMelDataset(npy_corpus, hp, shuffle=False)

    def epoch_stats(hp_, epoch):
        dl = DataLoader(ds, 8, hp_, shuffle=True, drop_last=True,
                        num_workers=1)
        padded = real = 0
        seen = []
        for b in dl.epoch(epoch):
            padded += b.mel.shape[0] * b.mel.shape[2]
            real += int(b.output_lengths.sum())
            seen.append(np.sort(b.output_lengths))
        return padded, real, seen

    pad_on, real_on, seen_on = epoch_stats(hp, 0)
    pad_off, real_off, seen_off = epoch_stats(hp_off, 0)
    # identical item coverage either way (same shuffle, pool-local reorder)
    assert real_on == real_off
    assert sorted(np.concatenate(seen_on).tolist()) == sorted(
        np.concatenate(seen_off).tolist())
    # pooling must cut padded frames meaningfully on a 10x length spread
    assert pad_on < 0.75 * pad_off, (pad_on, pad_off)
    # deterministic: same epoch twice -> identical batch sequence
    again = epoch_stats(hp, 0)[2]
    assert all(np.array_equal(a, b) for a, b in zip(seen_on, again))
    # different epoch -> different batch composition (still stochastic)
    other = epoch_stats(hp, 1)[2]
    assert any(not np.array_equal(a, b) for a, b in zip(seen_on, other))


def test_sort_by_length_shard_disjointness(npy_corpus):
    hp = create_hparams(TINY).replace(
        training_files=npy_corpus, validation_files=npy_corpus,
        load_mel_from_disk=True, sort_by_length=True,
    )
    ds = TextMelDataset(npy_corpus, hp, shuffle=False)
    per_host = []
    for rank in range(2):
        dl = DataLoader(ds, 4, hp, shuffle=True, drop_last=True,
                        shard=(rank, 2), num_workers=1)
        lens = []
        for b in dl.epoch(3):
            lens.extend(b.output_lengths.tolist())
        per_host.append(lens)
    # all 64 distinct lengths covered exactly once across the two hosts
    union = sorted(per_host[0] + per_host[1])
    assert union == sorted(60 + 9 * i for i in range(64))


def test_sort_by_length_drop_last_is_unbiased(npy_corpus):
    """drop_last under length-pooled batching must drop uniformly-random
    items, not systematically the longest of the final pool (the trim
    happens BEFORE pooling, on the shuffled order)."""
    hp = create_hparams(TINY).replace(
        training_files=npy_corpus, validation_files=npy_corpus,
        load_mel_from_disk=True, sort_by_length=True,
    )
    ds = TextMelDataset(npy_corpus, hp, shuffle=False)
    all_lens = set(60 + 9 * i for i in range(64))
    dropped = []
    for epoch in range(20):
        dl = DataLoader(ds, 7, hp, shuffle=True, drop_last=True,
                        num_workers=1)  # 64 % 7 = 1 item dropped per epoch
        seen = []
        for b in dl.epoch(epoch):
            seen.extend(b.output_lengths.tolist())
        missing = all_lens - set(seen)
        assert len(missing) == 1
        dropped.append(missing.pop())
    # biased (post-pool) drops always cut the max of an 8-item pool, which
    # is >= ~400 with overwhelming probability over 20 epochs; uniform
    # drops hit short items too
    assert min(dropped) < 400, dropped
    assert len(set(dropped)) > 3, dropped


def test_multihost_batch_count_rank_invariant(npy_corpus):
    """When len(dataset) % world != 0, low ranks hold one extra item in
    their strided slice; the per-epoch batch count must still be identical
    across ranks (a desynced count would hang the global train step)."""
    hp = create_hparams(TINY).replace(
        training_files=npy_corpus, validation_files=npy_corpus,
        load_mel_from_disk=True,
    )
    ds = TextMelDataset(npy_corpus, hp, shuffle=False)
    # truncate to 63 entries -> world=2 slices of 32 and 31 items
    ds.entries = ds.entries[:63]
    ds._mel_lengths = None
    counts = []
    for rank in range(2):
        dl = DataLoader(ds, 4, hp, shuffle=True, drop_last=True,
                        shard=(rank, 2), num_workers=1)
        counts.append(sum(1 for _ in dl.epoch(0)))
        assert counts[-1] == len(dl)
    assert counts[0] == counts[1] == (63 // 2) // 4


def test_cache_eviction_escapes_glob_metachars(tmp_path):
    """A wav named with glob metachars (foo[ab].wav) must evict only ITS
    stale caches — an unescaped pattern character-class-matches a SIBLING
    wav's valid cache (fooa.wav) and deletes it."""
    import wave as _wave

    hp = create_hparams(TINY)
    d = str(tmp_path)

    def write_wav(path):
        with _wave.open(path, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2)
            w.setframerate(hp.sampling_rate)
            w.writeframes(np.zeros(4096, np.int16).tobytes())

    tricky = os.path.join(d, "foo[ab].wav")
    sibling = os.path.join(d, "fooa.wav")
    write_wav(tricky)
    write_wav(sibling)
    filelist = os.path.join(d, "l.txt")
    with open(filelist, "w") as f:
        f.write(f"{tricky}|{TEXTS[0]}|0|0\n{sibling}|{TEXTS[1]}|0|1\n")
    ds = TextMelDataset(filelist, hp, shuffle=False)

    ds.get_mel(sibling)   # sibling's valid cache
    sib_cache = ds.mel_cache_path(sibling)
    assert os.path.exists(sib_cache)
    # plant a stale cache for the tricky wav, then featurize it
    stale = f"{tricky}.{ds._cache_tag}.deadbeef.npy"
    np.save(stale, np.zeros((hp.n_mel_channels, 3), np.float32))
    ds.get_mel(tricky)
    assert os.path.exists(ds.mel_cache_path(tricky))
    assert os.path.exists(sib_cache), "sibling's valid cache was deleted"
    assert not os.path.exists(stale), "tricky wav's stale cache not evicted"
