"""Data pipeline: filelist parsing, text/mel featurization, static-shape batching.

Parity targets: reference ``TextMelLoader`` (data_utils.py:11-79) and
``TextMelCollate`` (data_utils.py:82-137) — same filelist format
(``path|text|speaker|emotion``), same gate-target construction (1.0 from the
last valid frame on, data_utils.py:133), same one-hot speaker/emotion vectors,
same deterministic shuffle (seed 1234).

TPU-native differences:
  * Batches are padded to *bucketed* static shapes (text/mel lengths rounded
    up to configurable multiples) so XLA compiles a handful of shapes instead
    of one per batch.
  * Mel extraction runs through the JAX TacotronSTFT (batched on device) and
    is cached to ``.npy`` beside the wav when requested.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Iterator, List, Sequence

import numpy as np

from ..dsp import TacotronSTFT, load_wav
from ..text import text_to_sequence


def load_filepaths_and_text(filename: str, split: str = "|") -> List[List[str]]:
    """Parse a filelist (reference utils.py:21-24)."""
    with open(filename, encoding="utf-8") as f:
        return [line.strip().split(split) for line in f if line.strip()]


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass
class Batch:
    """A fully padded, static-shape training batch (NumPy, host-side)."""

    text: np.ndarray            # (B, S) int32
    input_lengths: np.ndarray   # (B,) int32
    mel: np.ndarray             # (B, n_mel, T) float32
    gate: np.ndarray            # (B, T) float32
    output_lengths: np.ndarray  # (B,) int32
    speakers: np.ndarray        # (B, n_speakers) float32
    emotions: np.ndarray        # (B, n_emotions) float32

    def asdict(self) -> dict:
        return {
            "text": self.text,
            "input_lengths": self.input_lengths,
            "mel": self.mel,
            "gate": self.gate,
            "output_lengths": self.output_lengths,
            "speakers": self.speakers,
            "emotions": self.emotions,
        }


class TextMelDataset:
    """Loads (text, mel, speaker, emotion) tuples from a filelist."""

    def __init__(self, filelist_path: str, hp, shuffle: bool = True):
        self.hp = hp
        self.entries = load_filepaths_and_text(filelist_path)
        self.text_cleaners = list(hp.text_cleaners)
        self.load_mel_from_disk = hp.load_mel_from_disk
        self.stft = TacotronSTFT(
            hp.filter_length, hp.hop_length, hp.win_length,
            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin, hp.mel_fmax,
        )
        # Write-once mel cache beside each wav; the suffix encodes the full
        # STFT config so a config change never reads a stale cache.
        self.mel_cache = getattr(hp, "mel_cache", True)
        self._cache_tag = (
            f"mel{hp.n_mel_channels}_{hp.filter_length}_{hp.hop_length}_"
            f"{hp.win_length}_{hp.sampling_rate}_"
            f"{hp.mel_fmin:g}_{hp.mel_fmax:g}"
        )
        if shuffle:
            rng = random.Random(hp.seed)  # reference uses seed 1234
            rng.shuffle(self.entries)
        # Per-entry memo of the static item parts (tokenized text + one-hot
        # speaker/emotion vectors).  Tokenization (Korean cleaners, pure
        # Python) dominates the warm-epoch host cost otherwise; these are
        # deterministic per entry, so epoch 2+ pays only the mel np.load.
        # Dict writes are atomic under the GIL — safe for pool workers.
        self._static_cache: dict = {}

    def __len__(self) -> int:
        return len(self.entries)

    def get_text(self, text: str) -> np.ndarray:
        return np.asarray(
            text_to_sequence(text, self.text_cleaners,
                             symbol_type=getattr(self.hp, "symbol_type", 1)),
            dtype=np.int32,
        )

    def mel_cache_path(self, audiopath: str) -> str:
        """Cache file beside the wav; the suffix encodes the STFT config AND
        the wav's (mtime_ns, size) so a regenerated/edited wav at the same
        path never reads a stale mel."""
        try:
            st = os.stat(audiopath)
            src = f"{st.st_mtime_ns:x}{st.st_size:x}"
        except OSError:
            src = "nosrc"
        return f"{audiopath}.{self._cache_tag}.{src}.npy"

    def _evict_stale_caches(self, audiopath: str, keep: str,
                            dir_names: list[str] | None = None) -> None:
        """Unlink superseded fingerprint-keyed caches for this wav (same
        STFT tag, older mtime/size fingerprint) — without this every wav
        revision leaks a full mel copy beside the corpus.  The fixed part
        of the pattern is glob-escaped: a wav named ``foo[ab].wav`` must
        not character-class-match (and delete) a sibling's valid cache.
        ``dir_names`` (a pre-scanned listing of the wav's directory) skips
        the per-call glob — the bulk warm pass passes one os.scandir
        snapshot per directory instead of O(corpus) directory scans."""
        prefix = f"{audiopath}.{self._cache_tag}."
        if dir_names is not None:
            base = os.path.basename(prefix)
            d = os.path.dirname(audiopath)
            cand = [os.path.join(d, n) for n in dir_names
                    if n.startswith(base) and n.endswith(".npy")]
        else:
            import glob as _glob

            cand = _glob.glob(_glob.escape(prefix) + "*.npy")
        for old in cand:
            if old != keep and not old.endswith(".tmp.npy"):
                try:
                    os.unlink(old)
                except OSError:
                    pass

    def get_mel(self, audiopath: str) -> np.ndarray:
        """wav -> (n_mel, T) log-mel; honors load_mel_from_disk (.npy).

        With ``hp.mel_cache`` (default on), the featurized mel is written
        once to ``<wav>.<stft-config>.npy`` beside the wav (atomic rename,
        safe under concurrent writers) and every later epoch is a plain
        np.load — the wav decode + STFT cost is paid once per corpus, not
        once per epoch (reference analog: data_utils.py:53-57 npy path,
        but automatic)."""
        if self.load_mel_from_disk:
            mel = np.load(audiopath)
            assert mel.shape[0] == self.hp.n_mel_channels, (
                f"Mel dim mismatch: {mel.shape[0]} != {self.hp.n_mel_channels}"
            )
            return mel.astype(np.float32)
        cache = self.mel_cache_path(audiopath) if self.mel_cache else None
        if cache and os.path.exists(cache):
            return np.load(cache)
        from . import native

        audio, sr = native.load_wav(audiopath, scale=self.hp.max_wav_value)
        if sr != self.hp.sampling_rate:
            raise ValueError(f"{sr} SR doesn't match target {self.hp.sampling_rate} SR")
        mel = np.asarray(self.stft.mel_spectrogram(audio[None]))[0]
        mel = mel.astype(np.float32)
        if cache:
            tmp = f"{cache}.{os.getpid()}.tmp.npy"
            try:
                np.save(tmp, mel)  # .npy suffix: np.save won't rename it
                os.replace(tmp, cache)
                self._evict_stale_caches(audiopath, cache)
            except OSError:
                pass  # read-only corpus dir: cache is best-effort
        return mel

    def warm_mel_cache(self, chunk_frames: int = 128,
                       batch_chunks: int = 64,
                       shard: tuple[int, int] = (0, 1)) -> int:
        """Bulk-featurize every un-cached wav in FIXED-SHAPE chunk batches.

        The serial path pays one device round-trip per utterance (measured
        ~870 frames/s cold through the remote tunnel — a 21h corpus's first
        epoch would take >1h while the train step consumes 300k+ frames/s).
        Here wavs are decoded on the host (native C++ reader), each is
        reflect-padded with its own boundary (bit-matching the per-item
        framing, dsp/stft.py::frame_signal), sliced into overlapping
        fixed-width sample chunks of exactly ``chunk_frames`` STFT frames,
        and featurized ``batch_chunks`` chunks per device call — chunks
        from different utterances share batches.  Fixed chunk shapes mean
        ONE XLA compile total, ever (variable bucketed widths measured
        minutes of compile each on this toolchain).  Returns the number of
        mels written.  No-op when the cache is disabled, mels load from
        disk, or everything is cached.
        """
        if self.load_mel_from_disk or not self.mel_cache:
            return 0
        # Multi-host: cache files live on shared storage, so each host warms
        # a disjoint (rank, world) slice and the corpus is featurized once
        # globally instead of `world` times.  Shard the stable entry list
        # (not the uncached subset) so rank assignment is deterministic even
        # while other ranks are concurrently writing caches.
        rank, world = shard
        todo = [
            p for p in [e[0] for e in self.entries][rank::world]
            if not os.path.exists(self.mel_cache_path(p))
        ]
        if not todo:
            return 0
        from . import native
        from ..dsp.stft import featurize_wavs_chunked

        pad = self.hp.filter_length // 2
        written = 0
        # One directory listing per corpus dir for stale-cache eviction
        # (a per-write glob would rescan the directory O(corpus) times).
        dir_listing: dict[str, list[str]] = {}
        for p in todo:
            d = os.path.dirname(p)
            if d not in dir_listing:
                try:
                    dir_listing[d] = os.listdir(d)
                except OSError:
                    dir_listing[d] = []
        # Decode + featurize a bounded window of utterances at a time
        # (streaming keeps host RAM flat over a multi-hour corpus).
        window = max(1, (4 * batch_chunks * chunk_frames * self.hp.hop_length)
                     // (8 * self.hp.sampling_rate))  # ~4 device batches
        for i in range(0, len(todo), window):
            paths, audios = [], []
            for path in todo[i : i + window]:
                audio, sr = native.load_wav(path, scale=self.hp.max_wav_value)
                if sr != self.hp.sampling_rate:
                    raise ValueError(
                        f"{sr} SR doesn't match target "
                        f"{self.hp.sampling_rate} SR"
                    )
                if len(audio) <= pad:  # sub-pad-length clip: serial fallback
                    continue
                paths.append(path)
                audios.append(audio)
            if not audios:
                continue
            mels = featurize_wavs_chunked(
                self.stft, audios,
                chunk_frames=chunk_frames, batch_chunks=batch_chunks,
            )
            for path, mel in zip(paths, mels):
                cache = self.mel_cache_path(path)
                tmp = f"{cache}.{os.getpid()}.tmp.npy"
                try:
                    np.save(tmp, mel)
                    os.replace(tmp, cache)
                    self._evict_stale_caches(
                        path, cache,
                        dir_names=dir_listing.get(os.path.dirname(path)),
                    )
                    written += 1
                except OSError:
                    pass  # read-only corpus: cache is best-effort
        return written

    def mel_lengths(self) -> np.ndarray:
        """Per-entry mel frame counts from cheap metadata only — wav sample
        counts from the file header (mel frames = samples // hop + 1,
        dsp/stft.py framing) or the .npy header; no decode, no STFT.
        Computed once and memoized (used by length-pooled batching and
        ``max_lengths``)."""
        cached = getattr(self, "_mel_lengths", None)
        if cached is not None:
            return cached
        if self.load_mel_from_disk:
            lens = [
                int(np.load(e[0], mmap_mode="r").shape[1])
                for e in self.entries
            ]
        else:
            import wave

            def frames(path):
                with wave.open(path, "rb") as w:
                    return w.getnframes() // self.hp.hop_length + 1

            lens = [frames(e[0]) for e in self.entries]
        self._mel_lengths = np.asarray(lens, np.int64)
        return self._mel_lengths

    def max_lengths(self) -> tuple[int, int]:
        """(max_text_len, max_mel_frames) over the dataset from cheap
        metadata only — token counts plus ``mel_lengths``.  Multi-host
        training pads every batch to these fixed shapes so all hosts
        produce identical global array shapes."""
        max_s = max(len(self.get_text(e[1])) for e in self.entries)
        return max_s, int(self.mel_lengths().max())

    def get_onehot(self, index: str, n: int) -> np.ndarray:
        v = np.zeros(n, np.float32)
        v[int(index)] = 1.0
        return v

    def __getitem__(self, idx: int):
        audiopath, text, speaker, emotion = self.entries[idx][:4]
        static = self._static_cache.get(idx)
        if static is None:
            static = (
                self.get_text(text),
                self.get_onehot(speaker, self.hp.n_speakers),
                self.get_onehot(emotion, self.hp.n_emotions),
            )
            self._static_cache[idx] = static
        tokens, spk, emo = static
        return (tokens, self.get_mel(audiopath), spk, emo)


def collate(
    items: Sequence[tuple],
    n_frames_per_step: int = 1,
    text_bucket: int = 1,
    mel_bucket: int = 1,
    fixed_text_len: int | None = None,
    fixed_mel_len: int | None = None,
) -> Batch:
    """Zero-pad a list of (text, mel, speaker, emotion) into a Batch.

    Matches reference TextMelCollate (data_utils.py:82-137): sorts by text
    length descending, pads, builds gate targets with 1.0 from the last valid
    frame on.  Additionally rounds padded lengths up to bucket multiples (or
    fixed lengths) for static XLA shapes.
    """
    from . import native

    order = np.argsort([-len(it[0]) for it in items], kind="stable")
    items = [items[i] for i in order]

    max_s = fixed_text_len or _round_up(max(len(it[0]) for it in items), text_bucket)
    raw_t = max(it[1].shape[1] for it in items)
    max_t = fixed_mel_len or _round_up(raw_t, mel_bucket)
    max_t = _round_up(max_t, n_frames_per_step)

    text, input_lengths = native.collate_text([it[0] for it in items], max_s)
    mel, gate, output_lengths = native.collate_mels(
        [it[1] for it in items], max_t
    )
    speakers = np.stack([it[2] for it in items]).astype(np.float32)
    emotions = np.stack([it[3] for it in items]).astype(np.float32)

    return Batch(text, input_lengths, mel, gate, output_lengths, speakers, emotions)


class DataLoader:
    """Deterministic length-bucketed batch iterator (host-side).

    Replaces torch DataLoader + DistributedSampler: with ``shard`` (rank,
    world) each host takes a disjoint slice of every epoch's permutation.
    """

    def __init__(
        self,
        dataset: TextMelDataset,
        batch_size: int,
        hp,
        shuffle: bool = True,
        drop_last: bool = True,
        shard: tuple[int, int] = (0, 1),
        seed: int | None = None,
        fixed_lengths: tuple[int, int] | None = None,
        num_workers: int | None = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.hp = hp
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rank, self.world = shard
        self.seed = hp.seed if seed is None else seed
        # (text_len, mel_len) to pad every batch to; required when world > 1
        # so all hosts emit identical shapes for the same global step.
        self.fixed_lengths = fixed_lengths
        # Batch-assembly thread pool width (torch num_workers analog,
        # reference train.py:61).  np.load and the native collate release
        # the GIL, so threads give real parallelism without process forks.
        self.num_workers = (
            num_workers if num_workers is not None
            else getattr(hp, "num_workers", 4)
        )
        self._warmed = False

    def __len__(self) -> int:
        n = len(self.ds) // self.world
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, chunk: np.ndarray) -> Batch:
        items = [self.ds[int(i)] for i in chunk]
        fixed_s, fixed_t = self.fixed_lengths or (None, None)
        return collate(
            items,
            self.hp.n_frames_per_step,
            text_bucket=self.hp.text_bucket_size,
            mel_bucket=self.hp.mel_bucket_size,
            fixed_text_len=fixed_s,
            fixed_mel_len=fixed_t,
        )

    def epoch(self, epoch_idx: int = 0) -> Iterator[Batch]:
        if not self._warmed:
            # One-time bulk featurization of any un-cached wavs (batched
            # device calls); later epochs and every __getitem__ are np.load.
            # Each host warms only its (rank, world) slice — caches are on
            # shared storage, so the corpus is featurized once globally.
            self.ds.warm_mel_cache(shard=(self.rank, self.world))
            self._warmed = True
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch_idx)
            rng.shuffle(idx)
        idx = idx[self.rank :: self.world]
        if self.drop_last:
            # Rank-INVARIANT batch count (len(self), floor(n/world)//bs):
            # low ranks' strided slices hold one more item when n % world
            # != 0, and a per-rank len(idx)//bs would have those hosts emit
            # an extra global step whose collectives hang waiting on the
            # others.  Trimming here also keeps the drop uniform under
            # length pooling (the post-pool tail holds the LONGEST items).
            idx = idx[: len(self) * self.batch_size]
        if getattr(self.hp, "sort_by_length", False):
            # Length-pooled batching (the reference defines this hparam but
            # never uses it, hparams.py:29 — here it is a real TPU feature):
            # within pools of ``batch_size * 8`` shuffled items, sort by
            # cheap-metadata mel length so each batch pads to near its own
            # max instead of the corpus max.  On a corpus with a 100-1000
            # frame spread this roughly halves padded-frame waste AND
            # concentrates batches into far fewer (S, T) bucket shapes
            # (= fewer XLA compiles).  Pool-local sort keeps batches
            # stochastic across epochs; batch order is re-shuffled so the
            # model never sees a short->long curriculum.  Sharding happens
            # BEFORE pooling, so per-host disjointness is unchanged.
            mel_lens = self.ds.mel_lengths()
            pool = self.batch_size * 8
            parts = [
                p[np.argsort(mel_lens[p], kind="stable")]
                for p in (idx[i : i + pool] for i in range(0, len(idx), pool))
            ]
            idx = np.concatenate(parts) if parts else idx
        # Rank-invariant count under drop_last (the sharded training mode).
        # NOTE: drop_last=False with world>1 still emits a SMALLER final
        # batch on high ranks when n % world != 0 (fixed_lengths pads S/T,
        # not the batch dim) — sharded loaders must use drop_last=True.
        nb = len(self)
        chunks = [
            idx[b * self.batch_size : (b + 1) * self.batch_size]
            for b in range(nb)
        ]
        chunks = [c for c in chunks if len(c)]
        if getattr(self.hp, "sort_by_length", False) and self.shuffle:
            rng.shuffle(chunks)
        if self.num_workers > 1 and len(chunks) > 1:
            from .prefetch import prefetch_map

            yield from prefetch_map(
                self._make_batch, chunks, workers=self.num_workers
            )
        else:
            for chunk in chunks:
                yield self._make_batch(chunk)
