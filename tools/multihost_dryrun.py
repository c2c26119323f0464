#!/usr/bin/env python
"""Two-process CPU dryrun of the REAL multi-host training path.

Executes what single-process tests cannot: `jax.distributed.initialize`
rendezvous, the global (data, model) mesh spanning two processes, the
DataLoader's per-host (rank, world) slicing + `fixed_lengths` all-hosts-
same-shape contract (training/train.py:44-54), and `shard_batch`'s
`jax.make_array_from_process_local_data` branch (parallel/mesh.py:117-121)
— the single-controller replacement for the reference's NCCL DDP ranks
(/root/reference/distributed.py:126-174, train.py:38-50).

Launched twice (process_id 0 and 1) by tests/test_multihost.py, or by
hand:

    python tools/multihost_dryrun.py --make-corpus --workdir /tmp/mh
    python tools/multihost_dryrun.py --process_id 0 --workdir /tmp/mh &
    python tools/multihost_dryrun.py --process_id 1 --workdir /tmp/mh

Each process owns 4 virtual CPU devices (8 global); the global batch of 4
splits 2 rows per host; both processes must print identical per-step
global losses.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = (
    "batch_size=4,symbols_embedding_dim=32,encoder_embedding_dim=32,"
    "attention_rnn_dim=32,decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,"
    "postnet_embedding_dim=32,E=32,ref_enc_gru_size=16,z_latent_dim=4,"
    "ref_enc_filters=[2,2,4,4,8,8],attention_location_n_filters=4,"
    "encoder_n_convolutions=2,postnet_n_convolutions=3,"
    "compute_dtype='float32',anneal_function='constant',"
    "text_bucket_size=8,mel_bucket_size=16,epochs=2,iters_per_checkpoint=10000,"
    "fixed_batch_shapes=True"  # same padded widths at world=1 and world=2
)

TEXTS = [
    "감정있는 한국어 목소리",
    "안녕하세요 반갑습니다",
    "오늘 날씨가 좋네요",
    "테스트 문장입니다",
    "다중 호스트 학습",
    "데이터 병렬 처리",
    "멜 캐시 샤딩",
    "티피유 네이티브",
]


def make_corpus(workdir: str) -> str:
    import numpy as np

    from tacotron2_vae_tpu.dsp.audio import save_wav

    os.makedirs(workdir, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i, text in enumerate(TEXTS):
        n = 4000 + 800 * (i % 4)
        wav = (0.3 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(n) / 16000)
               + 0.01 * rng.randn(n)).astype(np.float32)
        path = os.path.join(workdir, f"utt_{i}.wav")
        save_wav(path, wav, 16000)
        lines.append(f"{path}|{text}|0|{i % 4}")
    flist = os.path.join(workdir, "train.txt")
    with open(flist, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return flist


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--make-corpus", action="store_true")
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--coordinator", default="localhost:17355")
    p.add_argument("--workdir", required=True)
    p.add_argument("--local_devices", type=int, default=4)
    args = p.parse_args()

    if args.make_corpus:
        make_corpus(args.workdir)
        print("corpus ready")
        return

    # Virtual CPU devices must be configured before the backend initializes;
    # the site config pins the TPU plugin via env, so force CPU through the
    # config API (JAX_PLATFORMS env is ignored in this environment).
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    # train() reads the rendezvous from env (maybe_init_distributed).
    os.environ["JAX_COORDINATOR_ADDRESS"] = args.coordinator
    os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
    os.environ["JAX_PROCESS_ID"] = str(args.process_id)

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.training.train import train

    flist = os.path.join(args.workdir, "train.txt")
    hp = create_hparams(
        TINY + f",training_files={flist},validation_files={flist}"
    )
    out = os.path.join(args.workdir, "out")
    _ts, it = train(out, "", None, False, hp)
    print(
        f"MULTIHOST OK pid={jax.process_index()}/{jax.process_count()} "
        f"devices={len(jax.devices())} local={len(jax.local_devices())} "
        f"iters={it}"
    )


if __name__ == "__main__":
    main()
