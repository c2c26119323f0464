"""English (IEMOCAP-style) pipeline: cleaners, 65-symbol inventory, and a
train step at n_symbols=65 — the reference's english_cleaners configuration."""

import os

import jax
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.data import TextMelDataset
from tacotron2_vae_tpu.dsp.audio import save_wav
from tacotron2_vae_tpu.text import text_to_sequence
from tacotron2_vae_tpu.text.symbols import eng_symbols

TINY = (
    "batch_size=2,symbols_embedding_dim=32,encoder_embedding_dim=32,"
    "attention_rnn_dim=32,decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,"
    "postnet_embedding_dim=32,E=32,ref_enc_gru_size=16,z_latent_dim=4,"
    "ref_enc_filters=[2,2,4,4,8,8],attention_location_n_filters=4,"
    "encoder_n_convolutions=2,postnet_n_convolutions=3,"
    "compute_dtype='float32',anneal_function='constant',"
    "n_symbols=65,text_cleaners=['english_cleaners'],n_emotions=4"
)


def test_english_inventory_is_65():
    assert len(eng_symbols) == 65  # matches reference n_symbols for english


def test_english_ids_in_range():
    seq = text_to_sequence("Dr. Smith paid $3.50 on the 2nd!", ["english_cleaners"])
    assert seq[-1] == 64
    assert all(0 <= i < 65 for i in seq)
    assert len(seq) > 10


def test_english_dataset_and_train_step(tmp_path):
    hp = create_hparams(TINY)
    rng = np.random.RandomState(0)
    lines = []
    for i, text in enumerate(
        ["whose is it", "i ordered some food", "you are the one", "hello there"]
    ):
        wav = (0.3 * np.sin(2 * np.pi * 200 * (i + 1)
                            * np.arange(4000) / 16000)).astype(np.float32)
        p = os.path.join(str(tmp_path), f"en_{i}.wav")
        save_wav(p, wav, 16000)
        lines.append(f"{p}|{text}|7|{i % 4}")
    filelist = os.path.join(str(tmp_path), "en_train.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(lines) + "\n")

    # speaker index 7 like IEMOCAP filelists -> need n_speakers > 7
    hp = hp.replace(training_files=filelist, n_speakers=8)
    ds = TextMelDataset(filelist, hp, shuffle=False)
    text, mel, speaker, emotion = ds[0]
    assert text.max() < 65 and speaker.argmax() == 7

    from tacotron2_vae_tpu.data.dataset import collate
    from tacotron2_vae_tpu.training.train_state import (
        create_train_state,
        make_train_step,
    )

    batch = collate([ds[0], ds[1]], text_bucket=8, mel_bucket=16)
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    ts, metrics = step(ts, batch.asdict(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
