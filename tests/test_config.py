"""Config system tests (reference hparams.py API parity)."""

import pytest

from tacotron2_vae_tpu.config import create_hparams, HParams


def test_defaults_match_reference():
    hp = create_hparams()
    assert hp.batch_size == 64
    assert hp.n_symbols == 80
    assert hp.ref_enc_filters == [32, 32, 64, 64, 128, 128]
    assert hp.ref_enc_gru_size == 256
    assert hp.anneal_function == "logistic"
    assert hp.max_decoder_steps == 1000
    assert hp.learning_rate == 1e-3


def test_string_overrides():
    hp = create_hparams("batch_size=6,learning_rate=0.0005,anneal_function='constant'")
    assert hp.batch_size == 6
    assert hp.learning_rate == 0.0005
    assert hp.anneal_function == "constant"


def test_list_override():
    hp = create_hparams("ref_enc_filters=[16,16,32,32,64,64],batch_size=2")
    assert hp.ref_enc_filters == [16, 16, 32, 32, 64, 64]
    assert hp.batch_size == 2


def test_bool_and_bare_string_override():
    hp = create_hparams("fp16_run=True,distributed_run=false,anneal_function=linear")
    assert hp.fp16_run is True
    assert hp.distributed_run is False
    assert hp.anneal_function == "linear"


def test_unknown_key_raises():
    with pytest.raises(ValueError):
        create_hparams("nonexistent_param=3")


def test_immutability():
    hp = create_hparams()
    with pytest.raises(Exception):
        hp.batch_size = 1  # dataclass is frozen? (replace() is the API)


def test_replace():
    hp = create_hparams().replace(batch_size=2)
    assert hp.batch_size == 2


def test_ref_enc_geometry_overrides_fail_fast():
    """ref_enc_size/strides/pad are config-surface parity keys fixed at the
    reference geometry; silent no-op overrides would be a trap."""
    import pytest
    from tacotron2_vae_tpu.config import create_hparams

    for bad in ("ref_enc_strides=[3,3]", "ref_enc_size=[5,5]",
                "ref_enc_pad=[0,0]"):
        with pytest.raises(ValueError):
            create_hparams(bad)
