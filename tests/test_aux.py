"""Aux subsystem tests: loss scalers, profiling, plotting, symbol types."""

import numpy as np
import jax
import jax.numpy as jnp

from tacotron2_vae_tpu.training.loss_scaler import (
    DynamicLossScaler,
    LossScaler,
    scaled_value_and_grad,
)
from tacotron2_vae_tpu.text.korean import tokenize


def test_static_scaler():
    s = LossScaler(128.0)
    assert float(s.scale_loss(jnp.asarray(2.0))) == 256.0
    grads = {"w": jnp.asarray([128.0, 256.0])}
    out = s.unscale_grads(grads)
    np.testing.assert_allclose(np.asarray(out["w"]), [1.0, 2.0])


def test_dynamic_scaler_schedule():
    d = DynamicLossScaler(init_scale=8.0, scale_window=2)
    st = d.init()
    st = d.update(st, jnp.asarray(False))
    assert float(st.scale) == 8.0
    st = d.update(st, jnp.asarray(False))  # second clean step -> x2
    assert float(st.scale) == 16.0
    st = d.update(st, jnp.asarray(True))  # overflow -> /2
    assert float(st.scale) == 8.0
    for _ in range(40):
        st = d.update(st, jnp.asarray(True))
    assert float(st.scale) == 1.0  # floor


def test_scaled_value_and_grad():
    def loss_fn(x):
        return jnp.sum(x ** 2)

    x = jnp.asarray([1.0, 2.0])
    val, grads, overflow = scaled_value_and_grad(loss_fn, 64.0)(x)
    assert abs(float(val) - 5.0) < 1e-6
    np.testing.assert_allclose(np.asarray(grads), [2.0, 4.0], atol=1e-6)
    assert not bool(overflow)

    bad = jnp.asarray([jnp.inf, 1.0])
    _, _, overflow = scaled_value_and_grad(loss_fn, 64.0)(bad)
    assert bool(overflow)


def test_step_timer():
    from tacotron2_vae_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t:
        pass
    assert t.ema is not None and t.last >= 0
    assert t.throughput(100) > 0


def test_plotting_functions():
    from tacotron2_vae_tpu.utils.plotting import (
        plot_alignment_to_numpy,
        plot_gate_outputs_to_numpy,
        plot_scatter,
        plot_spectrogram_to_numpy,
    )

    rng = np.random.RandomState(0)
    img = plot_alignment_to_numpy(rng.rand(10, 20))
    assert img.ndim == 3 and img.shape[2] == 3
    img = plot_spectrogram_to_numpy(rng.rand(80, 50))
    assert img.ndim == 3
    img = plot_gate_outputs_to_numpy(rng.rand(50), rng.rand(50))
    assert img.ndim == 3
    img = plot_scatter(rng.randn(20, 2), rng.randint(0, 4, 20))
    assert img.ndim == 3


def test_symbol_types_2_3_4():
    # 닭 = ᄃ + ㅏ + tail ㄺ
    assert tokenize("닭", as_id=False, symbol_type=2) == ["ㄷ", "ㅏ", "ㄺ", "~"]
    # type 3 splits compound tails into singles
    assert tokenize("닭", as_id=False, symbol_type=3) == ["ᄃ", "ㅏ", "ㄹ", "ㄱ", "~"]
    # type 4 uses compat leads and split tails
    assert tokenize("닭", as_id=False, symbol_type=4) == ["ㄷ", "ㅏ", "ㄹ", "ㄱ", "~"]
    # double lead ㄲ: type 3/4 split it
    assert tokenize("까", as_id=False, symbol_type=3) == ["ᄀ", "ᄀ", "ㅏ", "~"]
    assert tokenize("까", as_id=False, symbol_type=4) == ["ㄱ", "ㄱ", "ㅏ", "~"]
    # ids are in-range for each inventory
    for st in (1, 2, 3, 4):
        ids = tokenize("닭고기 백 그램", as_id=True, symbol_type=st)
        assert all(isinstance(i, int) for i in ids)


def test_change_symbol_api():
    """change_symbol + symbol_type= selects Korean inventories 1..4
    (reference text/__init__.py::change_symbol, without global mutation)."""
    from tacotron2_vae_tpu.text import (
        change_symbol,
        sequence_to_text,
        text_to_sequence,
    )

    sizes = {st: len(change_symbol(st)) for st in (1, 2, 3, 4)}
    assert sizes[1] == 80  # ALL_SYMBOLS_1 is the 80-symbol default
    assert len(set(sizes.values())) == 4  # inventories genuinely differ
    for st in (1, 2, 3, 4):
        ids = text_to_sequence("닭", ["korean_cleaners"], symbol_type=st)
        assert all(0 <= i < sizes[st] for i in ids)
        rt = sequence_to_text(ids, ["korean_cleaners"], symbol_type=st)
        assert rt.endswith("~")
    # type-3 splits the compound tail -> one more symbol than type-2
    n2 = len(text_to_sequence("닭", ["korean_cleaners"], symbol_type=2))
    n3 = len(text_to_sequence("닭", ["korean_cleaners"], symbol_type=3))
    assert n3 == n2 + 1
    # default (no symbol_type) is inventory 1 — unchanged behavior
    assert text_to_sequence("닭", ["korean_cleaners"]) == text_to_sequence(
        "닭", ["korean_cleaners"], symbol_type=1
    )
    try:
        change_symbol(5)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_add_coords_rank_1_and_3():
    """Rank-1/3 CoordConv coordinate channels (reference CoordConv.py rank
    variants; only rank-2 is used by the model — these are API parity)."""
    from tacotron2_vae_tpu.models.vae_gst import add_coords_1d, add_coords_3d

    x = jnp.zeros((2, 5, 3))
    out = add_coords_1d(x, with_r=True)
    assert out.shape == (2, 5, 3 + 2)
    pos = np.asarray(out[0, :, 3])
    assert np.allclose(pos, np.linspace(-1.0, 1.0, 5))
    assert np.allclose(np.asarray(out[0, :, 4]), np.abs(pos - 0.5))

    x3 = jnp.zeros((1, 2, 3, 4, 1))
    out3 = add_coords_3d(x3, with_r=True)
    assert out3.shape == (1, 2, 3, 4, 1 + 4)
    assert np.allclose(np.asarray(out3[0, :, 0, 0, 1]), [-1.0, 1.0])  # depth
    assert np.allclose(np.asarray(out3[0, 0, :, 0, 2]), [-1.0, 0.0, 1.0])
    assert np.allclose(
        np.asarray(out3[0, 0, 0, :, 3]), np.linspace(-1.0, 1.0, 4)
    )
