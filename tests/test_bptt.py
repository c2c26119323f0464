"""Hand-written BPTT (models/decoder_bptt.py) vs autodiff: exact gradient
equality on the same forward, plus parity with decoder.teacher_forced."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.models import decoder as dec
from tacotron2_vae_tpu.models import decoder_bptt as bptt

TINY = (
    "symbols_embedding_dim=24,encoder_embedding_dim=24,attention_rnn_dim=16,"
    "decoder_rnn_dim=16,prenet_dim=8,attention_dim=12,"
    "attention_location_n_filters=4,attention_location_kernel_size=7,"
    "compute_dtype='float32'"
)


def _setup(train, B=2, S=9, T=11, K=7):
    hp = create_hparams(TINY)
    rng = np.random.RandomState(0)
    P, H, E, A, F = 8, 16, 24, 12, 4
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    scan_params = {
        "attn_w": r(P + E + H, 4 * H),
        "attn_b": r(4 * H),
        "dec_w": r(H + E + H, 4 * H),
        "dec_b": r(4 * H),
        "query_w": r(H, A),
        "loc_w": r(K, 2, F),
        "loc_dense_w": r(F, A),
        "v_w": r(A, 1),
    }
    prenet_seq = r(T, B, P)
    memory = r(B, S, E)
    pmem = r(B, S, A)
    lengths = jnp.asarray([S, S - 3])
    valid = jnp.arange(S)[None, :] < lengths[:, None]
    add_mask = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
    if train:
        km = jax.random.split(jax.random.PRNGKey(3), 4)
        masks = tuple(
            bptt._dropout_mask(km[i], (T, B, H), 0.9) for i in range(4)
        )
    else:
        ones = jnp.ones((T, 1, 1), jnp.float32)
        masks = (ones, ones, ones, ones)
    cfg = bptt.ScanConfig(0.9, 0.9, train)
    return scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg


@pytest.mark.parametrize("train", [False, True])
def test_custom_vjp_matches_autodiff(train):
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(train)

    def loss_custom(scan_params, prenet_seq, memory, pmem):
        h, c, w = bptt.scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return (jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3))

    def loss_auto(scan_params, prenet_seq, memory, pmem):
        (h, c, w), _ = bptt._fwd_impl(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return (jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3))

    args = (scan_params, prenet_seq, memory, pmem)
    v1, g1 = jax.value_and_grad(loss_custom, argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(loss_auto, argnums=(0, 1, 2, 3))(*args)
    assert abs(float(v1) - float(v2)) < 1e-5

    flat1, tree1 = jax.tree_util.tree_flatten(g1)
    flat2, tree2 = jax.tree_util.tree_flatten(g2)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


@pytest.mark.parametrize("train", [False, True])
def test_pallas_fwd_matches_xla_fwd(train):
    """The Pallas teacher-forced forward kernel (interpret mode) reproduces
    _fwd_impl's ys AND residuals, and grads still match autodiff."""
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(train)
    cfg_p = cfg._replace(use_pallas_fwd=True, pallas_interpret=True)

    ys_x, res_x = bptt._fwd_impl(
        scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
    )
    ys_p, saved = bptt._fwd_rule(
        scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg_p
    )
    res_p = saved[-1]
    for a, b in zip(ys_p, ys_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(res_p, res_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss_pallas(scan_params, prenet_seq, memory, pmem):
        h, c, w = bptt.scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg_p
        )
        return jnp.sum(h ** 2) + jnp.sum(w ** 3)

    def loss_auto(scan_params, prenet_seq, memory, pmem):
        (h, c, w), _ = bptt._fwd_impl(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return jnp.sum(h ** 2) + jnp.sum(w ** 3)

    args = (scan_params, prenet_seq, memory, pmem)
    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_teacher_forced_bptt_matches_reference_path():
    """Forward outputs of the BPTT path equal decoder.teacher_forced
    (dropout off; fp32)."""
    hp = create_hparams(TINY)
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(1)
    B, S, T = 2, 9, 12
    memory = jnp.asarray(rng.randn(B, S, hp.encoder_embedding_dim)
                         .astype(np.float32) * 0.3)
    mels = jnp.asarray(rng.randn(B, hp.n_mel_channels, T).astype(np.float32))
    lengths = jnp.asarray([S, S - 2])

    hp_nodrop = hp.replace(p_attention_dropout=0.0, p_decoder_dropout=0.0)
    mel_a, gate_a, align_a = dec.teacher_forced(
        params, memory, mels, lengths, hp_nodrop, train=False,
        rng=jax.random.PRNGKey(5), dtype=None, prenet_dropout_enabled=False,
    )
    mel_b, gate_b, align_b = bptt.teacher_forced(
        params, memory, mels, lengths, hp_nodrop, train=False,
        rng=jax.random.PRNGKey(5), dtype=None, prenet_dropout_enabled=False,
    )
    np.testing.assert_allclose(np.asarray(mel_b), np.asarray(mel_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_b), np.asarray(gate_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(align_b), np.asarray(align_a), atol=1e-5)


def test_bptt_grads_flow_in_train_mode():
    hp = create_hparams(TINY)
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(1)
    B, S, T = 2, 9, 12
    memory = jnp.asarray(rng.randn(B, S, hp.encoder_embedding_dim)
                         .astype(np.float32) * 0.3)
    mels = jnp.asarray(rng.randn(B, hp.n_mel_channels, T).astype(np.float32))
    lengths = jnp.asarray([S, S - 2])

    def loss(params):
        mel, gate, align = bptt.teacher_forced(
            params, memory, mels, lengths, hp, train=True,
            rng=jax.random.PRNGKey(7), dtype=None,
        )
        return jnp.mean((mel - mels) ** 2) + jnp.mean(gate ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # recurrent weights receive gradient
    assert not np.allclose(np.asarray(grads["attention_rnn"]["wi"]), 0.0)
    assert not np.allclose(np.asarray(grads["attention"]["loc_conv"]["w"]), 0.0)


@pytest.mark.parametrize("train", [False, True])
def test_custom_vjp_matches_autodiff_bf16(train):
    """The bfloat16 compute path (hoisted _cast_w weights, bf16 matmuls with
    fp32 accumulation in BOTH scan directions) matches autodiff of the same
    bf16 forward.  Guards the cast-hoisting: a wrong/missing cast or
    transpose in the bf16 branch is invisible to the fp32 tests."""
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(train)
    cfg = cfg._replace(compute_dtype="bfloat16")

    def loss_custom(scan_params, prenet_seq, memory, pmem):
        h, c, w = bptt.scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3)

    def loss_auto(scan_params, prenet_seq, memory, pmem):
        (h, c, w), _ = bptt._fwd_impl(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3)

    args = (scan_params, prenet_seq, memory, pmem)
    v1, g1 = jax.value_and_grad(loss_custom, argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(loss_auto, argnums=(0, 1, 2, 3))(*args)
    # Forward values are identical (same fwd graph); grads differ only by
    # bf16 rounding order between the hand bwd and autodiff's bwd.
    assert abs(float(v1) - float(v2)) < 1e-5
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 5e-2


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_custom_vjp_recompute_regime(compute_dtype):
    """The large-scan regime (decoder_bptt._recompute_attn: tanh_arg/loc
    recomputed in the backward, dx contracted against UNTRANSPOSED weights,
    compute-dtype residual streams) matches autodiff of the same forward.
    The default tiny shapes land in the save-residuals regime, so this pins
    B*S >= 2048 explicitly (B=2, S=1024, short T)."""
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(
        True, B=2, S=1024, T=4
    )
    cfg = cfg._replace(compute_dtype=compute_dtype)
    assert bptt._recompute_attn(2, 1024, cfg)

    def loss_custom(scan_params, prenet_seq, memory, pmem):
        h, c, w = bptt.scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3)

    def loss_auto(scan_params, prenet_seq, memory, pmem):
        (h, c, w), _ = bptt._fwd_impl(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3)

    args = (scan_params, prenet_seq, memory, pmem)
    v1, g1 = jax.value_and_grad(loss_custom, argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(loss_auto, argnums=(0, 1, 2, 3))(*args)
    assert abs(float(v1) - float(v2)) < 1e-4
    flat1, tree1 = jax.tree_util.tree_flatten(g1)
    flat2, tree2 = jax.tree_util.tree_flatten(g2)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        if compute_dtype == "float32":
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)
        else:
            denom = np.maximum(np.abs(b).max(), 1e-3)
            assert np.abs(a - b).max() / denom < 5e-2


def test_loc_conv_weight_grad_conv_branch_matches_einsum_and_autodiff():
    """The conv_general_dilated branch of _loc_conv_weight_grad only fires
    at flattened batch >= 16384 — exactly the production training regime —
    so pin its ConvDimensionNumbers permutation directly against both the
    einsum branch (same inputs, threshold straddled) and autodiff of
    _loc_conv."""
    K, F, S = 5, 3, 12
    rng = np.random.RandomState(0)

    def run(B):
        w_prev = jnp.asarray(rng.randn(B, S).astype(np.float32))
        w_cum = jnp.asarray(rng.randn(B, S).astype(np.float32))
        dloc = jnp.asarray(rng.randn(B, S, F).astype(np.float32))
        loc_w = jnp.asarray(rng.randn(K, 2, F).astype(np.float32))
        got = np.asarray(bptt._loc_conv_weight_grad(w_prev, w_cum, dloc, K))
        want = np.asarray(jax.grad(
            lambda w: jnp.sum(bptt._loc_conv(w_prev, w_cum, w) * dloc)
        )(loc_w))
        return got, want

    # einsum branch (B < 16384)
    got_small, want_small = run(64)
    np.testing.assert_allclose(got_small, want_small, atol=1e-4, rtol=1e-4)
    # conv branch (B >= 16384): the layout-permutation under test
    got_big, want_big = run(16384)
    np.testing.assert_allclose(
        got_big, want_big,
        atol=5e-3 * float(np.abs(want_big).max()), rtol=2e-4,
    )


@pytest.mark.parametrize("train", [False, True])
def test_pallas_bwd_matches_autodiff(train):
    """The Pallas backward kernel (interpret mode) produces the same
    gradients as autodiff of the XLA forward."""
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(train)
    cfg_p = cfg._replace(use_pallas_bwd=True, pallas_interpret=True)

    def loss_pallas(scan_params, prenet_seq, memory, pmem):
        h, c, w = bptt.scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg_p
        )
        return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3)

    def loss_auto(scan_params, prenet_seq, memory, pmem):
        (h, c, w), _ = bptt._fwd_impl(
            scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg
        )
        return jnp.sum(h ** 2) + jnp.sum(c * 0.5) + jnp.sum(w ** 3)

    args = (scan_params, prenet_seq, memory, pmem)
    v1, g1 = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(loss_auto, argnums=(0, 1, 2, 3))(*args)
    assert abs(float(v1) - float(v2)) < 1e-4
    flat1, tree1 = jax.tree_util.tree_flatten(g1)
    flat2, tree2 = jax.tree_util.tree_flatten(g2)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-4
        )


@pytest.mark.parametrize("which", ["fwd", "bwd", "both"])
def test_pallas_kernels_bf16_stream_dtype(which):
    """bf16 compute_dtype variant of the Pallas kernel parity tests.

    Regression: the backward kernel's fat output streams are declared in
    the stream dtype, so under compute_dtype='bfloat16' the kernel must
    cast on store — storing f32 into a bf16 ref is a trace-time error the
    f32-only tests never hit (it aborted the fwd+bwd variant at B=64 on
    TPU).  Gradients are compared against autodiff of the XLA path run at
    the SAME bf16 compute dtype, with bf16-appropriate tolerances."""
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(True)
    cfg = cfg._replace(compute_dtype="bfloat16")
    cfg_p = cfg._replace(
        use_pallas_fwd=which in ("fwd", "both"),
        use_pallas_bwd=which in ("bwd", "both"),
        pallas_interpret=True,
    )

    def make_loss(c):
        def loss(scan_params, prenet_seq, memory, pmem):
            h, _, w = bptt.scan_core(
                scan_params, prenet_seq, memory, pmem, add_mask, masks, c
            )
            return jnp.sum(h ** 2) + jnp.sum(w ** 3)
        return loss

    args = (scan_params, prenet_seq, memory, pmem)
    v1, g1 = jax.value_and_grad(make_loss(cfg_p), argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(make_loss(cfg), argnums=(0, 1, 2, 3))(*args)
    assert np.isfinite(float(v1)) and abs(float(v1) - float(v2)) < 2e-2 * (
        1.0 + abs(float(v2)))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.all(np.isfinite(a))
        scale = max(1e-3, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-2)


@pytest.mark.parametrize("which", ["fwd", "bwd", "both"])
def test_pallas_kernels_fp16_stream_dtype(which):
    """float16 compute_dtype (fp16_run) through the Pallas kernels,
    interpret mode: kernel gradients must match autodiff of the XLA scan
    run at the SAME fp16 compute dtype.  fp16 has 10 mantissa bits (vs
    bf16's 7) but a narrow exponent — the parity concern is rounding in
    the attention softmax/energy path, exercised here.  (Whether Mosaic
    COMPILES f16 streams on a real chip is a separate gate — see
    pallas_train_scan_enabled's fp16 rule and DESIGN.md.)"""
    scan_params, prenet_seq, memory, pmem, add_mask, masks, cfg = _setup(True)
    cfg = cfg._replace(compute_dtype="float16")
    cfg_p = cfg._replace(
        use_pallas_fwd=which in ("fwd", "both"),
        use_pallas_bwd=which in ("bwd", "both"),
        pallas_interpret=True,
    )

    def make_loss(c):
        def loss(scan_params, prenet_seq, memory, pmem):
            h, _, w = bptt.scan_core(
                scan_params, prenet_seq, memory, pmem, add_mask, masks, c
            )
            return jnp.sum(h ** 2) + jnp.sum(w ** 3)
        return loss

    args = (scan_params, prenet_seq, memory, pmem)
    v1, g1 = jax.value_and_grad(make_loss(cfg_p), argnums=(0, 1, 2, 3))(*args)
    v2, g2 = jax.value_and_grad(make_loss(cfg), argnums=(0, 1, 2, 3))(*args)
    assert np.isfinite(float(v1)) and abs(float(v1) - float(v2)) < 1e-2 * (
        1.0 + abs(float(v2)))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.all(np.isfinite(a))
        scale = max(1e-3, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_pallas_train_scan_resolver(monkeypatch):
    """hp.use_pallas_train_scan: 'on'/'off' force; 'auto' requires a TPU
    backend, the large-scan regime, and a pinned-VMEM estimate in budget;
    T2V_PALLAS_FWD/BWD env vars override the resolved value."""
    hp = create_hparams()  # reference dims

    assert bptt.pallas_train_scan_enabled(hp.replace(
        use_pallas_train_scan="on"), 2, 9)
    assert not bptt.pallas_train_scan_enabled(hp.replace(
        use_pallas_train_scan="off"), 64, 128)

    # 'auto' off-TPU (this CI runs on CPU) -> False even at good geometry
    auto = hp.replace(use_pallas_train_scan="auto")
    expected = jax.default_backend() == "tpu"
    assert bptt.pallas_train_scan_enabled(auto, 64, 128) is expected

    # pretend single-chip TPU: geometry gates
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    assert bptt.pallas_train_scan_enabled(auto, 64, 128)       # validated geo
    assert bptt.pallas_train_scan_enabled(auto, 4, 64)         # small batch
    assert bptt.pallas_train_scan_enabled(auto, 1, 128)        # B=1 wins too
    assert not bptt.pallas_train_scan_enabled(auto, 64, 1024)  # S^2 VMEM blow
    # lane-misaligned dims (custom configs) keep auto off
    tiny_dims = auto.replace(attention_dim=12)
    assert not bptt.pallas_train_scan_enabled(tiny_dims, 64, 128)
    # fp32 streams double the pin; the estimate must account for itemsize
    assert (bptt._pallas_vmem_estimate(hp, 64, 128, 4)
            > 1.7 * bptt._pallas_vmem_estimate(hp, 64, 128, 2))

    # env overrides win in both directions
    monkeypatch.setenv("T2V_PALLAS_FWD", "0")
    assert not bptt._env_flag("T2V_PALLAS_FWD", True)
    monkeypatch.setenv("T2V_PALLAS_FWD", "1")
    assert bptt._env_flag("T2V_PALLAS_FWD", False)
    monkeypatch.delenv("T2V_PALLAS_FWD")
    assert bptt._env_flag("T2V_PALLAS_FWD", True)


def test_use_pallas_train_scan_validation():
    with pytest.raises(ValueError, match="use_pallas_train_scan"):
        create_hparams("use_pallas_train_scan='maybe'")


def test_pallas_auto_off_multichip(monkeypatch):
    """GSPMD cannot partition a Mosaic kernel — 'auto' must stay off when
    more than one device would participate (multi-chip uses the XLA scan)."""
    hp = create_hparams().replace(use_pallas_train_scan="auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 8)
    assert not bptt.pallas_train_scan_enabled(hp, 64, 128)


def test_build_loc_band_matches_scatter_oracle():
    """The one-hot-matmul band construction equals the direct scatter
    definition band[c*L + s + k, s*F + f] = loc_w[k, c, f] (both folded
    and unfolded)."""
    from tacotron2_vae_tpu.ops.pallas.teacher_fwd import build_loc_band

    rng = np.random.RandomState(0)
    K, C, F, A, S = 7, 2, 4, 12, 9
    loc_w = rng.randn(K, C, F).astype(np.float32)
    dense = rng.randn(F, A).astype(np.float32)
    L = S + K - 1

    ref = np.zeros((C * L, S * F), np.float32)
    for c in range(C):
        for s in range(S):
            for k in range(K):
                for f in range(F):
                    ref[c * L + s + k, s * F + f] = loc_w[k, c, f]
    got = np.asarray(build_loc_band(jnp.asarray(loc_w), jnp.asarray(dense),
                                    S, fold_dense=False))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    ref_fold = (ref.reshape(C * L, S, F) @ dense).reshape(C * L, S * A)
    got_fold = np.asarray(build_loc_band(jnp.asarray(loc_w),
                                         jnp.asarray(dense), S))
    np.testing.assert_allclose(got_fold, ref_fold, atol=1e-5)


def test_pallas_auto_off_fp16(monkeypatch):
    """fp16_run streams float16 — unvalidated on the bf16 MXU; auto must
    keep the Mosaic kernels off there (the XLA scan handles fp16)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    hp = create_hparams().replace(use_pallas_train_scan="auto")
    assert bptt.pallas_train_scan_enabled(hp, 64, 128)
    assert not bptt.pallas_train_scan_enabled(
        hp.replace(fp16_run=True), 64, 128)
    assert not bptt.pallas_train_scan_enabled(
        hp.replace(compute_dtype="float16"), 64, 128)


def test_pallas_auto_vmem_ceiling_calibration(monkeypatch):
    """Hardware-calibrated VMEM ceiling: S=128/B=64 (79.9 MiB estimate)
    compiles and wins on v5e; S=160/B=64 (96.5 MiB) fails Mosaic compile
    in the backward kernel — auto must include the former and exclude the
    latter (and very large batches)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    hp = create_hparams().replace(use_pallas_train_scan="auto")
    assert bptt.pallas_train_scan_enabled(hp, 64, 128, 2)
    assert not bptt.pallas_train_scan_enabled(hp, 64, 160, 2)
    assert not bptt.pallas_train_scan_enabled(hp, 128, 128, 2)
