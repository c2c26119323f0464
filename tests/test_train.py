"""Training-step tests: loss decreases when overfitting one batch; the
multi-chip (8 virtual CPU devices) path compiles and matches semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.training.train_state import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

TINY = (
    "batch_size=2,symbols_embedding_dim=32,encoder_embedding_dim=32,"
    "attention_rnn_dim=32,decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,"
    "postnet_embedding_dim=32,E=32,ref_enc_gru_size=16,z_latent_dim=4,"
    "ref_enc_filters=[2,2,4,4,8,8],attention_location_n_filters=4,"
    "encoder_n_convolutions=2,postnet_n_convolutions=3,"
    "compute_dtype='float32',anneal_function='constant'"
)


def _batch(hp, B=2, S=12, T=24, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32)
    mel = (rng.randn(B, hp.n_mel_channels, T) * 0.1).astype(np.float32)
    gate = np.zeros((B, T), np.float32)
    gate[:, -1] = 1.0
    return {
        "text": jnp.asarray(text),
        "input_lengths": jnp.full((B,), S, jnp.int32),
        "mel": jnp.asarray(mel),
        "gate": jnp.asarray(gate),
        "output_lengths": jnp.full((B,), T, jnp.int32),
        "emotions": jnp.asarray(
            np.eye(hp.n_emotions, dtype=np.float32)[
                rng.randint(0, hp.n_emotions, size=B)
            ]
        ),
    }


@pytest.fixture(scope="module")
def hp():
    return create_hparams(TINY)


def test_overfit_single_batch(hp):
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    batch = _batch(hp)
    losses = []
    for i in range(80):
        ts, metrics = step(ts, batch, jax.random.PRNGKey(1000 + i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # stochastic (prenet dropout, VAE sampling) but must clearly descend
    assert np.mean(losses[-5:]) < 0.65 * np.mean(losses[:5])


def test_metrics_contents(hp):
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    ts, metrics = step(ts, _batch(hp), jax.random.PRNGKey(0))
    for k in ("loss", "grad_norm", "recon_loss", "kl_loss", "kl_weight"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(ts.step) == 1


def test_eval_step(hp):
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    eval_step = jax.jit(make_eval_step(hp))
    total, aux, out = eval_step(ts, _batch(hp), jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert out.mel_outputs.shape[1] == hp.n_mel_channels


def test_batchnorm_stats_update(hp):
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    before = np.asarray(ts.model_state["encoder"]["bns"][0]["mean"]).copy()
    ts, _ = step(ts, _batch(hp), jax.random.PRNGKey(0))
    after = np.asarray(ts.model_state["encoder"]["bns"][0]["mean"])
    assert not np.allclose(before, after)


def test_nan_guard_skips_update(hp):
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    step = jax.jit(make_train_step(hp))
    batch = _batch(hp)
    bad = dict(batch)
    bad["mel"] = batch["mel"].at[0, 0, 0].set(jnp.nan)
    p_before = np.asarray(ts.params["embedding"]["table"]).copy()
    ts2, metrics = step(ts, bad, jax.random.PRNGKey(0))
    assert not np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(
        np.asarray(ts2.params["embedding"]["table"]), p_before
    )


class TestFP16Run:
    """fp16_run=True: float16 compute + dynamic loss scaling with the
    reference's overflow-skip schedule (fp16_optimizer.py:255-260,
    loss_scaler.py:44-69)."""

    def test_fp16_steps_and_scale_metric(self):
        hp = create_hparams(TINY + ",fp16_run=True")
        # init 2^32 overflows immediately in fp16; a small start scale keeps
        # the test fast while exercising the same code path.
        ts = create_train_state(jax.random.PRNGKey(0), hp)
        assert ts.scaler is not None
        from tacotron2_vae_tpu.training.loss_scaler import DynamicScalerState

        ts = ts._replace(scaler=DynamicScalerState(
            jnp.float32(128.0), jnp.zeros((), jnp.int32)))
        step = jax.jit(make_train_step(hp))
        batch = _batch(hp)
        losses = []
        for i in range(30):
            ts, metrics = step(ts, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert "loss_scale" in metrics
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])  # learning in fp16

    def test_fp16_overflow_halves_scale_and_skips_update(self):
        hp = create_hparams(TINY + ",fp16_run=True")
        ts = create_train_state(jax.random.PRNGKey(0), hp)
        step = jax.jit(make_train_step(hp))
        batch = _batch(hp)
        bad = dict(batch)
        bad["mel"] = batch["mel"].at[0, 0, 0].set(jnp.nan)
        scale0 = float(ts.scaler.scale)
        p_before = np.asarray(ts.params["embedding"]["table"]).copy()
        ts2, metrics = step(ts, bad, jax.random.PRNGKey(0))
        assert float(ts2.scaler.scale) == scale0 / 2  # /2 on overflow
        np.testing.assert_array_equal(
            np.asarray(ts2.params["embedding"]["table"]), p_before
        )  # update skipped

    def test_fp16_scale_grows_after_clean_window(self):
        """The x2-after-window half of the schedule, via the jitted step."""
        hp = create_hparams(TINY + ",fp16_run=True")
        ts = create_train_state(jax.random.PRNGKey(0), hp)
        from tacotron2_vae_tpu.training.loss_scaler import (
            DynamicLossScaler, DynamicScalerState,
        )

        # Window of 3 via a standalone scaler drives the same update rule the
        # step uses; here we check the step carries the state through.
        ts = ts._replace(scaler=DynamicScalerState(
            jnp.float32(64.0), jnp.zeros((), jnp.int32)))
        step = jax.jit(make_train_step(hp))
        batch = _batch(hp)
        iters0 = int(ts.scaler.iters_since_rescale)
        ts, _ = step(ts, batch, jax.random.PRNGKey(0))
        assert int(ts.scaler.iters_since_rescale) == iters0 + 1

    def test_fp16_checkpoint_roundtrip(self, tmp_path):
        from tacotron2_vae_tpu.training.checkpoint import (
            load_checkpoint, save_checkpoint,
        )
        from tacotron2_vae_tpu.training.loss_scaler import DynamicScalerState

        hp = create_hparams(TINY + ",fp16_run=True")
        ts = create_train_state(jax.random.PRNGKey(0), hp)
        ts = ts._replace(scaler=DynamicScalerState(
            jnp.float32(4096.0), jnp.asarray(7, jnp.int32)))
        path = save_checkpoint(ts, hp.learning_rate, str(tmp_path), 3)
        ts2 = create_train_state(jax.random.PRNGKey(1), hp)
        ts2, it, lr = load_checkpoint(path, ts2)
        assert it == 3
        assert float(ts2.scaler.scale) == 4096.0
        assert int(ts2.scaler.iters_since_rescale) == 7


class TestParallel:
    def test_8dev_mesh_train_step(self, hp):
        from tacotron2_vae_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_batch,
            shard_train_state,
        )

        assert len(jax.devices()) == 8
        mesh = make_mesh(data=4, model=2)
        ts = create_train_state(jax.random.PRNGKey(0), hp)
        ts = shard_train_state(ts, mesh)
        pstep = make_parallel_train_step(hp, mesh)
        batch = shard_batch(_batch(hp, B=4), mesh)
        ts, metrics = pstep(ts, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(ts.step) == 1

    def test_parallel_matches_single_chip(self, hp):
        """dp=8 must produce the same loss/grads as single-device (global BN,
        global loss — the sharding is an implementation detail)."""
        from tacotron2_vae_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_batch,
            shard_train_state,
        )

        batch = _batch(hp, B=8)
        rng = jax.random.PRNGKey(7)

        ts1 = create_train_state(jax.random.PRNGKey(0), hp)
        step1 = jax.jit(make_train_step(hp))
        ts1, m1 = step1(ts1, batch, rng)

        mesh = make_mesh(data=8, model=1)
        ts2 = create_train_state(jax.random.PRNGKey(0), hp)
        ts2 = shard_train_state(ts2, mesh)
        step2 = make_parallel_train_step(hp, mesh)
        ts2, m2 = step2(ts2, shard_batch(batch, mesh), rng)

        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
        a = np.asarray(ts1.params["decoder"]["proj"]["w"])
        b = np.asarray(ts2.params["decoder"]["proj"]["w"])
        np.testing.assert_allclose(a, b, atol=1e-4)  # reduction-order noise

    def test_dp8_pallas_shard_map_matches_single_chip(self, hp, monkeypatch):
        """The Pallas training-scan kernels under a dp=8 mesh route through
        shard_map over 'data' (GSPMD can't partition a Mosaic kernel) —
        loss and updated params must match the single-device XLA-scan step.
        Covers: per-device kernel batch, replicated-weight grad psum from
        shard_map's transpose, mask/batch in_specs."""
        from tacotron2_vae_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_batch,
            shard_train_state,
        )

        monkeypatch.setenv("T2V_PALLAS_INTERPRET", "1")
        batch = _batch(hp, B=8)
        rng = jax.random.PRNGKey(7)

        hp_off = hp.replace(use_pallas_train_scan="off")
        ts1 = create_train_state(jax.random.PRNGKey(0), hp_off)
        step1 = jax.jit(make_train_step(hp_off))
        ts1, m1 = step1(ts1, batch, rng)

        hp_on = hp.replace(use_pallas_train_scan="on")
        mesh = make_mesh(data=8, model=1)
        ts2 = create_train_state(jax.random.PRNGKey(0), hp_on)
        ts2 = shard_train_state(ts2, mesh)
        step2 = make_parallel_train_step(hp_on, mesh)
        ts2, m2 = step2(ts2, shard_batch(batch, mesh), rng)

        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
        for name in ("proj", "attention_rnn"):
            key = "w" if name == "proj" else "wi"
            a = np.asarray(ts1.params["decoder"][name][key])
            b = np.asarray(ts2.params["decoder"][name][key])
            np.testing.assert_allclose(a, b, atol=2e-4)

    def test_dp4_tp2_pallas_shard_map_matches_single_chip(self, hp,
                                                          monkeypatch):
        """Pallas training-scan under a (data=4, model=2) mesh: the kernel
        runs replicated across the model axis (scan weights are not
        tensor-parallel) inside shard_map over 'data' — weight grads must
        still equal the single-device step exactly (no tp-fold
        double-counting from shard_map's transpose)."""
        from tacotron2_vae_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_batch,
            shard_train_state,
        )

        monkeypatch.setenv("T2V_PALLAS_INTERPRET", "1")
        batch = _batch(hp, B=8)
        rng = jax.random.PRNGKey(11)

        hp_off = hp.replace(use_pallas_train_scan="off")
        ts1 = create_train_state(jax.random.PRNGKey(0), hp_off)
        ts1, m1 = jax.jit(make_train_step(hp_off))(ts1, batch, rng)

        hp_on = hp.replace(use_pallas_train_scan="on")
        mesh = make_mesh(data=4, model=2)
        ts2 = create_train_state(jax.random.PRNGKey(0), hp_on)
        ts2 = shard_train_state(ts2, mesh)
        step2 = make_parallel_train_step(hp_on, mesh)
        ts2, m2 = step2(ts2, shard_batch(batch, mesh), rng)

        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
        for name, key in (("proj", "w"), ("attention_rnn", "wi")):
            a = np.asarray(ts1.params["decoder"][name][key])
            b = np.asarray(ts2.params["decoder"][name][key])
            np.testing.assert_allclose(a, b, atol=2e-4)

    def test_tp2_matches_single_chip(self, hp):
        """Tensor parallelism (model=2) must be numerically invisible: same
        loss and same updated params as the single-device step (reference
        semantics: distributed grads identical to single-device,
        distributed.py:126-174)."""
        from tacotron2_vae_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_batch,
            shard_train_state,
        )

        batch = _batch(hp, B=4)
        rng = jax.random.PRNGKey(3)

        ts1 = create_train_state(jax.random.PRNGKey(0), hp)
        step1 = jax.jit(make_train_step(hp))
        ts1, m1 = step1(ts1, batch, rng)

        mesh = make_mesh(data=4, model=2)
        ts2 = create_train_state(jax.random.PRNGKey(0), hp)
        ts2 = shard_train_state(ts2, mesh)
        step2 = make_parallel_train_step(hp, mesh)
        ts2, m2 = step2(ts2, shard_batch(batch, mesh), rng)

        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
        for name in ("proj", "gate"):
            a = np.asarray(ts1.params["decoder"][name]["w"])
            b = np.asarray(ts2.params["decoder"][name]["w"])
            np.testing.assert_allclose(a, b, atol=1e-4)
        a = np.asarray(ts1.params["embedding"]["table"])
        b = np.asarray(ts2.params["embedding"]["table"])
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_opt_state_shardings_match_params_structurally(self, hp):
        """Adam mu/nu must get EXACTLY the param's sharding for every leaf —
        matched by tree structure, immune to two params sharing a shape."""
        from tacotron2_vae_tpu.parallel import (
            make_mesh, opt_state_shardings, param_shardings,
        )

        mesh = make_mesh(data=4, model=2)
        ts = create_train_state(jax.random.PRNGKey(0), hp)
        p_shard = param_shardings(ts.params, mesh)
        o_shard = opt_state_shardings(ts.opt_state, ts.params, mesh)
        # optax chain: (clip, weight-decay, adam, scale); adam holds mu/nu.
        adam = None
        for s in o_shard:
            if hasattr(s, "mu"):
                adam = s
                break
        assert adam is not None
        assert jax.tree_util.tree_structure(adam.mu) == \
            jax.tree_util.tree_structure(p_shard)
        flat_p = jax.tree_util.tree_leaves(p_shard)
        for moments in (adam.mu, adam.nu):
            flat_m = jax.tree_util.tree_leaves(moments)
            assert flat_m == flat_p  # NamedSharding equality is semantic

    def test_opt_state_sharding_not_fooled_by_shape_collision(self):
        """Two params with the SAME shape but different specs: structural
        matching keeps each moment on its own param's sharding (the by-shape
        heuristic this replaced degraded both to replicated)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tacotron2_vae_tpu.parallel import make_mesh, opt_state_shardings
        from tacotron2_vae_tpu.parallel.mesh import param_shardings

        mesh = make_mesh(data=4, model=2)
        # prenet w shards P(None, 'model'); a same-shaped decoder LSTM slice
        # stays replicated — craft a params tree hitting both rules.
        params = {
            "prenet": {"l0": {"w": jnp.zeros((16, 16))}},
            "decoder": {"rnn": {"w": jnp.zeros((16, 16))}},
        }
        opt_state = ({"mu": params, "nu": params},)
        o_shard = opt_state_shardings(opt_state, params, mesh)
        p_shard = param_shardings(params, mesh)
        assert p_shard["prenet"]["l0"]["w"].spec == P(None, "model")
        assert p_shard["decoder"]["rnn"]["w"].spec == P()
        assert o_shard[0]["mu"]["prenet"]["l0"]["w"].spec == P(None, "model")
        assert o_shard[0]["mu"]["decoder"]["rnn"]["w"].spec == P()


class TestGradAccumulation:
    """grad_accum_steps: a * micro-batches == one big-batch update."""

    def test_big_batch_gradient_equivalence(self, monkeypatch):
        """With stochasticity neutralized (dropout -> identity, VAE eps -> 0)
        and a batch whose two halves are identical (so batchnorm batch
        statistics agree between micro and full batch), accum=2 must
        produce the SAME gradients as the single big-batch step — including
        the summed-KL rescaling (a micro-batch sums KL over B/2 rows; the
        big batch over B).  The optimizer is swapped for plain SGD(1.0) so
        updated params ARE the gradients: Adam's step-1 update g/|g| is
        scale-invariant (it would hide a wrong KL factor) and amplifies
        float noise on analytically-zero grads (conv biases feeding
        batchnorm) into sign-level differences."""
        import optax

        from tacotron2_vae_tpu.models import decoder as dec_mod
        from tacotron2_vae_tpu.models import encoder as enc_mod
        from tacotron2_vae_tpu.models import postnet as post_mod
        from tacotron2_vae_tpu.training import train_state as ts_mod

        monkeypatch.setattr(
            ts_mod, "make_optimizer", lambda hp, lr=None: optax.scale(-1.0)
        )
        ident = lambda key, x, p, enabled=True: x
        monkeypatch.setattr(dec_mod, "dropout", ident)
        monkeypatch.setattr(enc_mod, "dropout", ident)
        monkeypatch.setattr(post_mod, "dropout", ident)
        real_normal = jax.random.normal
        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
        )
        try:
            hp1 = create_hparams(
                TINY + ",p_attention_dropout=0.0,p_decoder_dropout=0.0,"
                "batch_size=4"
            )
            hp2 = hp1.replace(grad_accum_steps=2)
            half = _batch(hp1, B=2, S=12, T=24, seed=3)
            batch = {k: jnp.concatenate([v, v], axis=0)
                     for k, v in half.items()}

            ts0 = create_train_state(jax.random.PRNGKey(0), hp1)
            rng = jax.random.PRNGKey(42)
            ts1, m1 = jax.jit(make_train_step(hp1))(ts0, batch, rng)
            ts2, m2 = jax.jit(make_train_step(hp2))(ts0, batch, rng)

            assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4, (
                float(m1["loss"]), float(m2["loss"]))
            assert abs(float(m1["kl_loss"]) - float(m2["kl_loss"])) < 1e-3
            # params after SGD(1.0): p - g, identical p0 => grads compare
            for (p0, a, b) in zip(jax.tree_util.tree_leaves(ts0.params),
                                  jax.tree_util.tree_leaves(ts1.params),
                                  jax.tree_util.tree_leaves(ts2.params)):
                g1 = np.asarray(p0) - np.asarray(a)
                g2 = np.asarray(p0) - np.asarray(b)
                scale = max(1e-3, float(np.max(np.abs(g1))))
                # atol floor: analytically-zero grads (conv biases feeding BN)
                # carry ~1e-7 reduction noise against the 1e-3 scale floor;
                # a wrong KL factor shows as O(1) normalized error
                np.testing.assert_allclose(g1 / scale, g2 / scale, atol=5e-4)
        finally:
            monkeypatch.setattr(jax.random, "normal", real_normal)

    def test_accum_training_descends(self):
        hp2 = create_hparams(TINY + ",batch_size=4").replace(
            grad_accum_steps=2)
        ts = create_train_state(jax.random.PRNGKey(0), hp2)
        step = jax.jit(make_train_step(hp2))
        batch = _batch(hp2, B=4)
        losses = []
        for i in range(60):
            ts, metrics = step(ts, batch, jax.random.PRNGKey(2000 + i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < 0.75 * np.mean(losses[:10])

    def test_validation_rejects_bad_accum(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="grad_accum_steps"):
            create_hparams("grad_accum_steps=0")
        with _pytest.raises(ValueError, match="divisible"):
            create_hparams("batch_size=6,grad_accum_steps=4")
