"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): teacher-forced mel frames/sec/chip on the full-size
Tacotron2-VAE model.  Extra context fields ride in the same JSON object:
step latency/MFU at B=64 (r=1 and the r=2/r=3 throughput recipe), device
capability probes + the scan roofline, input-pipeline throughput, serving
RTF (B=1 fused kernel, r=2, and the B=4 batched decode kernel per-stream),
WaveGlow inference RTF at the full NVIDIA size, the stage-sum end-to-end
text->wav RTF (BASELINE.md's < 0.05 target), and the ONE-call
Synthesizer.synthesize() pipeline RTF (text frontend + transfers + decode
+ vocode + wav encode as a single measurement).  The reference publishes no
numbers (BASELINE.md), so vs_baseline is null.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from tacotron2_vae_tpu.config import create_hparams
    from tacotron2_vae_tpu.models import tacotron2
    from tacotron2_vae_tpu.training.train_state import (
        create_train_state,
        make_train_step,
    )

    t_start = time.perf_counter()

    # --- Watchdog state.  The remote-TPU tunnel occasionally leaves a
    # single RPC hung forever (observed: a compile/fetch call parks at 0%
    # CPU with no traffic).  Stdout must still end with ONE JSON line, so:
    #  * every section writes its results into locals that `snapshot()`
    #    reads live (all pre-initialized to None below);
    #  * a daemon thread emits the completed rows and exits if no progress
    #    heartbeat lands for BENCH_STALL_S or the BENCH_DEADLINE_S cap hits;
    #  * if the stall happens before ANY row exists (nothing to lose), it
    #    re-execs the process once — a fresh process gets a fresh tunnel
    #    connection, which in practice clears the hang.
    import threading

    state = {"hb": time.perf_counter(), "emitted": False}
    emit_lock = threading.Lock()

    def hb():
        state["hb"] = time.perf_counter()

    def mark(phase):
        # stderr progress markers (stdout stays the single JSON line):
        # lets an external timeout be attributed to a phase.
        hb()
        print(f"[bench +{time.perf_counter() - t_start:.0f}s] {phase}",
              file=sys.stderr, flush=True)

    # Pre-bind every name snapshot() reads so the watchdog can emit a
    # partial row set from any point of the run.
    B, S, T = 6, 128, 512
    frames_per_sec = dt = None
    frames_per_sec_b64 = dt64 = None
    flops_per_step = mfu_b64 = None
    matmul_tflops = hbm_gbps = None
    mfu_envelope = scan_roofline_ms = scan_stream_gb = None
    frames_per_sec_b64_r2 = mfu_b64_r2 = flops_per_step_r2 = None
    frames_per_sec_b64_r3 = mfu_b64_r3 = flops_per_step_r3 = None
    frames_per_sec_b64_xla_scan = None
    input_cold_fps = input_warm_fps = None
    rtf = rtf_xla = None
    rtf_r2 = rtf_r2_xla = None
    rtf_b4 = None
    wg_infer_rtf = end_to_end_rtf = None
    wg_samples_per_sec = None
    serving_pipeline_rtf = None
    serving_pipeline_audio_secs = None
    serving_pipeline_mode = None
    serving_pipeline_queue_rtf = None

    def snapshot():
        try:
            device_str = str(jax.devices()[0])
        except Exception:
            device_str = None
        return {
            "metric": "mel_frames_per_sec_per_chip",
            "value": round(frames_per_sec, 1) if frames_per_sec else None,
            "unit": "frames/s",
            "vs_baseline": None,
            "train_step_ms": round(dt * 1e3, 2) if dt else None,
            "batch": B,
            "mel_frames": T,
            "frames_per_sec_batch64": (
                round(frames_per_sec_b64, 1) if frames_per_sec_b64 else None),
            "train_step_ms_batch64": round(dt64 * 1e3, 2) if dt64 else None,
            "flops_per_step_batch64": flops_per_step,
            "mfu_batch64": round(mfu_b64, 4) if mfu_b64 else None,
            "mfu_envelope_batch64": (
                round(mfu_envelope, 4) if mfu_envelope else None),
            "matmul_tflops_measured": (
                round(matmul_tflops, 1) if matmul_tflops else None),
            "hbm_gbps_measured": (
                round(hbm_gbps, 1) if hbm_gbps else None),
            "scan_stream_gb_batch64": (
                round(scan_stream_gb, 2) if scan_stream_gb else None),
            "scan_roofline_ms_batch64": (
                round(scan_roofline_ms, 1) if scan_roofline_ms else None),
            "frames_per_sec_batch64_r2": (
                round(frames_per_sec_b64_r2, 1)
                if frames_per_sec_b64_r2 else None),
            "flops_per_step_batch64_r2": flops_per_step_r2,
            "mfu_batch64_r2": (
                round(mfu_b64_r2, 4) if mfu_b64_r2 else None),
            "frames_per_sec_batch64_r3": (
                round(frames_per_sec_b64_r3, 1)
                if frames_per_sec_b64_r3 else None),
            "flops_per_step_batch64_r3": flops_per_step_r3,
            "mfu_batch64_r3": (
                round(mfu_b64_r3, 4) if mfu_b64_r3 else None),
            "frames_per_sec_batch64_xla_scan": (
                round(frames_per_sec_b64_xla_scan, 1)
                if frames_per_sec_b64_xla_scan else None),
            "input_pipeline_fps_cold": (
                round(input_cold_fps, 1) if input_cold_fps else None),
            "input_pipeline_fps_warm": (
                round(input_warm_fps, 1) if input_warm_fps else None),
            "inference_rtf_600_frames": round(rtf, 4) if rtf else None,
            "inference_rtf_xla_while_loop": (
                round(rtf_xla, 4) if rtf_xla else None),
            "inference_rtf_r2": round(rtf_r2, 4) if rtf_r2 else None,
            "inference_rtf_r2_xla": (
                round(rtf_r2_xla, 4) if rtf_r2_xla else None),
            "inference_rtf_b4_batched_per_stream": (
                round(rtf_b4, 4) if rtf_b4 else None),
            "waveglow_infer_rtf": (
                round(wg_infer_rtf, 4) if wg_infer_rtf else None),
            "end_to_end_rtf": (
                round(end_to_end_rtf, 4) if end_to_end_rtf else None),
            "waveglow_train_samples_per_sec": (
                round(wg_samples_per_sec, 1)
                if wg_samples_per_sec else None),
            "serving_pipeline_rtf": (
                round(serving_pipeline_rtf, 4)
                if serving_pipeline_rtf else None),
            "serving_pipeline_audio_secs": (
                round(serving_pipeline_audio_secs, 2)
                if serving_pipeline_audio_secs else None),
            "serving_pipeline_mode": serving_pipeline_mode,
            "serving_pipeline_queue_rtf": (
                round(serving_pipeline_queue_rtf, 4)
                if serving_pipeline_queue_rtf else None),
            "device": device_str,
        }

    def emit():
        with emit_lock:
            if state["emitted"]:
                return
            state["emitted"] = True
        print(json.dumps(snapshot()), flush=True)

    stall_s = float(os.environ.get("BENCH_STALL_S", "420"))
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1800"))

    def watchdog():
        while not state["emitted"]:
            time.sleep(10)
            now = time.perf_counter()
            stalled = now - state["hb"] > stall_s
            over = now - t_start > deadline_s
            if not (stalled or over):
                continue
            if (stalled and frames_per_sec is None
                    and now - t_start < 480
                    and os.environ.get("BENCH_ATTEMPT") != "1"):
                print("[bench watchdog] stalled before any row; re-exec "
                      "for a fresh tunnel connection",
                      file=sys.stderr, flush=True)
                env = dict(os.environ, BENCH_ATTEMPT="1")
                os.execve(sys.executable,
                          [sys.executable, os.path.abspath(__file__)], env)
            print(f"[bench watchdog] "
                  f"{'stall' if stalled else 'deadline'} at "
                  f"+{now - t_start:.0f}s: emitting completed rows",
                  file=sys.stderr, flush=True)
            emit()
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    # Flagship config, reference-recommended batch size (README.md:53).
    hp = create_hparams("batch_size=6")
    rng = np.random.RandomState(0)
    batch = {
        "text": rng.randint(2, hp.n_symbols, size=(B, S)).astype(np.int32),
        "input_lengths": np.full((B,), S, np.int32),
        "mel": (rng.randn(B, hp.n_mel_channels, T) * 0.3).astype(np.float32),
        "gate": np.pad(
            np.zeros((B, T - 1), np.float32), ((0, 0), (0, 1)),
            constant_values=1.0,
        ),
        "output_lengths": np.full((B,), T, np.int32),
        "emotions": np.eye(hp.n_emotions, dtype=np.float32)[
            rng.randint(0, hp.n_emotions, size=B)
        ],
    }
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}

    mark("b6_compile")
    ts = create_train_state(jax.random.PRNGKey(0), hp)
    hb()
    # NOTE: no donate_argnums and no block_until_ready — both misbehave
    # through the axon remote-TPU tunnel (block_until_ready returns before
    # execution finishes).  A 4-byte scalar fetch is the only reliable sync.
    step = jax.jit(make_train_step(hp))

    # Warmup / compile (fetch forces completion).
    ts, metrics = step(ts, batch, jax.random.PRNGKey(0))
    float(metrics["loss"])
    hb()
    for i in range(3):
        ts, metrics = step(ts, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])
    hb()

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, metrics = step(ts, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])  # sync
    dt = (time.perf_counter() - t0) / n_iters
    frames_per_sec = B * T / dt

    # Secondary: throughput at the hparams-default batch size (64) — the
    # realistic TPU training configuration (B=6 is the reference's command).
    B2 = 64
    batch64 = {
        "text": jax.numpy.asarray(
            rng.randint(2, hp.n_symbols, size=(B2, S)).astype(np.int32)),
        "input_lengths": jax.numpy.full((B2,), S, jax.numpy.int32),
        "mel": jax.numpy.asarray(
            (rng.randn(B2, hp.n_mel_channels, T) * 0.3).astype(np.float32)),
        "gate": jax.numpy.asarray(np.pad(
            np.zeros((B2, T - 1), np.float32), ((0, 0), (0, 1)),
            constant_values=1.0)),
        "output_lengths": jax.numpy.full((B2,), T, jax.numpy.int32),
        "emotions": jax.numpy.asarray(np.eye(hp.n_emotions, dtype=np.float32)[
            rng.randint(0, hp.n_emotions, size=B2)]),
    }
    # AOT-compile the B=64 step ONCE: the same executable serves the timing
    # loop and the cost analysis (a second .lower().compile() costs minutes
    # through the remote-compile tunnel and used to eat the soft budget).
    mark("b64_compile")
    ts64 = create_train_state(jax.random.PRNGKey(0), hp)
    hb()
    compiled64 = step.lower(ts64, batch64, jax.random.PRNGKey(0)).compile()
    hb()
    ts64, m64 = compiled64(ts64, batch64, jax.random.PRNGKey(0))
    float(m64["loss"])
    hb()
    t0 = time.perf_counter()
    for i in range(8):
        ts64, m64 = compiled64(ts64, batch64, jax.random.PRNGKey(0))
    float(m64["loss"])
    dt64 = (time.perf_counter() - t0) / 8
    frames_per_sec_b64 = B2 * T / dt64

    # FLOPs + MFU from XLA's own cost model for the compiled B=64 step.
    flops_per_step = None
    mfu_b64 = None
    try:
        ca = compiled64.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    kind = jax.devices()[0].device_kind.lower()
    peak = None
    for key, val in (
        ("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
        ("v6 lite", 918e12), ("v6e", 918e12), ("v4", 275e12),
        ("v3", 123e12), ("v2", 45e12),
    ):
        if key in kind:
            peak = val
            break
    if flops_per_step and peak:
        mfu_b64 = flops_per_step / dt64 / peak

    # --- Device capability probes.  Two rules, both learned the hard way:
    # chain the op inside ONE jit (a single dispatched 4096^3 matmul reads
    # "25 TFLOP/s" — that is tunnel dispatch, not the chip), and measure
    # the SLOPE between two chain lengths (even a chained call carries a
    # fixed ~25 ms dispatch+sync cost through the tunnel; a one-point
    # measurement at K=32 still reads only ~60-90 TFLOP/s).  Slope-based:
    # 186.8 bf16 TFLOP/s (95% of the v5e 197 TF datasheet), 649 GB/s HBM.
    mark("device_probes")
    matmul_tflops = hbm_gbps = None
    mfu_envelope = scan_roofline_ms = scan_stream_gb = None
    try:
        w = jax.numpy.asarray(
            (rng.randn(4096, 4096) * 0.01).astype(np.float32)
        ).astype(jax.numpy.bfloat16)

        def make_matmul_chain(K):
            @jax.jit
            def matmul_chain(x, w):
                def body(x, _):
                    x = jax.numpy.dot(x, w)
                    # renormalize: dodge inf/nan without leaving the MXU path
                    return x * (1.0 / 64.0), None
                x, _ = jax.lax.scan(body, x, None, length=K)
                return x[0, 0].astype(jax.numpy.float32)
            return matmul_chain

        def best_time(fn, *a, reps=4):
            float(fn(*a))  # compile + warm
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fn(*a))
                b = min(b, time.perf_counter() - t0)
            return b

        t16 = best_time(make_matmul_chain(16), w, w)
        t64 = best_time(make_matmul_chain(64), w, w)
        matmul_tflops = 2 * 4096**3 / ((t64 - t16) / 48) / 1e12

        NBYTES = 1 << 29  # 512 MB array
        big = jax.numpy.zeros(NBYTES // 4, jax.numpy.float32)

        def make_stream_chain(S):
            @jax.jit
            def stream_chain(x):
                def body(x, _):
                    return x * 1.0000001 + 1e-9, None
                x, _ = jax.lax.scan(body, x, None, length=S)
                return x[0]
            return stream_chain

        t8 = best_time(make_stream_chain(8), big)
        t40 = best_time(make_stream_chain(40), big)
        hbm_gbps = 2 * NBYTES / ((t40 - t8) / 32) / 1e9

        if flops_per_step and matmul_tflops:
            mfu_envelope = flops_per_step / dt64 / (matmul_tflops * 1e12)

        # Weight-streaming roofline for the sequential decoder scan at
        # B=64/T=512/S=128 (see DESIGN.md "MFU lenses"): per step the scan
        # re-reads the fused LSTM weights (bf16) and the encoder memory /
        # processed-memory activations; the custom BPTT backward recomputes
        # the forward and streams the same weights (transposed) plus the
        # in-scan dW accumulators => ~3x the forward traffic.  NOTE: this
        # bounds the pure XLA scan (frames_per_sec_batch64_xla_scan); the
        # default Pallas training-scan kernels pin the weights in VMEM and
        # run BELOW this floor (that is the point of the kernels).
        H, E, P, A = (hp.attention_rnn_dim, hp.encoder_embedding_dim,
                      hp.prenet_dim, hp.attention_dim)
        F = hp.attention_location_n_filters
        bf2 = 2  # bf16 bytes
        w_bytes = (
            (P + E + H) * 4 * H + (H + E + H) * 4 * H  # fused LSTMs
            + H * A + hp.attention_location_kernel_size * 2 * F
            + F * A + E * A                            # query/loc/memory
        ) * bf2
        act_bytes = (B2 * S * E + B2 * S * A) * bf2    # memory + processed
        per_step = w_bytes + act_bytes
        steps = T // hp.n_frames_per_step
        scan_stream_gb = 3 * per_step * steps / 1e9
        if hbm_gbps:
            scan_roofline_ms = scan_stream_gb / hbm_gbps * 1e3
    except Exception:
        import traceback

        traceback.print_exc()

    # Capability extension: n_frames_per_step=2 (r>1 is unsupported in the
    # reference, hparams.py:87) halves the sequential scan length — the
    # dominant step cost — for a large opt-in throughput win.
    mark("r2_train")
    frames_per_sec_b64_r2 = mfu_b64_r2 = flops_per_step_r2 = None
    if time.perf_counter() - t_start < float(
        os.environ.get("BENCH_BUDGET_S", "520")
    ):
        try:
            hp2 = create_hparams("batch_size=64,n_frames_per_step=2")
            step2_fn = jax.jit(make_train_step(hp2))
            ts2 = create_train_state(jax.random.PRNGKey(0), hp2)
            # AOT compile: the executable serves timing AND cost analysis
            # (r=2 is the documented throughput recipe — its MFU is the
            # flagship number, see DESIGN.md "throughput recipe").
            compiled2 = step2_fn.lower(
                ts2, batch64, jax.random.PRNGKey(0)).compile()
            ts2, m2 = compiled2(ts2, batch64, jax.random.PRNGKey(0))
            float(m2["loss"])
            t0 = time.perf_counter()
            for i in range(8):
                ts2, m2 = compiled2(ts2, batch64, jax.random.PRNGKey(0))
            float(m2["loss"])
            dt_r2 = (time.perf_counter() - t0) / 8
            frames_per_sec_b64_r2 = B2 * T / dt_r2
            try:
                ca2 = compiled2.cost_analysis()
                ca2 = ca2[0] if isinstance(ca2, (list, tuple)) else ca2
                flops_per_step_r2 = float(ca2.get("flops", 0.0)) or None
            except Exception:
                pass
            if flops_per_step_r2 and peak:
                mfu_b64_r2 = flops_per_step_r2 / dt_r2 / peak
            del ts2
        except Exception:
            import traceback

            traceback.print_exc()
    # n_frames_per_step=3: the far end of the reduction-factor recipe
    # (r=2 is the documented default recipe; r=3 trades a little attention
    # resolution for another scan-length cut).  T rounds down to 510 — the
    # mel length must be a multiple of r (models/decoder.py:94).
    mark("r3_train")
    frames_per_sec_b64_r3 = mfu_b64_r3 = flops_per_step_r3 = None
    if time.perf_counter() - t_start < float(
        os.environ.get("BENCH_BUDGET_S", "520")
    ):
        try:
            T3 = 510
            batch64_r3 = dict(batch64)
            batch64_r3["mel"] = batch64["mel"][:, :, :T3]
            batch64_r3["gate"] = jax.numpy.concatenate(
                [batch64["gate"][:, : T3 - 1],
                 jax.numpy.ones((B2, 1), batch64["gate"].dtype)], axis=1)
            batch64_r3["output_lengths"] = jax.numpy.full(
                (B2,), T3, jax.numpy.int32)
            hp3 = create_hparams("batch_size=64,n_frames_per_step=3")
            step3_fn = jax.jit(make_train_step(hp3))
            ts3 = create_train_state(jax.random.PRNGKey(0), hp3)
            compiled3 = step3_fn.lower(
                ts3, batch64_r3, jax.random.PRNGKey(0)).compile()
            ts3, m3 = compiled3(ts3, batch64_r3, jax.random.PRNGKey(0))
            float(m3["loss"])
            t0 = time.perf_counter()
            for i in range(8):
                ts3, m3 = compiled3(ts3, batch64_r3, jax.random.PRNGKey(0))
            float(m3["loss"])
            dt_r3 = (time.perf_counter() - t0) / 8
            frames_per_sec_b64_r3 = B2 * T3 / dt_r3
            try:
                ca3 = compiled3.cost_analysis()
                ca3 = ca3[0] if isinstance(ca3, (list, tuple)) else ca3
                flops_per_step_r3 = float(ca3.get("flops", 0.0)) or None
            except Exception:
                pass
            if flops_per_step_r3 and peak:
                mfu_b64_r3 = flops_per_step_r3 / dt_r3 / peak
            del ts3, batch64_r3
        except Exception:
            import traceback

            traceback.print_exc()

    # Delta documentation: the same B=64 step with the Pallas training-scan
    # kernels forced off (pure XLA scan) — the default ("auto") engages them
    # on this chip, so this quantifies what the VMEM weight-pinning buys.
    mark("xla_scan_variant")
    frames_per_sec_b64_xla_scan = None
    if time.perf_counter() - t_start < float(
        os.environ.get("BENCH_BUDGET_S", "520")
    ):
        try:
            hp_xla = create_hparams(
                "batch_size=64,use_pallas_train_scan='off'")
            step_x = jax.jit(make_train_step(hp_xla))
            ts_x = create_train_state(jax.random.PRNGKey(0), hp_xla)
            ts_x, m_x = step_x(ts_x, batch64, jax.random.PRNGKey(0))
            float(m_x["loss"])
            t0 = time.perf_counter()
            for i in range(8):
                ts_x, m_x = step_x(ts_x, batch64, jax.random.PRNGKey(i))
            float(m_x["loss"])
            frames_per_sec_b64_xla_scan = (
                B2 * T / ((time.perf_counter() - t0) / 8))
            del ts_x
        except Exception:
            import traceback

            traceback.print_exc()

    del ts64, batch64

    # Host input pipeline: featurize->collate throughput on synthetic wavs
    # (4 distinct lengths => 4 STFT compiles), cold (wav decode + STFT +
    # cache write) then warm (np.load from the write-once mel cache).  The
    # pipeline must outrun the device step or the chip starves.
    mark("input_pipeline")
    input_cold_fps = input_warm_fps = None
    try:
        import tempfile

        from tacotron2_vae_tpu.data import DataLoader, TextMelDataset
        from tacotron2_vae_tpu.data.prefetch import prefetch
        from tacotron2_vae_tpu.dsp.audio import save_wav

        tmpd = tempfile.mkdtemp(prefix="bench_data_")
        # 4 batches of 64: enough for the num_workers batch-assembly pool
        # to overlap batches (1 batch/epoch would degenerate to serial).
        n_items, sr = 256, hp.sampling_rate
        lengths_s = [4.0, 5.5, 7.0, 8.5]
        lines = []
        total_frames = 0
        for i in range(n_items):
            n = int(lengths_s[i % 4] * sr)
            t = np.arange(n) / sr
            wav = (0.3 * np.sin(2 * np.pi * (120 + 3 * i) * t)).astype(
                np.float32)
            p = os.path.join(tmpd, f"b{i:03d}.wav")
            save_wav(p, wav, sr)
            total_frames += n // hp.hop_length + 1
            lines.append(f"{p}|벤치마크 입력 파이프라인 문장 {i}|0|{i % 4}")
        filelist = os.path.join(tmpd, "bench.txt")
        with open(filelist, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")

        ds = TextMelDataset(filelist, hp, shuffle=False)
        dl = DataLoader(ds, 64, hp, shuffle=False, drop_last=False)
        t0 = time.perf_counter()
        for _ in prefetch(dl.epoch(0), depth=2):
            pass
        input_cold_fps = total_frames / (time.perf_counter() - t0)
        # Warm path = np.load + native collate through the num_workers pool.
        # The 1-2 epochs right after featurization are 3-10x slower than
        # steady state (dirty-page writeback of the just-written cache +
        # first-touch length scans / tokenize memoization) — a once-per-
        # corpus transient, not the regime training runs in.  One untimed
        # settle epoch, then the median of 5 timed epochs.
        for _ in prefetch(dl.epoch(1), depth=2):
            pass
        warm_times = []
        for rep in range(5):
            t0 = time.perf_counter()
            for _ in prefetch(dl.epoch(2 + rep), depth=2):
                pass
            warm_times.append(time.perf_counter() - t0)
        input_warm_fps = total_frames / sorted(warm_times)[2]
    except Exception:
        import traceback

        traceback.print_exc()

    # Secondary: autoregressive inference RTF (mel frames vs realtime audio).
    mark("serving_rtf")
    params, state = ts.params, ts.model_state
    text = jax.numpy.asarray(
        rng.randint(2, hp.n_symbols, size=(1, 64)).astype(np.int32)
    )
    style = jax.numpy.zeros((1, hp.E))

    def time_synth(use_pallas):
        def synth(params, state, text, style, rng):
            # gate_threshold > 1 can never fire: forces the full 600 decoder
            # steps so the RTF is an upper bound (a trained gate stops earlier).
            return tacotron2.infer(
                params, state, text, style, hp, rng=rng, max_steps=600,
                gate_threshold=1.1, prenet_dropout_enabled=True,
                use_pallas=use_pallas,
            )

        synth_j = jax.jit(synth)
        out = synth_j(params, state, text, style, jax.random.PRNGKey(0))
        float(out[4][0])  # sync on the lengths output
        hb()
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            out = synth_j(params, state, text, style, jax.random.PRNGKey(i))
            float(out[4][0])
        return (time.perf_counter() - t0) / reps

    n_frames = 600  # buffer length (upper bound on generated frames)
    audio_secs = n_frames * hp.hop_length / hp.sampling_rate  # 9.6 s
    rtf_xla = time_synth(False) / audio_secs
    # The fused Pallas kernel compiles slowly through the remote-TPU tunnel
    # on a cold cache; skip it if the soft budget is already spent (the JSON
    # line must be printed before any external timeout).
    budget = float(os.environ.get("BENCH_BUDGET_S", "520"))
    rtf = rtf_xla
    if time.perf_counter() - t_start < budget:
        try:
            rtf = time_synth(True) / audio_secs  # fused Pallas decode loop
        except Exception:
            rtf = rtf_xla

    # r=2 serving: half the sequential decode steps for the same audio
    # (r>1 is unsupported in the reference, hparams.py:87).  600 decoder
    # steps at r=2 = 1200 frames = 19.2 s of audio.  Measures both the XLA
    # while_loop path and the fused Pallas kernel (r-generic since round 3).
    mark("serving_rtf_r2")
    rtf_r2 = rtf_r2_xla = None
    if time.perf_counter() - t_start < budget:
        try:
            hp_r2 = create_hparams("n_frames_per_step=2")
            from tacotron2_vae_tpu.models import tacotron2 as t2

            params2, state2 = t2.init(jax.random.PRNGKey(0), hp_r2)
            audio_secs_r2 = 600 * 2 * hp.hop_length / hp.sampling_rate

            def time_synth_r2(use_pallas):
                def synth_r2(params, state, text, style, rng):
                    return t2.infer(
                        params, state, text, style, hp_r2, rng=rng,
                        max_steps=600, gate_threshold=1.1,
                        prenet_dropout_enabled=True, use_pallas=use_pallas,
                    )

                synth_j = jax.jit(synth_r2)
                out2 = synth_j(params2, state2, text, style,
                               jax.random.PRNGKey(0))
                float(out2[4][0])
                t0 = time.perf_counter()
                for i in range(3):
                    out2 = synth_j(params2, state2, text, style,
                                   jax.random.PRNGKey(i))
                    float(out2[4][0])
                return (time.perf_counter() - t0) / 3 / audio_secs_r2

            rtf_r2_xla = time_synth_r2(False)
            rtf_r2 = rtf_r2_xla
            if time.perf_counter() - t_start < budget:
                try:
                    rtf_r2 = min(rtf_r2, time_synth_r2(True))
                except Exception:
                    pass
        except Exception:
            import traceback

            traceback.print_exc()

    # Batched fused serving decode: 4 concurrent streams through ONE Pallas
    # decode kernel (the serving micro-batch queue's path, app.py).  The
    # per-stream wall RTF should sit far under 4x the sequential B=1 RTF —
    # the step is weight-stream/latency-bound, so 4 rows ride almost free.
    mark("serving_rtf_b4")
    rtf_b4 = None
    if time.perf_counter() - t_start < budget:
        try:
            text4 = jax.numpy.asarray(
                rng.randint(2, hp.n_symbols, size=(4, 64)).astype(np.int32))
            style4 = jax.numpy.zeros((4, hp.E))

            def synth_b4(params, state, text, style, rng):
                return tacotron2.infer(
                    params, state, text, style, hp, rng=rng, max_steps=600,
                    gate_threshold=1.1, prenet_dropout_enabled=True,
                    use_pallas=True,
                )

            synth4_j = jax.jit(synth_b4)
            out4 = synth4_j(params, state, text4, style4,
                            jax.random.PRNGKey(0))
            float(out4[4][0])
            t0 = time.perf_counter()
            for i in range(3):
                out4 = synth4_j(params, state, text4, style4,
                                jax.random.PRNGKey(i))
                float(out4[4][0])
            rtf_b4 = (time.perf_counter() - t0) / 3 / audio_secs
        except Exception:
            import traceback

            traceback.print_exc()

    # WaveGlow vocoder INFERENCE RTF at the full NVIDIA size (12 flows x
    # 8 layers x 256 ch, random weights — timing is weight-value-agnostic)
    # on the same 600-frame mel, and the TRUE end-to-end text->wav RTF =
    # text->mel RTF + mel->wav RTF over the same 9.6 s of audio.  This is
    # the reference's actual serving cost (synthesizer.py:163 vocodes every
    # request) and BASELINE.md's < 0.05 target metric.
    mark("waveglow_infer")
    wg_infer_rtf = end_to_end_rtf = None
    if time.perf_counter() - t_start < budget:
        try:
            from tacotron2_vae_tpu.models import waveglow as wgm

            wg_cfg = wgm.WaveGlowConfig()
            wg_p = wgm.init(jax.random.PRNGKey(0), wg_cfg)
            mel600 = jax.numpy.asarray(
                (rng.randn(1, 80, 600) * 0.3).astype(np.float32))
            wav = wgm.infer(wg_p, mel600, wg_cfg, sigma=0.666,
                            key=jax.random.PRNGKey(0),
                            dtype_name="bfloat16")
            float(wav[0, 0])
            hb()
            t0 = time.perf_counter()
            for i in range(3):
                wav = wgm.infer(wg_p, mel600, wg_cfg, sigma=0.666,
                                key=jax.random.PRNGKey(i),
                                dtype_name="bfloat16")
                float(wav[0, 0])
            wg_infer_rtf = (time.perf_counter() - t0) / 3 / audio_secs
            end_to_end_rtf = rtf + wg_infer_rtf
            del wg_p
        except Exception:
            import traceback

            traceback.print_exc()

    # WaveGlow vocoder TRAINING throughput (the reference never trains its
    # vocoder; full NVIDIA-size config: 12 flows x 8 layers x 256 ch).
    mark("waveglow_train")
    wg_samples_per_sec = None
    if time.perf_counter() - t_start < budget:
        try:
            import optax

            from tacotron2_vae_tpu.models import waveglow as wgm

            wg_cfg = wgm.WaveGlowConfig()
            wg_params = wgm.init(jax.random.PRNGKey(0), wg_cfg)
            wg_opt = optax.chain(optax.clip_by_global_norm(1.0),
                                 optax.adam(1e-4))
            wg_os = wg_opt.init(wg_params)
            wg_step = jax.jit(wgm.make_waveglow_train_step(wg_cfg, wg_opt))
            BW, SEG = 8, 16000
            frames = SEG // 256 + 1
            wg_audio = jax.numpy.asarray(
                (rng.randn(BW, SEG) * 0.1).astype(np.float32))
            wg_mel = jax.numpy.asarray(
                (rng.randn(BW, 80, frames) * 0.3).astype(np.float32))
            wg_os, wg_params, wl = wg_step(wg_os, wg_params, wg_audio, wg_mel)
            float(wl)
            hb()
            t0 = time.perf_counter()
            for _ in range(5):
                wg_os, wg_params, wl = wg_step(wg_os, wg_params, wg_audio,
                                               wg_mel)
            float(wl)
            wg_samples_per_sec = BW * SEG / ((time.perf_counter() - t0) / 5)
            del wg_params, wg_os, wg_audio, wg_mel
        except Exception:
            import traceback

            traceback.print_exc()

    # ONE-call serving pipeline RTF: Synthesizer.synthesize() wall clock —
    # text string in, wav file out — including the text frontend, host->
    # device transfers, the autoregressive decode, sigma=0.666 WaveGlow
    # vocoding, device->host fetch, and wav encode.  This is the
    # reference's actual request path (app.py:101-129 ->
    # synthesizer.py:112-168) timed as one measurement, complementing the
    # stage-sum `end_to_end_rtf` above.  Uses trained artifacts when
    # available (T2V_PIPELINE_CKPT / T2V_PIPELINE_WAVEGLOW env vars or the
    # curve-run workdir) so the gate stops at real speech length; falls
    # back to random-init weights with a forced 600-step decode (an upper
    # bound — a trained gate stops earlier).
    mark("serving_pipeline")
    serving_pipeline_rtf = None
    serving_pipeline_audio_secs = None
    serving_pipeline_mode = None
    serving_pipeline_queue_rtf = None
    try:
        import tempfile

        from tacotron2_vae_tpu.dsp.audio import load_wav
        from tacotron2_vae_tpu.serving.synthesizer import Synthesizer

        ckpt = os.environ.get("T2V_PIPELINE_CKPT")
        if not ckpt:
            # latest checkpoint from the curve-run workdir, whatever its
            # step count (the horizon is T2V_STEPS_TARGET-configurable)
            import glob as _glob

            cands = _glob.glob("/tmp/t2v_curves/out/checkpoint_*")
            cands = [c for c in cands if c.rsplit("_", 1)[-1].isdigit()]
            ckpt = (max(cands, key=lambda c: int(c.rsplit("_", 1)[-1]))
                    if cands else "/tmp/t2v_curves/out/checkpoint_50000")
        wg_path = os.environ.get(
            "T2V_PIPELINE_WAVEGLOW", "/tmp/t2v_curves/waveglow_export.pkl")
        syn = Synthesizer()
        if os.path.isdir(ckpt):
            syn.load(ckpt, wg_path if os.path.exists(wg_path) else None)
            serving_pipeline_mode = (
                "trained" if syn.waveglow is not None else "trained_no_wg")
        else:
            # No trained artifacts on this host: random weights, decode
            # length forced to the full 600-step buffer (gate can't fire).
            from tacotron2_vae_tpu.models import tacotron2 as t2m
            from tacotron2_vae_tpu.models import waveglow as wgm2

            syn.hparams = syn.hparams.replace(gate_threshold=1.1)
            p0, s0 = t2m.init(jax.random.PRNGKey(0), syn.hparams)
            syn.params = jax.device_put(p0)
            syn.model_state = jax.device_put(s0)
            syn.waveglow = jax.device_put(
                wgm2.init(jax.random.PRNGKey(1), syn.waveglow_cfg))
            serving_pipeline_mode = "random_forced_600"
        text = "감정을 담아 말하는 음성 합성 시스템의 전체 경로를 측정합니다."
        out_wav = os.path.join(
            tempfile.mkdtemp(prefix="bench_pipe_"), "out.wav")
        ratios = [1.0, 0.0, 0.0, 0.0]
        syn.synthesize(text, out_wav, False, None, ratios)  # compile
        hb()
        reps, walls = 3, []
        for _ in range(reps):
            t0 = time.perf_counter()
            syn.synthesize(text, out_wav, False, None, ratios)
            walls.append(time.perf_counter() - t0)
        wav_out, sr_out = load_wav(out_wav)
        serving_pipeline_audio_secs = len(wav_out) / sr_out
        serving_pipeline_rtf = (
            sorted(walls)[reps // 2] / serving_pipeline_audio_secs)
        # Same request THROUGH the HTTP micro-batch queue: the adaptive
        # window (serving/app.py) serves a lone request at an idle server
        # immediately, so this should match the direct call (the pre-round-5
        # fixed window added +10 ms here).  Not budget-gated: this row is a
        # round-5 deliverable and its one compile (the B=1 batched decode)
        # rides the persistent .jax_cache after the first bench run.
        mark("serving_pipeline_queue")
        from tacotron2_vae_tpu.serving.app import MicroBatcher

        mb = MicroBatcher(
            lambda reqs: syn.synthesize_batch(reqs), max_batch=4)
        req = (text, out_wav, False, None, ratios)
        mb.submit(req)  # compile the B=1 batched path
        hb()
        walls_q = []
        for _ in range(reps):
            t0 = time.perf_counter()
            mb.submit(req)
            walls_q.append(time.perf_counter() - t0)
        serving_pipeline_queue_rtf = (
            sorted(walls_q)[reps // 2] / serving_pipeline_audio_secs)
        del syn
    except Exception:
        import traceback

        traceback.print_exc()

    mark("emit")
    emit()


if __name__ == "__main__":
    sys.exit(main())
