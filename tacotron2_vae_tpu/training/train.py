"""Training entry point (CLI parity with reference train.py:253-285).

    python train.py -o outdir -l logdir [--hparams=a=1,b=2] [-c ckpt]
                    [--warm_start]

Single-controller JAX replaces the reference's multiproc.py + NCCL ranks:
all local devices train together through the mesh; multi-host runs call
``jax.distributed.initialize`` once (no per-rank launcher).

Deliberate fix vs the reference: validation logs the *averaged* val loss,
not the last batch's (reference bug at train.py:142-147, noted in SURVEY §3.5).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import create_hparams
from ..data.dataset import DataLoader, TextMelDataset
from ..parallel import make_mesh, make_parallel_train_step, shard_batch, shard_train_state
from .checkpoint import load_checkpoint, save_checkpoint, warm_start as warm_start_fn
from .train_state import create_train_state, make_eval_step
from .loss import tacotron2_vae_loss


def prepare_dataloaders(hp, shard=(0, 1)):
    """Build train/val loaders.  ``shard=(rank, world)`` gives this host a
    disjoint 1/world slice of every epoch's permutation with a per-host
    batch of ``hp.batch_size // world`` (the DistributedSampler equivalent,
    reference train.py:59-60; global batch stays hp.batch_size)."""
    rank, world = shard
    if world > 1 and hp.batch_size % world != 0:
        raise ValueError(
            f"batch_size={hp.batch_size} not divisible by process count {world}"
        )
    per_host_batch = hp.batch_size // world
    trainset = TextMelDataset(hp.training_files, hp)
    valset = TextMelDataset(hp.validation_files, hp, shuffle=False)
    fixed = None
    if world > 1 or getattr(hp, "fixed_batch_shapes", False):
        # All hosts must emit identical batch shapes for the same global
        # step: pad to the dataset-wide maxima (rounded to the buckets).
        import math

        max_s, max_t = trainset.max_lengths()
        fixed = (
            math.ceil(max_s / hp.text_bucket_size) * hp.text_bucket_size,
            math.ceil(max_t / hp.mel_bucket_size) * hp.mel_bucket_size,
        )
    train_loader = DataLoader(trainset, per_host_batch, hp, shuffle=True,
                              shard=shard, fixed_lengths=fixed)
    val_loader = DataLoader(valset, hp.batch_size, hp, shuffle=False, drop_last=False)
    return train_loader, val_loader


def validate(eval_step, ts, val_loader, rng):
    """Eval pass over the whole val set; returns (mean total loss,
    {mean recon_loss, kl_loss}, last (batch, out)).

    The RNG is folded per batch index: prenet dropout stays stochastic in
    eval (reference model.py:101) but each batch must draw DIFFERENT noise —
    reusing one key correlates the val-loss average across batches."""
    losses, recons, kls = [], [], []
    last = None
    for i, batch in enumerate(val_loader.epoch(0)):
        total, aux, out = eval_step(ts, batch.asdict(), jax.random.fold_in(rng, i))
        losses.append(float(total))
        recons.append(float(aux["recon_loss"]))
        kls.append(float(aux["kl_loss"]))
        last = (batch, out)
    if not losses:
        return float("nan"), {"recon_loss": float("nan"),
                              "kl_loss": float("nan")}, last
    return float(np.mean(losses)), {
        "recon_loss": float(np.mean(recons)),
        "kl_loss": float(np.mean(kls)),
    }, last


def maybe_init_distributed():
    """Multi-host: one process per host, rendezvous from env (replaces the
    reference's NCCL TCP rendezvous + multiproc launcher)."""
    import os as _os

    coord = _os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(_os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(_os.environ.get("JAX_PROCESS_ID", "0")),
        )


def train(output_directory, log_directory, checkpoint_path, warm_start, hp):
    os.makedirs(output_directory, exist_ok=True)
    maybe_init_distributed()

    # Data axis must divide the batch; use as many devices as cleanly fit.
    # Multi-host: the device list must take the SAME number of devices from
    # every process (taking jax.devices()[:n] would select only process 0's
    # and make_array_from_process_local_data has nowhere to put the other
    # hosts' rows), so size the data axis per host and interleave.
    import math

    world = jax.process_count()
    model = max(1, hp.mesh_model)
    local_avail = max(1, len(jax.local_devices()) // model)
    if hp.mesh_data not in (-1, None):
        data = hp.mesh_data
    else:
        data = world * math.gcd(hp.batch_size // world, local_avail)
    n_needed = data * model
    if world == 1:
        devices = jax.devices()[:n_needed]
    else:
        if n_needed % world != 0:
            raise ValueError(
                f"mesh size {n_needed} not divisible by process count {world}"
            )
        per = n_needed // world
        by_proc: dict[int, list] = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, []).append(d)
        devices = [d for p in sorted(by_proc) for d in by_proc[p][:per]]
    mesh = make_mesh(devices=devices, data=data, model=model)
    rng = jax.random.PRNGKey(hp.seed)
    rng, init_rng = jax.random.split(rng)

    ts = create_train_state(init_rng, hp)
    learning_rate = hp.learning_rate
    iteration = 0
    if checkpoint_path:
        if warm_start:
            ts = warm_start_fn(checkpoint_path, ts)
        else:
            ts, iteration, saved_lr = load_checkpoint(checkpoint_path, ts)
            if hp.use_saved_learning_rate:
                learning_rate = saved_lr
            iteration += 1

    ts = shard_train_state(ts, mesh)
    train_step = make_parallel_train_step(hp, mesh, learning_rate)
    eval_step = jax.jit(make_eval_step(hp))

    # Per-host data sharding (the DistributedSampler equivalent): each host
    # featurizes only its disjoint 1/world slice of every global batch.
    train_loader, val_loader = prepare_dataloaders(
        hp, shard=(jax.process_index(), jax.process_count())
    )
    epoch_offset = max(0, iteration // max(len(train_loader), 1))

    logger = None
    # Only host 0 logs (reference train.py:71-77 gates the logger on rank 0).
    if log_directory and jax.process_index() == 0:
        from .logger import Tacotron2Logger

        logger = Tacotron2Logger(os.path.join(output_directory, log_directory))

    from collections import deque

    from ..data.prefetch import prefetch

    # Windowed metric fetch (hp.log_fetch_window): the step call is async —
    # fetching its scalars immediately blocks the host for a full tunnel
    # round trip (~150-200 ms against a ~50 ms step; and on a remote-chip
    # link EVERY blocking fetch pays that RTT, computed-or-not, so merely
    # deferring per-step fetches does not help).  Instead, device metric
    # handles queue here and a whole window is packed ON DEVICE into one
    # (K, 5) array by a trivial jitted stack and fetched in a SINGLE
    # transfer: one RTT per K steps instead of per step.  Per-iteration
    # log lines/CSV rows are preserved exactly (reference train.py
    # semantics); they just materialize up to 2*window steps late.
    log_keys = ("loss", "grad_norm", "kl_loss", "kl_weight", "recon_loss")
    window = max(1, hp.log_fetch_window)

    @jax.jit
    def _pack_metrics(ms):
        return jnp.stack(
            [jnp.stack([m[k] for k in log_keys]) for m in ms]
        )

    pending: deque = deque()
    last_log_t = time.perf_counter()

    def drain(n):
        nonlocal last_log_t
        take = [pending.popleft() for _ in range(n)]
        # Pack in fixed window-width chunks (short tails padded by repeating
        # the last handle, sliced off after the fetch): _pack_metrics sees
        # exactly ONE tuple length ever, so the checkpoint-time and final
        # drains reuse the steady-state compile instead of tracing a fresh
        # program (and paying its tunnel RTTs) per distinct drain size.
        rows = []
        for i in range(0, len(take), window):
            chunk = [m for _, m in take[i:i + window]]
            k = len(chunk)
            if k < window:
                chunk = chunk + [chunk[-1]] * (window - k)
            rows.append(np.asarray(_pack_metrics(tuple(chunk)))[:k])
        vals = np.concatenate(rows, axis=0)
        now = time.perf_counter()
        per_step = (now - last_log_t) / n  # wall per step in steady state
        last_log_t = now
        for row, (it, _) in enumerate(take):
            loss = float(vals[row, 0])
            if np.isfinite(loss):
                print(
                    f"Train loss {it} {loss:.6f} Grad Norm "
                    f"{vals[row, 1]:.6f} {per_step:.2f}s/it"
                )
                if logger:
                    logger.log_training(
                        loss, float(vals[row, 1]), learning_rate,
                        per_step, float(vals[row, 2]),
                        float(vals[row, 3]), float(vals[row, 4]), it,
                    )
            else:
                print(f"Train loss {it} non-finite; update skipped")

    # window==1 drains after every append (reference-exact synchrony); any
    # larger window holds 2*window handles so the fetched window's data is
    # long computed by the time its single transfer blocks.
    drain_at = 1 if window == 1 else 2 * window
    for epoch in range(epoch_offset, hp.epochs):
        print(f"Epoch: {epoch}")
        # Featurize + device_put run in a background thread, `prefetch_depth`
        # batches ahead: the host pipeline hides behind device compute.
        for batch in prefetch(
            train_loader.epoch(epoch),
            depth=max(1, hp.prefetch_depth),
            transform=lambda b: shard_batch(b.asdict(), mesh),
        ):
            rng, step_rng = jax.random.split(rng)
            ts, metrics = train_step(ts, batch, step_rng)
            pending.append((iteration, metrics))
            if len(pending) >= drain_at:
                drain(min(window, len(pending)))

            if iteration % hp.iters_per_checkpoint == 0 and iteration > 0:
                if pending:  # sync the log before validating/saving
                    drain(len(pending))
                rng, val_rng = jax.random.split(rng)
                val_loss, val_aux, last = validate(
                    eval_step, ts, val_loader, val_rng
                )
                print(f"Validation loss {iteration}: {val_loss:.6f}")
                if logger and last is not None:
                    vbatch, vout = last
                    logger.log_validation(
                        val_loss, jax.device_get(ts.params), vout,
                        (vbatch.mel, vbatch.gate), iteration,
                        components=val_aux,
                    )
                ckpt = save_checkpoint(ts, learning_rate, output_directory,
                                       iteration)
                print(f"Saved checkpoint: {ckpt}")
                # Don't fold validation+save wall time into the next
                # window's per-step duration average.
                last_log_t = time.perf_counter()
            iteration += 1

    if pending:  # final drain
        drain(len(pending))
    return ts, iteration


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output_directory", type=str, required=True,
                        help="directory to save checkpoints")
    parser.add_argument("-l", "--log_directory", type=str, default="logs",
                        help="directory for tensorboard logs")
    parser.add_argument("-c", "--checkpoint_path", type=str, default=None,
                        help="checkpoint path to resume from")
    parser.add_argument("--warm_start", action="store_true",
                        help="load model weights only")
    # Accepted for CLI parity with the reference launcher; ignored (JAX is
    # single-controller): --n_gpus, --rank, --group_name.
    parser.add_argument("--n_gpus", type=int, default=1)
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--group_name", type=str, default="")
    parser.add_argument("--hparams", type=str, default=None,
                        help="comma separated name=value pairs")
    args = parser.parse_args(argv)

    hp = create_hparams(args.hparams)
    train(args.output_directory, args.log_directory, args.checkpoint_path,
          args.warm_start, hp)


if __name__ == "__main__":
    main()
