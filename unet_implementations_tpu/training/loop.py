"""Epoch-level orchestration: the reference trainers' contract, one loop.

Per-epoch contract (identical in all four reference trainers,
``Our_UNet/src/train.py:914-984``): set epoch LR → train epoch → full
validation pass → print + append CSV row → best-model check (mean foreground
Dice for segmentation, val loss for AE) → checkpoint every ``save_every``
epochs or on new best → early stopping.

Emits the same artifacts: ``training_config.json`` (dumped at start),
``training_log.csv`` with the reference headers, ``checkpoints/epoch_{N}``
and ``best_model`` Orbax directories.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from unet_implementations_tpu.parallel import (
    replicate,
    shard_batch,
    shard_batch_spatial,
)
from unet_implementations_tpu.parallel.spatial import SPACE_AXIS
from unet_implementations_tpu.training.checkpoint import save_checkpoint
from unet_implementations_tpu.training.early_stopping import EarlyStopping
from unet_implementations_tpu.training.train_state import (
    TrainState,
    set_learning_rate,
)

# Batch leaves the jitted steps actually read; the loader's bookkeeping
# leaves (index, original_dims, ...) stay host-side — device-putting them
# every step would be dead H2D transfer.
_DEVICE_KEYS = ("image", "mask", "target", "clip_features", "clip_image")


def _shard_fn(mesh):
    """Batch-sharding dispatch: a mesh with a ``space`` axis lays image rows
    on it (spatial training); otherwise plain data-parallel sharding."""
    put = (shard_batch_spatial
           if mesh is not None and SPACE_AXIS in mesh.axis_names
           else shard_batch)

    def shard(batch):
        return put({k: v for k, v in batch.items() if k in _DEVICE_KEYS},
                   mesh)

    return shard


SEG_CSV_HEADER = (
    "epoch,train_loss,val_loss,dice_background,dice_cat,dice_dog,"
    "dice_mean_foreground,learning_rate,epoch_time"
)
AE_CSV_HEADER = "epoch,train_loss,val_loss,val_mse,val_psnr,learning_rate,epoch_time"


def write_training_config(output_dir: Path, config: Dict) -> None:
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "training_config.json", "w") as f:
        json.dump(config, f, indent=4, default=str)


def train_loop(
    state: TrainState,
    *,
    train_step: Callable,
    eval_step: Callable,
    train_batches: Callable[[int], Iterable[Dict]],
    val_batches: Callable[[], Iterable[Dict]],
    lr_schedule: Callable[[int], float],
    epochs: int,
    output_dir: str | Path,
    task: str = "segmentation",  # or "reconstruction"
    mesh=None,
    rng: Optional[jax.Array] = None,
    save_every: int = 10,
    patience: int = 15,
    start_epoch: int = 0,
    best_metric: Optional[float] = None,
    arch_config: Optional[Dict] = None,
    profile_dir: Optional[str | Path] = None,
    checkpoint_callback: Optional[Callable[[TrainState, int], None]] = None,
    early_stopping_state: Optional[Dict] = None,
    verbose: bool = True,
) -> Dict[str, Any]:
    """Run the full training loop; returns {'state', 'best_metric', 'epochs_run'}.

    ``train_batches(epoch)`` / ``val_batches()`` yield host numpy batch dicts;
    they are sharded onto the mesh here (host-side loaders stay framework-
    agnostic). ``task`` selects the validation protocol and CSV schema.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    rng = rng if rng is not None else jax.random.key(0)

    monitor_mode = "max" if task == "segmentation" else "min"
    if best_metric is None:
        # -inf (not the reference's 0.0, Our_UNet/src/train.py): a run whose
        # metric never beats 0.0 (e.g. collapsed foreground dice) must still
        # write SOME best_model or the evaluate flow dead-ends.
        best_metric = float("-inf") if monitor_mode == "max" else float("inf")
    early_stopping = EarlyStopping(
        patience=patience, mode=monitor_mode, verbose=verbose
    ).load_state_dict(early_stopping_state)

    log_file = output_dir / "training_log.csv"
    header = SEG_CSV_HEADER if task == "segmentation" else AE_CSV_HEADER
    if start_epoch == 0 or not log_file.exists():
        log_file.write_text(header + "\n")
    else:
        # Resume: drop rows past the resume point so re-run epochs don't
        # appear twice with contradictory values.
        lines = log_file.read_text().splitlines()

        def _keep(ln: str) -> bool:
            # Malformed rows (crash mid-write, duplicated header) are dropped
            # instead of aborting the resume.
            try:
                return int(ln.split(",", 1)[0]) <= start_epoch
            except ValueError:
                return False

        kept = [header] + [ln for ln in lines[1:] if ln.strip() and _keep(ln)]
        log_file.write_text("\n".join(kept) + "\n")

    state = replicate(state, mesh)
    shard = _shard_fn(mesh)
    epochs_run = 0

    for epoch in range(start_epoch, epochs):
        epoch_start = time.time()
        lr = lr_schedule(epoch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

        # --- train epoch ---------------------------------------------------
        # Per-phase wall timing (the reference prints data/step breakdowns,
        # Our_UNet/src/train.py:617-678 — informational only; note that the
        # device runs async, so "step" time includes queued device work).
        # Async-dispatch pipeline: losses stay on device (fetching the scalar
        # per step would stall the host and serialize H2D transfer against
        # compute). A bounded sync every `run_ahead` steps caps the number of
        # in-flight batches so queued H2D buffers can't blow up HBM.
        run_ahead = int(os.environ.get("UNET_TPU_RUN_AHEAD", "4"))
        # Long-epoch observability (off by default): print a flushed heartbeat
        # every N steps so a stalled device queue is visible mid-epoch.
        heartbeat = int(os.environ.get("UNET_TPU_STEP_HEARTBEAT", "0"))
        losses, n_train = [], 0
        data_time, step_time = 0.0, 0.0
        profiling = profile_dir is not None and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(str(profile_dir))
        it = iter(train_batches(epoch))
        while True:
            t0 = time.time()
            batch = next(it, None)
            data_time += time.time() - t0
            if batch is None:
                break
            batch = shard(batch)
            t0 = time.time()
            state, loss = train_step(state, batch, rng)
            losses.append(loss)
            n_train += 1
            if n_train > run_ahead:
                # Rolling window: wait on the step dispatched run_ahead steps
                # ago (not the newest one, which would drain the pipeline).
                jax.block_until_ready(losses[n_train - run_ahead - 1])
            step_time += time.time() - t0
            if heartbeat and n_train % heartbeat == 0:
                print(f"    step {n_train}: data={data_time:.1f}s "
                      f"step={step_time:.1f}s", flush=True)
            if profiling and n_train >= 3:
                # Ensure the profiled steps' device work has actually executed
                # before the trace closes (dispatch is async).
                jax.block_until_ready(losses[-1])
                jax.profiler.stop_trace()
                profiling = False
        if profiling:
            jax.block_until_ready(losses[-1]) if losses else None
            jax.profiler.stop_trace()
        # One bulk device fetch (per-step float() would round-trip per step).
        train_loss = (
            float(np.mean([np.asarray(v) for v in jax.device_get(losses)]))
            if losses else 0.0
        )
        if verbose:
            print(f"  Data loading time: {data_time:.2f}s")
            print(f"  Train step time:   {step_time:.2f}s")

        # --- validation ----------------------------------------------------
        val = validate(state, eval_step, val_batches(), mesh, task)
        epoch_time = time.time() - epoch_start

        if task == "segmentation":
            metric = val["dice_mean_foreground"]
            row = (
                f"{epoch + 1},{train_loss:.6f},{val['loss']:.6f},"
                f"{val['dice_background']:.6f},{val['dice_cat']:.6f},"
                f"{val['dice_dog']:.6f},{val['dice_mean_foreground']:.6f},"
                f"{lr:.7f},{epoch_time:.2f}"
            )
        else:
            metric = val["loss"]
            row = (
                f"{epoch + 1},{train_loss:.6f},{val['loss']:.6f},"
                f"{val['mse']:.6f},{val['psnr']:.4f},{lr:.7f},{epoch_time:.2f}"
            )
        with open(log_file, "a") as f:
            f.write(row + "\n")
        if verbose:
            print(f"Epoch {epoch + 1}/{epochs}: train={train_loss:.4f} "
                  f"val={val['loss']:.4f} metric={metric:.4f} lr={lr:.6f} "
                  f"({epoch_time:.1f}s)")

        is_best = (
            metric > best_metric if monitor_mode == "max" else metric < best_metric
        )
        if is_best:
            best_metric = metric

        # Update the patience counter BEFORE checkpointing so the persisted
        # state reflects this epoch — a resume then reproduces the exact
        # stopping epoch of an uninterrupted run.
        stop = early_stopping(metric)

        if (epoch + 1) % save_every == 0 or is_best:
            save_checkpoint(
                output_dir / "checkpoints" / f"epoch_{epoch + 1}",
                state, epoch + 1, best_metric, arch_config,
                early_stopping=early_stopping.state_dict(),
            )
            if is_best:
                save_checkpoint(
                    output_dir / "best_model", state, epoch + 1, best_metric,
                    arch_config, early_stopping=early_stopping.state_dict(),
                )
            if checkpoint_callback is not None:
                checkpoint_callback(state, epoch + 1)

        epochs_run = epoch + 1
        if stop:
            if verbose:
                print(f"Early stopping triggered after {epoch + 1} epochs")
            break

    return {"state": state, "best_metric": best_metric, "epochs_run": epochs_run}


def validate(
    state: TrainState,
    eval_step: Callable,
    batches: Iterable[Dict],
    mesh=None,
    task: str = "segmentation",
) -> Dict[str, float]:
    """Full validation pass with the reference's batch-mean protocol.

    Segmentation: per-batch per-class hard Dice averaged over batches
    (``Our_UNet/src/train.py:510-589``); reconstruction: mean loss/MSE/PSNR
    (``reconstruction/src/train.py`` validate).
    """
    # Async dispatch, like the train loop: per-batch ``float(...)`` fetches
    # would serialize dispatch against compute (each fetch drains the device
    # queue). Outputs stay on device; a rolling bounded wait caps in-flight
    # batches; ONE bulk device_get at the end.
    run_ahead = 4
    outs = []
    shard = _shard_fn(mesh)
    for batch in batches:
        batch = shard(batch)
        outs.append(eval_step(state, batch))
        if len(outs) > run_ahead:
            jax.block_until_ready(outs[len(outs) - run_ahead - 1]["loss"])
    outs = jax.device_get(outs)
    loss = float(np.mean([o["loss"] for o in outs])) if outs else 0.0
    if task == "segmentation":
        dice = (
            np.mean([np.asarray(o["dice"]) for o in outs], axis=0)
            if outs else np.zeros(3)
        )
        return {
            "loss": loss,
            "dice_background": float(dice[0]),
            "dice_cat": float(dice[1]),
            "dice_dog": float(dice[2]),
            "dice_mean_foreground": float((dice[1] + dice[2]) / 2),
        }
    else:
        mse = float(np.mean([np.mean(np.asarray(o["mse"])) for o in outs])) if outs else 0.0
        psnr = float(np.mean([np.mean(np.asarray(o["psnr"])) for o in outs])) if outs else 0.0
        return {"loss": loss, "mse": mse, "psnr": psnr}
