"""Train-loop contract: CSV schema, best-model tracking, early stop, resume."""

import csv

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from unet_implementations_tpu.data.synthetic import synthetic_batch
from unet_implementations_tpu.models.unet import UNet
from unet_implementations_tpu.training import (
    create_train_state,
    make_reconstruction_train_step,
    make_reconstruction_eval_step,
    make_segmentation_eval_step,
    make_segmentation_train_step,
    poly_lr,
    sgd_nesterov,
    adam_l2,
    cosine_lr,
)
from unet_implementations_tpu.training.loop import train_loop


def tiny(head="segmentation"):
    return UNet(features_per_stage=(8, 16), strides=(1, 2),
                encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
                head=head)


def batches(task="segmentation"):
    recon = task == "reconstruction"
    def train_batches(epoch):
        for i in range(2):
            yield synthetic_batch(epoch * 10 + i, 4, 32, reconstruction=recon)
    def val_batches():
        for i in range(2):
            yield synthetic_batch(1000 + i, 4, 32, reconstruction=recon)
    return train_batches, val_batches


class TestSegmentationLoop:
    def test_artifacts_and_schema(self, tmp_path):
        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        tb, vb = batches()
        result = train_loop(
            state,
            train_step=make_segmentation_train_step(donate=False),
            eval_step=make_segmentation_eval_step(),
            train_batches=tb, val_batches=vb,
            lr_schedule=poly_lr(5e-3, 3), epochs=3,
            output_dir=tmp_path, save_every=10, patience=15, verbose=False,
        )
        assert result["epochs_run"] == 3
        with open(tmp_path / "training_log.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3
        assert list(rows[0].keys()) == [
            "epoch", "train_loss", "val_loss", "dice_background", "dice_cat",
            "dice_dog", "dice_mean_foreground", "learning_rate", "epoch_time",
        ]
        # poly LR logged: epoch 2 lr = 5e-3*(1-1/3)^0.9
        np.testing.assert_allclose(
            float(rows[1]["learning_rate"]), 5e-3 * (2 / 3) ** 0.9, rtol=1e-4
        )
        # best model saved (first epoch is always an improvement from 0)
        assert (tmp_path / "best_model").exists()

    @pytest.mark.slow
    def test_partial_val_batch_on_mesh(self, tmp_path):
        """Final val batch not divisible by the device count must not crash
        (it is replicated instead of sharded — regression for the
        indivisible-device_put ValueError)."""
        from unet_implementations_tpu.parallel import create_mesh

        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        tb, _ = batches()

        def vb():
            yield synthetic_batch(500, 8, 32)
            yield synthetic_batch(501, 3, 32)  # 3 % 8 devices != 0

        result = train_loop(
            state,
            train_step=make_segmentation_train_step(donate=False),
            eval_step=make_segmentation_eval_step(),
            train_batches=tb, val_batches=vb,
            lr_schedule=poly_lr(5e-3, 1), epochs=1,
            output_dir=tmp_path, verbose=False, mesh=create_mesh(),
        )
        assert result["epochs_run"] == 1

    @pytest.mark.slow
    def test_best_model_written_even_for_zero_metric(self, tmp_path):
        """A collapsed run (foreground dice stuck at 0.0) still writes
        best_model so the evaluate flow has a checkpoint (the reference's
        0.0 init + strict > would never save one)."""
        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        tb, vb = batches()

        real = make_segmentation_eval_step()

        def zero_dice_eval(state, batch):
            out = dict(real(state, batch))
            out["dice"] = jnp.zeros(3)
            return out

        train_loop(
            state,
            train_step=make_segmentation_train_step(donate=False),
            eval_step=zero_dice_eval,
            train_batches=tb, val_batches=vb,
            lr_schedule=poly_lr(5e-3, 1), epochs=1,
            output_dir=tmp_path, verbose=False,
        )
        assert (tmp_path / "best_model").exists()

    def test_resume_truncates_stale_csv_rows(self, tmp_path):
        """Resume drops CSV rows past the resume epoch (no duplicate rows)."""
        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        from unet_implementations_tpu.training.loop import SEG_CSV_HEADER

        stale = [SEG_CSV_HEADER] + [
            f"{e},1.0,1.0,0.1,0.1,0.1,0.1,0.005,1.0" for e in (1, 2, 3, 4)
        ]
        (tmp_path / "training_log.csv").write_text("\n".join(stale) + "\n")
        tb, vb = batches()
        train_loop(
            state,
            train_step=make_segmentation_train_step(donate=False),
            eval_step=make_segmentation_eval_step(),
            train_batches=tb, val_batches=vb,
            lr_schedule=poly_lr(5e-3, 4), epochs=4,
            output_dir=tmp_path, verbose=False,
            start_epoch=2, best_metric=0.1,
        )
        with open(tmp_path / "training_log.csv") as f:
            rows = list(csv.DictReader(f))
        assert [r["epoch"] for r in rows] == ["1", "2", "3", "4"]
        # rows 3/4 are the NEW run's values, not the stale 1.0 placeholders
        assert rows[2]["train_loss"] != "1.0"

    @pytest.mark.slow
    def test_resume_continues_epochs(self, tmp_path):
        from unet_implementations_tpu.training.checkpoint import (
            restore_checkpoint, save_checkpoint)

        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        save_checkpoint(tmp_path / "ckpt", state, epoch=2, best_metric=0.4)
        restored, meta = restore_checkpoint(tmp_path / "ckpt", state)
        tb, vb = batches()
        result = train_loop(
            restored,
            train_step=make_segmentation_train_step(donate=False),
            eval_step=make_segmentation_eval_step(),
            train_batches=tb, val_batches=vb,
            lr_schedule=poly_lr(5e-3, 4), epochs=4,
            output_dir=tmp_path, verbose=False,
            start_epoch=meta["epoch"], best_metric=meta["best_metric"],
        )
        assert result["epochs_run"] == 4  # epochs 3 and 4 only
        with open(tmp_path / "training_log.csv") as f:
            rows = list(csv.DictReader(f))
        assert [r["epoch"] for r in rows] == ["3", "4"]


    @pytest.mark.slow
    def test_resume_reproduces_stop_epoch(self, tmp_path):
        """The early-stopping counter is persisted in meta.json, so a resumed
        run stops at the SAME epoch as an uninterrupted one (the reference
        resets the patience counter on resume — beaten, not matched)."""
        from unet_implementations_tpu.training.checkpoint import restore_checkpoint

        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        real = make_segmentation_eval_step()

        def flat_eval(state, batch):
            out = dict(real(state, batch))
            out["dice"] = jnp.asarray([0.5, 0.5, 0.5])  # never improves
            return out

        common = dict(
            train_step=make_segmentation_train_step(donate=False),
            eval_step=flat_eval, lr_schedule=poly_lr(5e-3, 10), epochs=10,
            save_every=1, patience=3, verbose=False,
        )
        tb, vb = batches()
        full = train_loop(state, train_batches=tb, val_batches=vb,
                          output_dir=tmp_path / "full", **common)
        # epoch 1 sets best; epochs 2-4 count 1..3 -> stop at 4
        assert full["epochs_run"] == 4

        tb, vb = batches()
        train_loop(state, train_batches=tb, val_batches=vb,
                   output_dir=tmp_path / "resumed", **common)
        ckpt = tmp_path / "resumed" / "checkpoints" / "epoch_2"
        restored, meta = restore_checkpoint(ckpt, state)
        assert meta["early_stopping"]["counter"] == 1
        tb, vb = batches()
        resumed = train_loop(
            restored, train_batches=tb, val_batches=vb,
            output_dir=tmp_path / "resumed",
            start_epoch=meta["epoch"], best_metric=meta["best_metric"],
            early_stopping_state=meta["early_stopping"], **common,
        )
        assert resumed["epochs_run"] == full["epochs_run"]

    @pytest.mark.slow
    def test_resume_drops_malformed_csv_rows(self, tmp_path):
        """A partially-written CSV row (crash mid-write) must not abort the
        resume; the row is dropped."""
        model = tiny()
        b = synthetic_batch(0, 2, 32)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), sgd_nesterov())
        from unet_implementations_tpu.training.loop import SEG_CSV_HEADER

        stale = [SEG_CSV_HEADER, "1,1.0,1.0,0.1,0.1,0.1,0.1,0.005,1.0",
                 "garbage,row", SEG_CSV_HEADER, "2,1.0,1.0,0.1,0.1,0.1,0.1,0.005,"]
        (tmp_path / "training_log.csv").write_text("\n".join(stale) + "\n")
        tb, vb = batches()
        train_loop(
            state,
            train_step=make_segmentation_train_step(donate=False),
            eval_step=make_segmentation_eval_step(),
            train_batches=tb, val_batches=vb,
            lr_schedule=poly_lr(5e-3, 3), epochs=3,
            output_dir=tmp_path, verbose=False,
            start_epoch=2, best_metric=0.1,
        )
        with open(tmp_path / "training_log.csv") as f:
            rows = list(csv.DictReader(f))
        assert [r["epoch"] for r in rows] == ["1", "2", "3"]


class TestReconstructionLoop:
    @pytest.mark.slow
    def test_ae_schema_and_checkpoint_callback(self, tmp_path):
        model = tiny("reconstruction")
        b = synthetic_batch(0, 2, 32, reconstruction=True)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(b["image"]), adam_l2())
        tb, vb = batches("reconstruction")
        calls = []
        result = train_loop(
            state,
            train_step=make_reconstruction_train_step(donate=False),
            eval_step=make_reconstruction_eval_step(),
            train_batches=tb, val_batches=vb,
            lr_schedule=cosine_lr(1e-3, 2), epochs=2,
            output_dir=tmp_path, task="reconstruction", verbose=False,
            save_every=1, checkpoint_callback=lambda s, e: calls.append(e),
        )
        with open(tmp_path / "training_log.csv") as f:
            rows = list(csv.DictReader(f))
        assert list(rows[0].keys()) == [
            "epoch", "train_loss", "val_loss", "val_mse", "val_psnr",
            "learning_rate", "epoch_time",
        ]
        assert calls  # callback fired on checkpoint epochs
        assert result["best_metric"] <= float(rows[0]["val_loss"]) + 1e-9


class TestShardFn:
    def test_bookkeeping_leaves_stay_host_side(self):
        # The loop device-puts only the leaves the jitted steps read
        # (loop.py::_DEVICE_KEYS); the loader's bookkeeping entries
        # (index, original_dims, ...) must not ride H2D every step.
        from unet_implementations_tpu.parallel import create_mesh
        from unet_implementations_tpu.training.loop import _shard_fn

        batch = {
            "image": jnp.zeros((4, 8, 8, 3)),
            "mask": jnp.zeros((4, 8, 8), jnp.int32),
            "index": np.arange(4),
            "original_dims": [(64, 48)] * 4,
        }
        for mesh in (None, create_mesh(4)):
            out = _shard_fn(mesh)(batch)
            assert set(out) == {"image", "mask"}, out.keys()
            assert out["image"].shape == (4, 8, 8, 3)
