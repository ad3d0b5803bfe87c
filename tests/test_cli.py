"""CLI parser contract tests (flags mirror the reference entry points)."""

import numpy as np
import pytest

from unet_implementations_tpu.cli import build_parser


class TestPredict:
    def test_predict_segmentation_end_to_end(self, tmp_path):
        import cv2
        import jax
        import jax.numpy as jnp

        from unet_implementations_tpu.models.unet import unet_6stage
        from unet_implementations_tpu.recipes.common import predict_segmentation
        from unet_implementations_tpu.training import (
            create_train_state,
            sgd_nesterov,
        )
        from unet_implementations_tpu.training.checkpoint import save_checkpoint

        model = unet_6stage(dtype=jnp.float32)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 64, 64, 3)), sgd_nesterov()
        )
        save_checkpoint(tmp_path / "ckpt", state, epoch=1, best_metric=0.0)

        imgs = tmp_path / "imgs"
        imgs.mkdir()
        rng = np.random.default_rng(0)
        cv2.imwrite(str(imgs / "a.jpg"),
                    (rng.random((40, 30, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(imgs / "b.png"),
                    (rng.random((20, 50, 3)) * 255).astype(np.uint8))

        out = tmp_path / "preds"
        n = predict_segmentation(tmp_path / "ckpt", imgs, out,
                                 dtype=jnp.float32, verbose=False)
        assert n == 2
        mask = cv2.imread(str(out / "a_mask.png"), cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (40, 30)  # original resolution
        assert set(np.unique(mask)) <= {0, 1, 2}
        assert (out / "b_overlay.png").exists()


class TestParser:
    def test_our_unet_train_defaults(self):
        args = build_parser().parse_args(
            ["our_unet", "train", "--data_dir", "d", "--output_dir", "o"])
        assert args.batch_size == 32
        assert args.lr == 5e-3
        assert args.momentum == 0.99
        assert args.weighted_ce is True
        assert args.patience == 15

    def test_batch_size_honored_not_overridden(self):
        # The reference force-resets batch_size post-parse (train.py:748);
        # we honor the CLI value.
        args = build_parser().parse_args(
            ["our_unet", "train", "--data_dir", "d", "--output_dir", "o",
             "--batch_size", "8"])
        assert args.batch_size == 8

    def test_clip_defaults(self):
        args = build_parser().parse_args(
            ["clip_unet", "train", "--data_dir", "d", "--output_dir", "o"])
        assert args.batch_size == 16
        assert args.clip_model == "ViT-B/16"

    def test_ae_defaults(self):
        args = build_parser().parse_args(
            ["ae_recon", "train", "--data_dir", "d", "--output_dir", "o"])
        assert args.lr == 1e-3
        assert args.mse_weight == 1.0
        assert args.perceptual_weight == 0.0  # trained truth: MSE only

    def test_transfer_requires_encoder(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(
                ["ae_transfer", "train", "--data_dir", "d", "--output_dir", "o"])

    def test_eval_quirk_flag(self):
        args = build_parser().parse_args(
            ["clip_unet", "evaluate", "--model_path", "m", "--data_dir", "d",
             "--no_clip_features"])
        assert args.no_clip_features is True

    def test_reference_compat_flags_accepted(self):
        # The reference's full train flag set parses (SURVEY §1.1): dead or
        # torch-specific flags are accepted as no-ops, --num_workers maps to
        # --num_threads.
        args = build_parser().parse_args(
            ["our_unet", "train", "--data_dir", "d", "--output_dir", "o",
             "--num_workers", "4", "--device", "cuda", "--amp",
             "--reduced_complexity"])
        assert args.num_workers == 4
        # --reduced_complexity is an accepted no-op, like the reference
        # (parsed, never consumed: Our_UNet/src/train.py:110 — the reduced
        # widths are hard-coded there and here). docs/MIGRATION.md agrees.
        assert args.reduced_complexity is True
        assert not hasattr(args, "features_per_stage")
        args = build_parser().parse_args(
            ["clip_unet", "train", "--data_dir", "d", "--output_dir", "o",
             "--use_clip"])
        assert args.use_clip is True
        args = build_parser().parse_args(
            ["our_unet", "evaluate", "--model_path", "m", "--data_dir", "d",
             "--num_workers", "2", "--device", "cpu"])
        assert args.num_workers == 2

    def test_predict_flags(self):
        args = build_parser().parse_args(
            ["predict", "--model_path", "m", "--input", "i"])
        assert args.output_dir == "predictions"
        assert args.no_overlay is False

    def test_pipeline_and_augment(self):
        args = build_parser().parse_args(
            ["pipeline", "--raw_dir", "r", "--processed_dir", "p"])
        assert args.val_ratio == 0.2 and args.seed == 42
        args = build_parser().parse_args(["augment", "--data_dir", "d"])
        assert args.cat_augmentations == 5 and args.dog_augmentations == 2
