"""AOT serving export (jax.export): roundtrip, loader autonomy, CLI.

The artifact must replay the exact forward with no model code (the loader
rebuilds the abstract param tree from the module's own signature), pad
arbitrary batches through the static-batch module, and carry multi-platform
lowerings produced without the target hardware present.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_implementations_tpu.models.unet import UNet
from unet_implementations_tpu.serving import load_exported, save_exported

SMALL = dict(
    features_per_stage=(8, 16), strides=(1, 2),
    encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
    dtype=jnp.float32,
)


def _small_model_and_params():
    model = UNet(**SMALL)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(1), x)["params"]
    return model, params


class TestExportRoundtrip:
    def test_exported_matches_apply(self, tmp_path):
        model, params = _small_model_and_params()
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3), jnp.float32)
        art = save_exported(tmp_path / "art", model, params,
                            recipe="our_unet", batch_size=2, img_size=32,
                            input_dtype=jnp.float32, platforms=("cpu",))
        served = load_exported(art)
        ref = model.apply({"params": params}, x, deterministic=True)
        np.testing.assert_allclose(served.predict(x), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_predict_pads_and_chunks_arbitrary_batches(self, tmp_path):
        model, params = _small_model_and_params()
        art = save_exported(tmp_path / "art", model, params,
                            recipe="our_unet", batch_size=2, img_size=32,
                            input_dtype=jnp.float32, platforms=("cpu",))
        served = load_exported(art)
        # 5 images through a batch-2 module: 2 full chunks + padded tail.
        x = jax.random.normal(jax.random.key(2), (5, 32, 32, 3), jnp.float32)
        ref = model.apply({"params": params}, x, deterministic=True)
        out = served.predict(x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)
        # An empty batch is a caller error, not an IndexError from outs[0].
        with pytest.raises(ValueError, match="empty batch"):
            served.predict(x[:0])

    @pytest.mark.slow
    def test_multiplatform_lowering_without_tpu(self, tmp_path):
        """tpu+cpu lowerings bake into one module on a CPU-only host."""
        model, params = _small_model_and_params()
        art = save_exported(tmp_path / "art", model, params,
                            recipe="our_unet", batch_size=1, img_size=32,
                            input_dtype=jnp.float32, platforms=("tpu", "cpu"))
        meta = json.loads((art / "export_meta.json").read_text())
        assert meta["platforms"] == ["tpu", "cpu"]
        served = load_exported(art)
        x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3), jnp.float32)
        ref = model.apply({"params": params}, x, deterministic=True)
        np.testing.assert_allclose(served.predict(x), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_clip_variant_two_inputs(self, tmp_path):
        model = UNet(clip_fusion=True, clip_dim=16, **{**SMALL})
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        cf = jnp.zeros((1, 16), jnp.float32)
        params = model.init(jax.random.key(1), x, cf)["params"]
        art = save_exported(tmp_path / "art", model, params,
                            recipe="clip_unet", batch_size=2, img_size=32,
                            clip_dim=16, input_dtype=jnp.float32,
                            platforms=("cpu",))
        served = load_exported(art)
        xs = jax.random.normal(jax.random.key(4), (3, 32, 32, 3), jnp.float32)
        cfs = jax.random.normal(jax.random.key(5), (3, 16), jnp.float32)
        ref = model.apply({"params": params}, xs, cfs, deterministic=True)
        out = served.predict(xs, cfs)
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_loader_needs_no_model_code(self, tmp_path):
        """The abstract param tree is rebuilt from the Exported signature —
        loading must work from the serialized bytes + params dir alone."""
        from unet_implementations_tpu.serving.export import (
            _abstract_params_from_exported,
            export_forward,
        )

        model, params = _small_model_and_params()
        exported = export_forward(model, params, batch_size=1, img_size=32,
                                  input_dtype=jnp.float32, platforms=("cpu",))
        rebuilt = _abstract_params_from_exported(exported)
        assert jax.tree.structure(rebuilt) == jax.tree.structure(params)
        for a, b in zip(jax.tree.leaves(rebuilt), jax.tree.leaves(params)):
            assert a.shape == b.shape and a.dtype == b.dtype


class TestPredictFromArtifact:
    @pytest.mark.slow
    def test_predict_auto_detects_exported_artifact(self, tmp_path):
        """`predict --model_path <artifact>` replays the exported module."""
        import cv2

        from unet_implementations_tpu.models.unet import unet_6stage
        from unet_implementations_tpu.recipes.common import predict_segmentation

        model = unet_6stage(dtype=jnp.float32)
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
        art = save_exported(tmp_path / "art", model, params,
                            recipe="our_unet", batch_size=2, img_size=512,
                            input_dtype=jnp.float32, platforms=("cpu",))

        imgs = tmp_path / "imgs"
        imgs.mkdir()
        rng = np.random.default_rng(0)
        cv2.imwrite(str(imgs / "a.jpg"),
                    (rng.random((40, 30, 3)) * 255).astype(np.uint8))

        out = tmp_path / "preds"
        n = predict_segmentation(art, imgs, out, batch_size=2, verbose=False)
        assert n == 1
        mask = cv2.imread(str(out / "a_mask.png"), cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (40, 30)
        assert set(np.unique(mask)) <= {0, 1, 2}


class TestExportCLI:
    @pytest.mark.slow
    def test_cli_export_from_checkpoint(self, tmp_path, monkeypatch):
        import unet_implementations_tpu.serving.export as se
        from unet_implementations_tpu.cli import main
        from unet_implementations_tpu.models.unet import unet_6stage
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

        # Small geometry keeps the CPU compile fast; the flagship 512²
        # export is exercised on the TPU (docs/PARITY.md).
        main(["export", "--model_path", str(tmp_path / "ckpt"),
              "--output_dir", str(tmp_path / "art"), "--arch", "our_unet",
              "--batch_size", "1", "--img_size", "64",
              "--platforms", "cpu", "--f32"])

        served = load_exported(tmp_path / "art")
        assert served.meta["recipe"] == "our_unet"
        x = jax.random.normal(jax.random.key(6), (1, 64, 64, 3), jnp.float32)
        ref = model.apply({"params": state.params}, x, deterministic=True)
        # Looser than the roundtrip tests: the 6-stage net accumulates more
        # f32 noise between the baked lowering and live apply; this test
        # checks the CLI plumbing, not the math (covered above).
        np.testing.assert_allclose(served.predict(x), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)
