"""Spatial (H-axis) partitioning: sharded programs match the unsharded one.

The contract under test: annotating the input sharding is ALL that is
needed — XLA's SPMD partitioner must reproduce the single-device numbers
(up to f32 reassociation) for the full 6-stage UNet, including the s2d
levels and the folded decoder upsample (``parallel/spatial.py``).
"""


import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unet_implementations_tpu.models.unet import unet_6stage
from unet_implementations_tpu.parallel.spatial import (
    create_mesh_dp_sp,
    shard_batch_spatial,
    spatial_forward_jit,
    spatial_sharding,
)

TOL = 5e-4


def _model_and_ref(size=64):
    model = unet_6stage(dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, size, size, 3)), jnp.float32
    )
    params = model.init(jax.random.key(0), x[:1])["params"]
    ref = jax.jit(
        lambda p, im: model.apply({"params": p}, im, deterministic=True)
    )(params, x)
    return model, params, x, ref


class TestMeshHelpers:
    def test_mesh_shape(self):
        mesh = create_mesh_dp_sp(4)
        assert mesh.shape == {"data": 2, "space": 4}
        mesh = create_mesh_dp_sp(2, n_data=3)
        assert mesh.shape == {"data": 3, "space": 2}

    def test_shard_batch_spatial_divisible_and_not(self):
        mesh = create_mesh_dp_sp(2, n_data=2)
        batch = {
            "image": np.zeros((4, 8, 8, 3), np.float32),
            "mask": np.zeros((4, 8, 8), np.int32),
            "odd_rows": np.zeros((4, 7, 8), np.float32),
            "odd_batch": np.zeros((3, 8, 8), np.float32),
            "label": np.zeros((4,), np.int32),
            "scalar": np.float32(1.0),
        }
        out = shard_batch_spatial(batch, mesh)
        assert out["image"].sharding.spec == P("data", "space")
        assert out["mask"].sharding.spec == P("data", "space")
        assert out["odd_rows"].sharding.spec == P("data", None)
        assert out["odd_batch"].sharding.spec == P(None, "space")
        assert out["label"].sharding.spec == P("data")
        # every leaf round-trips unchanged
        for k in batch:
            np.testing.assert_array_equal(np.asarray(out[k]), batch[k])


class TestSpatialForward:
    @pytest.mark.slow
    def test_forward_matches_unsharded_dp2_sp2(self):
        model, params, x, ref = _model_and_ref()
        mesh = create_mesh_dp_sp(2, n_data=2)
        fwd = spatial_forward_jit(model, mesh)
        out = fwd(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(x, spatial_sharding(mesh)),
        )
        assert float(jnp.max(jnp.abs(out - ref))) < TOL

    @pytest.mark.slow
    def test_forward_matches_with_up_fold_dp2_sp2(self, monkeypatch):
        """The TPU inference configuration (folded decoder upsample) under a
        2-D mesh — regression for the asymmetric-pad SPMD miscompilation
        (border rows came out wrong by ~1.7 before the symmetric-pad fix
        in models/s2d.py::_up_contrib_strip)."""
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        model, params, x, ref = _model_and_ref()
        mesh = create_mesh_dp_sp(2, n_data=2)
        fwd = spatial_forward_jit(model, mesh)
        out = fwd(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(x, spatial_sharding(mesh)),
        )
        assert float(jnp.max(jnp.abs(out - ref))) < TOL

    def test_space_only_four_way(self):
        """sp-4 latency mode: one image's rows over 4 devices."""
        model, params, x, ref = _model_and_ref(size=32)
        mesh = create_mesh_dp_sp(4, n_data=1)
        fwd = spatial_forward_jit(model, mesh)
        out = fwd(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(x, spatial_sharding(mesh)),
        )
        assert float(jnp.max(jnp.abs(out - ref))) < TOL


class TestUpFoldPartitionSafety:
    def test_conv_up_fold_exact_on_2d_mesh(self):
        """Primitive-level guard for the symmetric-pad fix: conv_up_fold on
        a (data, space) mesh must match the unsharded result exactly (the
        conv is identical; only halo exchange order differs)."""
        from unet_implementations_tpu.models.s2d import conv_up_fold

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)), jnp.float32) * 0.1
        ref = jax.jit(lambda x: conv_up_fold(x, k))(x)
        mesh = create_mesh_dp_sp(2, n_data=2)
        sh = NamedSharding(mesh, P("data", "space"))
        out = jax.jit(
            lambda x: conv_up_fold(x, k), in_shardings=(sh,), out_shardings=sh
        )(jax.device_put(x, sh))
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


class TestSpatialPredict:
    @pytest.mark.slow
    def test_predict_cli_spatial(self, tmp_path):
        """`predict --spatial 2` runs the sharded forward end-to-end and
        writes original-resolution masks (values only sanity-checked —
        forward equivalence is covered by TestSpatialForward)."""
        import cv2

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
        n = predict_segmentation(tmp_path / "ckpt", imgs, tmp_path / "preds",
                                 dtype=jnp.float32, spatial=2, verbose=False)
        assert n == 1
        mask = cv2.imread(str(tmp_path / "preds" / "a_mask.png"),
                          cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (40, 30)
        assert set(np.unique(mask)) <= {0, 1, 2}

    def test_spatial_rejected_for_artifacts_and_parser_accepts_flag(self, tmp_path):
        from unet_implementations_tpu.cli import build_parser
        from unet_implementations_tpu.recipes.common import predict_segmentation
        from unet_implementations_tpu.serving.export import ARTIFACT_FORWARD

        args = build_parser().parse_args(
            ["predict", "--model_path", "m", "--input", "i", "--spatial", "4"])
        assert args.spatial == 4

        art = tmp_path / "art"
        art.mkdir()
        (art / ARTIFACT_FORWARD).write_bytes(b"")
        with pytest.raises(ValueError, match="spatial"):
            predict_segmentation(art, tmp_path, tmp_path / "o",
                                 spatial=2, verbose=False)
