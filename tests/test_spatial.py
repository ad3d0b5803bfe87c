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

    @pytest.mark.slow
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


class TestSpatialTrain:
    """Loss + gradients on the 2-D mesh. The backward pass is where SPMD
    partitioners historically break (transposed halo collective-permutes,
    InstanceNorm stat all-reduce transposes) — assert the full train step
    reproduces the unsharded params, not just the forward.

    Tolerance note: gradient parity is reassociation-bounded, not bitwise.
    Inside the validity envelope (every level's H >= n_space) the measured
    worst per-leaf grad delta on the 8-device CPU mesh is ~3e-3 (the
    InstanceNorm backward's (x-mu) cancellations amplify reduction-order
    differences); conv-bias grads are analytically ZERO through IN (a bias
    is a per-channel shift, which IN removes), so their values are pure
    cancellation noise in BOTH programs and only absolute deltas are
    meaningful. Outside the envelope the backward is silently miscompiled
    (see parallel/spatial.py) — the step refuses to run there, tested
    below."""

    GRAD_TOL = 1e-2  # on params after one SGD step (lr 5e-3, nesterov)

    def _run_step(self, mesh, size):
        from unet_implementations_tpu.parallel import (
            replicate,
            shard_batch_spatial,
            spatial_train_step_jit,
        )
        from unet_implementations_tpu.training import (
            create_train_state,
            make_segmentation_train_step,
            sgd_nesterov,
        )

        rng = np.random.default_rng(3)
        batch = {
            "image": jnp.asarray(
                rng.normal(size=(2, size, size, 3)), jnp.float32),
            "mask": jnp.asarray(
                rng.integers(0, 3, (2, size, size)), jnp.int32),
        }
        model = unet_6stage(dtype=jnp.float32)
        state = create_train_state(
            model, jax.random.key(0), batch["image"][:1], sgd_nesterov())
        key = jax.random.key(7)

        ref_step = make_segmentation_train_step(donate=False)
        ref_state, ref_loss = ref_step(state, batch, key)

        sp_step = spatial_train_step_jit(mesh)
        sp_state, sp_loss = sp_step(
            replicate(state, mesh), shard_batch_spatial(batch, mesh), key)
        return ref_state, ref_loss, sp_state, sp_loss

    def _assert_parity(self, ref_state, ref_loss, sp_state, sp_loss):
        # Loss is O(1-4); measured sharded-vs-not deltas are ~1e-5 (f32
        # reassociation over thousands of reduction terms).
        assert float(jnp.abs(sp_loss - ref_loss)) < 1e-4
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ref_state.params, sp_state.params)
        worst = max(jax.tree.leaves(diffs))
        assert worst < self.GRAD_TOL, f"worst param delta {worst}"

    @pytest.mark.slow
    def test_train_step_matches_unsharded_dp2_sp2(self, monkeypatch):
        # TPU configuration: folded decoder upsample ON (the fold's backward
        # crosses shard borders through the strip recompute). 64px over
        # space=2: bottleneck H=2 == n_space, the envelope edge.
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        mesh = create_mesh_dp_sp(2, n_data=2)
        ref_state, ref_loss, sp_state, sp_loss = self._run_step(mesh, 64)
        self._assert_parity(ref_state, ref_loss, sp_state, sp_loss)
        # Outputs replicated: params ready for the next (or an unsharded)
        # step without resharding.
        assert all(leaf.sharding.spec == P()
                   for leaf in jax.tree.leaves(sp_state.params))
        assert sp_loss.sharding.spec == P()

    @pytest.mark.slow
    def test_train_step_matches_space_only_sp4(self):
        # Pure spatial sharding (n_data=1): every gradient contribution
        # crosses the space axis; params must still come back identical.
        mesh = create_mesh_dp_sp(4, n_data=1)
        ref_state, ref_loss, sp_state, sp_loss = self._run_step(mesh, 128)
        self._assert_parity(ref_state, ref_loss, sp_state, sp_loss)

    def test_degenerate_sharding_refused(self):
        # 32px over space=4 puts the deep levels below the shard count —
        # the region where XLA silently miscompiles the backward (grads
        # ~100% wrong, loss exact; measured jax 0.9.0). The step must
        # refuse instead of returning wrong gradients.
        from unet_implementations_tpu.parallel import spatial_train_step_jit

        mesh = create_mesh_dp_sp(4, n_data=1)
        step = spatial_train_step_jit(mesh)
        batch = {"image": jnp.zeros((2, 32, 32, 3), jnp.float32),
                 "mask": jnp.zeros((2, 32, 32), jnp.int32)}
        with pytest.raises(ValueError, match="miscompiles the\n?.*backward|backward"):
            step(None, batch, jax.random.key(0))


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


class TestSpatialTrainRecipe:
    @pytest.mark.slow
    def test_our_unet_train_spatial(self, tmp_path):
        """`our_unet train --spatial 2` runs the full loop (train epochs +
        validation + checkpointing) on the 2-D mesh end to end."""
        import cv2
        from PIL import Image

        from unet_implementations_tpu.recipes import our_unet

        root = tmp_path / "data"
        rng = np.random.default_rng(0)
        for split, n in (("Train", 8), ("Val", 4)):
            (root / split / "resized").mkdir(parents=True)
            lbl = root / split / ("resized_label" if split == "Train"
                                  else "processed_labels")
            lbl.mkdir(parents=True)
            for i in range(n):
                img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(root / split / "resized" / f"s_{i}.jpg"), img)
                m = np.zeros((64, 64), np.uint8)
                m[16:48, 16:48] = 1 + (i % 2)
                Image.fromarray(m).save(lbl / f"s_{i}.png")

        out = tmp_path / "out"
        res = our_unet.train(
            root, out, batch_size=4, epochs=1, save_every=1, spatial=2,
            dtype=jnp.float32, verbose=False)
        assert np.isfinite(res["best_metric"])
        log = (out / "training_log.csv").read_text().splitlines()
        assert len(log) == 2  # header + one epoch row
        assert (out / "best_model").exists()
        # The mesh configuration is part of the run's reproducibility record.
        import json
        cfg = json.loads((out / "training_config.json").read_text())
        assert cfg["spatial"] == 2

    def test_spatial_contradicts_no_mesh(self, tmp_path):
        from unet_implementations_tpu.recipes import our_unet

        (tmp_path / "Train" / "resized").mkdir(parents=True)
        (tmp_path / "Train" / "resized_label").mkdir(parents=True)
        (tmp_path / "Val" / "resized").mkdir(parents=True)
        (tmp_path / "Val" / "processed_labels").mkdir(parents=True)
        with pytest.raises(ValueError, match="no_mesh"):
            our_unet.train(tmp_path, tmp_path / "out", spatial=2,
                           use_mesh=False, verbose=False)

    def test_spatial_train_parser(self):
        from unet_implementations_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["our_unet", "train", "--data_dir", "d", "--output_dir", "o",
             "--spatial", "2"])
        assert args.spatial == 2


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


def test_mesh_rejects_nonpositive_space():
    from unet_implementations_tpu.parallel import create_mesh_dp_sp

    with pytest.raises(ValueError, match=">= 1"):
        create_mesh_dp_sp(0)
