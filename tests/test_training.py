"""Training infrastructure tests: optimizer parity, steps, freezing,
checkpoint roundtrip, LR schedules, data-parallel equivalence on 8 CPU devices."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from unet_implementations_tpu.data.synthetic import synthetic_batch
from unet_implementations_tpu.models.unet import UNet
from unet_implementations_tpu.parallel import create_mesh, replicate, shard_batch
from unet_implementations_tpu.training import (
    EarlyStopping,
    adam_l2,
    cosine_lr,
    create_train_state,
    get_learning_rate,
    make_reconstruction_train_step,
    make_segmentation_eval_step,
    make_segmentation_train_step,
    poly_lr,
    set_learning_rate,
    sgd_nesterov,
)
from unet_implementations_tpu.training.train_state import with_frozen


def tiny_unet(**kw):
    return UNet(
        features_per_stage=(8, 16, 16),
        strides=(1, 2, 2),
        encoder_dropout_rates=(0.0, 0.0, 0.1),
        decoder_dropout_rates=(0.1, 0.0),
        **kw,
    )


def make_state(model=None, tx=None, size=32, reconstruction=False):
    model = model or tiny_unet(head="reconstruction" if reconstruction else "segmentation")
    tx = tx or sgd_nesterov()
    batch = synthetic_batch(0, 2, size, reconstruction=reconstruction)
    return create_train_state(model, jax.random.key(0), jnp.asarray(batch["image"]), tx)


class TestOptimizerParity:
    """optax chains must match torch.optim update math exactly."""

    def _run_both(self, make_tx, make_torch_opt, steps=5):
        rng = np.random.default_rng(0)
        w0 = rng.normal(size=(4, 3)).astype(np.float32)
        grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(steps)]

        params = {"w": jnp.asarray(w0)}
        tx = make_tx()
        opt_state = tx.init(params)
        for g in grads:
            updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = make_torch_opt([wt])
        for g in grads:
            wt.grad = torch.from_numpy(g.copy())
            opt.step()

        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
        )

    def test_sgd_nesterov_matches_torch(self):
        self._run_both(
            lambda: sgd_nesterov(5e-3, 1e-4, 0.99),
            lambda ps: torch.optim.SGD(ps, lr=5e-3, weight_decay=1e-4,
                                       momentum=0.99, nesterov=True),
        )

    def test_adam_l2_matches_torch(self):
        self._run_both(
            lambda: adam_l2(1e-3, 1e-5),
            lambda ps: torch.optim.Adam(ps, lr=1e-3, weight_decay=1e-5),
        )


class TestSchedules:
    def test_poly_lr(self):
        s = poly_lr(5e-3, 100)
        assert s(0) == 5e-3
        np.testing.assert_allclose(s(50), 5e-3 * 0.5**0.9)

    def test_cosine_lr(self):
        s = cosine_lr(1e-3, 50, eta_min=1e-6)
        assert s(0) == 1e-3
        np.testing.assert_allclose(s(50), 1e-6)
        np.testing.assert_allclose(s(25), 1e-6 + (1e-3 - 1e-6) / 2)

    def test_lr_injection_roundtrip(self):
        state = make_state()
        assert get_learning_rate(state.opt_state) == pytest.approx(5e-3)
        new_opt = set_learning_rate(state.opt_state, 1e-4)
        assert get_learning_rate(new_opt) == pytest.approx(1e-4)

    def test_lr_injection_with_frozen(self):
        model = tiny_unet()
        batch = synthetic_batch(0, 2, 32)
        params = model.init(jax.random.key(0), jnp.asarray(batch["image"]))["params"]
        tx = with_frozen(sgd_nesterov(), params, ["encoder_0"])
        opt_state = tx.init(dict(params))
        assert get_learning_rate(opt_state) == pytest.approx(5e-3)
        new = set_learning_rate(opt_state, 2e-3)
        assert get_learning_rate(new) == pytest.approx(2e-3)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self):
        state = make_state()
        step = make_segmentation_train_step(donate=False)
        rng = jax.random.key(1)
        batch = jax.tree.map(jnp.asarray, synthetic_batch(1, 4, 32))
        losses = []
        for _ in range(15):
            state, loss = step(state, batch, rng)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_eval_step_outputs(self):
        state = make_state()
        estep = make_segmentation_eval_step()
        batch = jax.tree.map(jnp.asarray, synthetic_batch(2, 2, 32))
        out = estep(state, batch)
        assert out["preds"].shape == (2, 32, 32)
        assert out["dice"].shape == (3,)
        assert out["confusion"].shape == (3, 3)
        assert np.isfinite(float(out["loss"]))

    def test_reconstruction_step(self):
        state = make_state(reconstruction=True)
        step = make_reconstruction_train_step(donate=False)
        batch = jax.tree.map(jnp.asarray, synthetic_batch(3, 2, 32, reconstruction=True))
        losses = []
        for _ in range(10):
            state, loss = step(state, batch, jax.random.key(0))
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_frozen_encoder_params_unchanged(self):
        model = tiny_unet()
        batch = jax.tree.map(jnp.asarray, synthetic_batch(4, 2, 32))
        params = model.init(jax.random.key(0), batch["image"])["params"]
        params = dict(params)
        tx = with_frozen(sgd_nesterov(), params, ["encoder_0", "encoder_1"])
        from unet_implementations_tpu.training.train_state import TrainState

        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
        )
        frozen_before = jax.tree.map(np.asarray, params["encoder_0"])
        train_before = np.asarray(
            jax.tree.leaves(params["decoder_0"])[0]
        )
        step = make_segmentation_train_step(donate=False)
        for _ in range(3):
            state, _ = step(state, batch, jax.random.key(1))
        frozen_after = jax.tree.map(np.asarray, state.params["encoder_0"])
        for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(frozen_after)):
            np.testing.assert_array_equal(a, b)
        train_after = np.asarray(jax.tree.leaves(state.params["decoder_0"])[0])
        assert not np.array_equal(train_before, train_after)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from unet_implementations_tpu.training.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        state = make_state()
        step = make_segmentation_train_step(donate=False)
        batch = jax.tree.map(jnp.asarray, synthetic_batch(5, 2, 32))
        state, _ = step(state, batch, jax.random.key(0))

        save_checkpoint(tmp_path / "ckpt", state, epoch=3, best_metric=0.5,
                        config={"n_stages": 3})
        fresh = make_state()
        restored, meta = restore_checkpoint(tmp_path / "ckpt", fresh)
        assert meta["epoch"] == 3
        assert meta["best_metric"] == 0.5
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_encoder_extraction(self, tmp_path):
        from unet_implementations_tpu.training.checkpoint import (
            extract_encoder_params,
            save_checkpoint,
        )

        ae_state = make_state(reconstruction=True)
        save_checkpoint(tmp_path / "ae", ae_state, epoch=1, best_metric=0.1)

        seg_state = make_state()
        grafted = extract_encoder_params(tmp_path / "ae", seg_state.params, n_stages=3)
        for i in range(3):
            for a, b in zip(
                jax.tree.leaves(grafted[f"encoder_{i}"]),
                jax.tree.leaves(ae_state.params[f"encoder_{i}"]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Decoder untouched
        for a, b in zip(
            jax.tree.leaves(grafted["decoder_0"]),
            jax.tree.leaves(seg_state.params["decoder_0"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDataParallel:
    def test_eight_device_mesh_available(self):
        assert len(jax.devices()) == 8

    @pytest.mark.slow
    def test_sharded_step_matches_single_device(self):
        state = make_state()
        step = make_segmentation_train_step(donate=False)
        batch = jax.tree.map(jnp.asarray, synthetic_batch(6, 8, 32))
        rng = jax.random.key(7)

        _, loss_single = step(state, batch, rng)

        mesh = create_mesh()
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        new_state, loss_sharded = step(state_r, batch_s, rng)
        # sharded reductions reassociate float sums — small tolerance
        np.testing.assert_allclose(
            float(loss_single), float(loss_sharded), rtol=1e-4
        )
        # Updated params remain replicated and finite.
        leaf = jax.tree.leaves(new_state.params)[0]
        assert np.all(np.isfinite(np.asarray(leaf)))

    def test_sharded_eval_confusion_matches(self):
        state = make_state()
        estep = make_segmentation_eval_step()
        batch = jax.tree.map(jnp.asarray, synthetic_batch(8, 8, 32))
        single = estep(state, batch)
        mesh = create_mesh()
        sharded = estep(replicate(state, mesh), shard_batch(batch, mesh))
        np.testing.assert_allclose(
            np.asarray(single["confusion"]), np.asarray(sharded["confusion"])
        )


class TestEarlyStopping:
    def test_max_mode(self):
        es = EarlyStopping(patience=2, mode="max", verbose=False)
        assert not es(0.5)
        assert not es(0.6)   # improvement
        assert not es(0.6)   # no improvement (delta) -> counter 1
        assert es(0.59)      # counter 2 -> stop

    def test_min_mode(self):
        es = EarlyStopping(patience=2, mode="min", verbose=False)
        assert not es(1.0)
        assert not es(0.5)
        assert not es(0.51)
        assert es(0.52)


class TestUint8Batches:
    """The emit_uint8 loader contract: raw uint8 batches through the jitted
    steps match host-normalized float batches to ~1 ulp — the device
    normalization (ops/normalize.py) replays the loader's op sequence
    (/255, -mean, /std in f32); XLA may fuse the chain with different
    rounding, so equality is allclose at 1e-6, far below bf16 training
    precision. The standalone op IS bitwise (test_normalize_image_bitwise)."""

    def _pair(self, seed=0, size=32, b=2):
        from unet_implementations_tpu.data.loader import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        rng = np.random.default_rng(seed)
        u8 = rng.integers(0, 256, (b, size, size, 3), dtype=np.uint8)
        mask = rng.integers(0, 3, (b, size, size)).astype(np.int32)
        f32 = ((u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        return u8, f32, mask

    def test_normalize_image_bitwise(self):
        from unet_implementations_tpu.ops.normalize import normalize_image

        u8, f32, _ = self._pair()
        np.testing.assert_array_equal(
            np.asarray(normalize_image(jnp.asarray(u8))), f32)
        # float passthrough is the identity
        out = normalize_image(jnp.asarray(f32))
        np.testing.assert_array_equal(np.asarray(out), f32)
        # unit mode
        np.testing.assert_array_equal(
            np.asarray(normalize_image(jnp.asarray(u8), mode="unit")),
            u8.astype(np.float32) / 255.0)

    def test_seg_train_step_parity(self):
        u8, f32, mask = self._pair()
        state = create_train_state(
            tiny_unet(), jax.random.key(0), jnp.asarray(f32), sgd_nesterov())
        step = make_segmentation_train_step(donate=False)
        rng = jax.random.key(1)
        s_u8, l_u8 = step(state, {"image": jnp.asarray(u8), "mask": jnp.asarray(mask)}, rng)
        s_f32, l_f32 = step(state, {"image": jnp.asarray(f32), "mask": jnp.asarray(mask)}, rng)
        np.testing.assert_allclose(
            np.asarray(l_u8), np.asarray(l_f32), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-7),
            s_u8.params, s_f32.params)

    def test_seg_eval_step_parity(self):
        u8, f32, mask = self._pair(seed=3)
        state = create_train_state(
            tiny_unet(), jax.random.key(0), jnp.asarray(f32), sgd_nesterov())
        estep = make_segmentation_eval_step()
        o_u8 = estep(state, {"image": jnp.asarray(u8), "mask": jnp.asarray(mask)})
        o_f32 = estep(state, {"image": jnp.asarray(f32), "mask": jnp.asarray(mask)})
        np.testing.assert_allclose(
            np.asarray(o_u8["loss"]), np.asarray(o_f32["loss"]), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(o_u8["preds"]), np.asarray(o_f32["preds"]))

    def test_reconstruction_step_parity(self):
        u8, _, _ = self._pair(seed=5)
        f01 = u8.astype(np.float32) / 255.0
        state = make_state(reconstruction=True)
        step = make_reconstruction_train_step(donate=False)
        rng = jax.random.key(2)
        b_u8 = {"image": jnp.asarray(u8), "target": jnp.asarray(u8)}
        b_f = {"image": jnp.asarray(f01), "target": jnp.asarray(f01)}
        _, l_u8 = step(state, b_u8, rng)
        _, l_f = step(state, b_f, rng)
        np.testing.assert_allclose(np.asarray(l_u8), np.asarray(l_f), rtol=1e-6)
