"""Tests for the offline pipeline and the host loader."""

import numpy as np
import cv2
import pytest
from PIL import Image

from unet_implementations_tpu.data import pipeline as P
from unet_implementations_tpu.data.loader import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    PetDataset,
    batch_iterator,
)


class TestRemap:
    def test_128_to_class(self):
        mask = np.array([[0, 128, 255], [128, 0, 0]], np.uint8)
        out = P.remap_raw_mask(mask, "persian_1.png")
        np.testing.assert_array_equal(out, [[0, 1, 255], [1, 0, 0]])
        out = P.remap_raw_mask(mask, "beagle_1.png")
        np.testing.assert_array_equal(out, [[0, 2, 255], [2, 0, 0]])

    def test_other_foreground_value(self):
        mask = np.array([[0, 77, 255]], np.uint8)
        out = P.remap_raw_mask(mask, "siamese_2.png")
        np.testing.assert_array_equal(out, [[0, 1, 255]])

    def test_3d_mask_first_channel(self):
        mask = np.zeros((2, 2, 3), np.uint8)
        mask[0, 0, 0] = 128
        out = P.remap_raw_mask(mask, "sphynx_9.png")
        assert out[0, 0] == 1

    def test_last_resort_fallback(self):
        # only {0, 255} present → everything non-bg/border becomes the class
        mask = np.array([[0, 255], [255, 0]], np.uint8)
        out = P.remap_raw_mask(mask, "pug_1.png")
        assert set(np.unique(out)) <= {0, 255}  # no fg pixels to assign

    def test_values_always_valid(self):
        rng = np.random.default_rng(0)
        mask = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        out = P.remap_raw_mask(mask, "bengal_1.png")
        assert set(np.unique(out)) <= {0, 1, 2, 255}


class TestResizeWithPadding:
    def test_portrait_centered(self):
        img = np.full((400, 200, 3), 255, np.uint8)
        out = P.resize_with_padding(img, 512)
        assert out.shape == (512, 512, 3)
        # new_w = int(200 * 512/400) = 256, pad_x = (512-256)//2 = 128
        assert out[:, 127, :].max() == 0 and out[:, 129, :].min() > 0

    def test_landscape(self):
        img = np.full((100, 400), 7, np.uint8)
        out = P.resize_with_padding(img, 512, nearest=True)
        assert out.shape == (512, 512)
        new_h = int(100 * 512 / 400)
        pad_y = (512 - new_h) // 2
        assert out[pad_y - 1].max() == 0 and out[pad_y + 1].min() == 7

    def test_nearest_preserves_values(self):
        mask = np.random.default_rng(1).choice([0, 1, 2, 255], (300, 400)).astype(np.uint8)
        out = P.resize_with_padding(mask, 512, nearest=True)
        assert set(np.unique(out)) <= {0, 1, 2, 255}


class TestStratifiedSplit:
    def test_split_ratio_and_determinism(self, tmp_path):
        imgs, masks = [], []
        for i in range(20):
            cls = 1 if i < 10 else 2
            name = f"{'persian' if cls == 1 else 'beagle'}_{i}"
            ip = tmp_path / f"{name}.jpg"
            mp = tmp_path / f"{name}.png"
            ip.write_bytes(b"")
            m = np.zeros((4, 4), np.uint8)
            m[1:3, 1:3] = cls
            Image.fromarray(m).save(mp)
            imgs.append(ip)
            masks.append(mp)
        t1, v1 = P.stratified_split(imgs, masks, 0.2, set(), seed=42)
        t2, v2 = P.stratified_split(imgs, masks, 0.2, set(), seed=42)
        assert [p[0].name for p in t1] == [p[0].name for p in t2]
        assert len(v1) == 4  # 2 cats + 2 dogs
        cat_val = sum("persian" in p[0].name for p in v1)
        assert cat_val == 2

    def test_corrupt_excluded(self, tmp_path):
        imgs, masks = [], []
        for i in range(4):
            ip = tmp_path / f"persian_{i}.jpg"
            mp = tmp_path / f"persian_{i}.png"
            ip.write_bytes(b"")
            m = np.zeros((4, 4), np.uint8); m[1, 1] = 1
            Image.fromarray(m).save(mp)
            imgs.append(ip); masks.append(mp)
        t, v = P.stratified_split(imgs, masks, 0.25, {"persian_0"}, seed=0)
        names = [p[0].stem for p in t + v]
        assert "persian_0" not in names and len(names) == 3


class TestRunPipeline:
    def _make_raw(self, root, n_train=6, n_test=2):
        rng = np.random.default_rng(2)
        for split, n in [("Train", n_train), ("Test", n_test)]:
            (root / split / "color").mkdir(parents=True)
            (root / split / "label").mkdir(parents=True)
            for i in range(n):
                cls = 1 if i % 2 == 0 else 2
                name = f"{'persian' if cls == 1 else 'beagle'}_{i}"
                h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
                img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(root / split / "color" / f"{name}.jpg"), img)
                if split == "Train":
                    m = np.zeros((h, w), np.uint8)
                    m[h // 4: h // 2, w // 4: w // 2] = cls
                    m[0:2, :] = 255
                else:
                    m = np.zeros((h, w), np.uint8)
                    m[h // 4: h // 2, w // 4: w // 2] = 128
                    m[0:2, :] = 255
                Image.fromarray(m).save(root / split / "label" / f"{name}.png")

    def test_schema_and_values(self, tmp_path):
        raw = tmp_path / "raw"
        processed = tmp_path / "processed"
        self._make_raw(raw)
        stats = P.run_pipeline(raw, processed, val_ratio=0.34, seed=1, verbose=False)
        assert (processed / "Train" / "resized").exists()
        assert (processed / "Train" / "resized_label").exists()
        assert (processed / "Val" / "processed_labels").exists()
        assert (processed / "Test" / "processed_labels").exists()
        # Train masks are 512² with class values preserved
        for p in (processed / "Train" / "resized_label").glob("*.png"):
            m = np.array(Image.open(p))
            assert m.shape == (512, 512)
            assert set(np.unique(m)) <= {0, 1, 2, 255}
        # Test masks stay at ORIGINAL size, remapped from 128
        for p in (processed / "Test" / "processed_labels").glob("*.png"):
            m = np.array(Image.open(p))
            assert m.shape != (512, 512)
            assert set(np.unique(m)) <= {0, 1, 2, 255}
            assert (1 in m) or (2 in m)
        assert stats["train"]["errors"] == 0


class TestLoader:
    def _make_processed(self, root, n=5, with_aug=True):
        rng = np.random.default_rng(3)
        (root / "resized").mkdir(parents=True)
        (root / "resized_label").mkdir(parents=True)
        for i in range(n):
            img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "resized" / f"img_{i}.jpg"), img)
            m = np.zeros((512, 512), np.uint8)
            m[100:200, 100:200] = 1
            m[90:100, 90:210] = 255
            m[300, 300] = 99  # stray value, must be clamped to 0
            Image.fromarray(m).save(root / "resized_label" / f"img_{i}.png")
        if with_aug:
            (root / "augmented" / "images").mkdir(parents=True)
            (root / "augmented" / "masks").mkdir(parents=True)
            img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "augmented" / "images" / "img_0_aug0.jpg"), img)
            Image.fromarray(np.zeros((512, 512), np.uint8)).save(
                root / "augmented" / "masks" / "img_0_aug0.png")

    def test_item_contract(self, tmp_path):
        self._make_processed(tmp_path / "Train")
        ds = PetDataset(tmp_path / "Train" / "resized",
                        tmp_path / "Train" / "resized_label")
        assert len(ds) == 6  # 5 + 1 augmented
        item = ds.load_item(0)
        assert item["image"].shape == (512, 512, 3)
        assert item["image"].dtype == np.float32
        assert item["mask"].shape == (512, 512)
        assert set(np.unique(item["mask"])) <= {0, 1, 2, 255}  # 99 clamped
        # normalization: un-normalize must land in [0,1]
        un = item["image"] * IMAGENET_STD + IMAGENET_MEAN
        assert un.min() > -0.01 and un.max() < 1.01

    def test_reconstruction_mode(self, tmp_path):
        self._make_processed(tmp_path / "Train", with_aug=False)
        ds = PetDataset(tmp_path / "Train" / "resized", None,
                        mode="reconstruction")
        item = ds.load_item(0)
        np.testing.assert_array_equal(item["image"], item["target"])
        assert item["image"].min() >= 0 and item["image"].max() <= 1

    def test_batch_iterator(self, tmp_path):
        self._make_processed(tmp_path / "Train", with_aug=False)
        ds = PetDataset(tmp_path / "Train" / "resized",
                        tmp_path / "Train" / "resized_label")
        batches = list(batch_iterator(ds, 2, shuffle=True, seed=0, drop_last=True))
        assert len(batches) == 2  # 5 items, drop_last → 2 batches
        assert batches[0]["image"].shape == (2, 512, 512, 3)
        assert "index" in batches[0]
        # determinism
        again = list(batch_iterator(ds, 2, shuffle=True, seed=0, drop_last=True))
        np.testing.assert_array_equal(batches[0]["index"], again[0]["index"])

    def test_batch_iterator_thread_count_invariant(self, tmp_path):
        # Batches are identical regardless of decode parallelism (items are
        # loaded by per-item futures but consumed in submission order).
        self._make_processed(tmp_path / "Train", with_aug=False)
        ds = PetDataset(tmp_path / "Train" / "resized",
                        tmp_path / "Train" / "resized_label")
        one = list(batch_iterator(ds, 2, shuffle=True, seed=3, num_threads=1))
        many = list(batch_iterator(ds, 2, shuffle=True, seed=3, num_threads=8))
        assert len(one) == len(many)
        for a, b in zip(one, many):
            np.testing.assert_array_equal(a["index"], b["index"])
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["mask"], b["mask"])

    def test_decode_cache_bit_identical(self, tmp_path):
        """Cache round-trip is bit-identical to the direct decode path, for
        every key — the decode-once memmap cache must never change pixels."""
        self._make_processed(tmp_path / "Train")
        args = (tmp_path / "Train" / "resized",
                tmp_path / "Train" / "resized_label")
        direct = PetDataset(*args)
        cached = PetDataset(*args, cache_dir=tmp_path / "cache")
        assert cached._cache is not None
        for i in range(len(direct)):
            a, b = direct.load_item(i), cached.load_item(i)
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        # Second open: warm cache, no rebuild (manifest matches)
        d2 = PetDataset(*args, cache_dir=tmp_path / "cache")
        np.testing.assert_array_equal(
            d2.load_item(0)["image"], direct.load_item(0)["image"])

    def test_decode_cache_invalidation(self, tmp_path):
        """Touching a source file (new mtime/size) rebuilds the cache."""
        self._make_processed(tmp_path / "Train", with_aug=False)
        args = (tmp_path / "Train" / "resized",
                tmp_path / "Train" / "resized_label")
        cached = PetDataset(*args, cache_dir=tmp_path / "cache")
        before = cached.load_item(0)["image"].copy()
        # Overwrite img_0 with different pixels (and a new mtime)
        rng = np.random.default_rng(99)
        cv2.imwrite(str(tmp_path / "Train" / "resized" / "img_0.jpg"),
                    (rng.random((512, 512, 3)) * 255).astype(np.uint8))
        fresh = PetDataset(*args, cache_dir=tmp_path / "cache")
        after = fresh.load_item(0)["image"]
        assert not np.array_equal(before, after)
        np.testing.assert_array_equal(
            after, PetDataset(*args).load_item(0)["image"])

    def test_decode_cache_reconstruction_and_clip(self, tmp_path):
        """Cache covers the AE (no-mask) and CLIP (224² view) schemas."""
        self._make_processed(tmp_path / "Train", with_aug=False)
        recon_args = dict(mode="reconstruction")
        a = PetDataset(tmp_path / "Train" / "resized", None, **recon_args)
        b = PetDataset(tmp_path / "Train" / "resized", None,
                       cache_dir=tmp_path / "c1", **recon_args)
        for k, v in a.load_item(1).items():
            np.testing.assert_array_equal(v, b.load_item(1)[k], err_msg=k)
        clip_args = dict(clip_dir=tmp_path / "Train" / "resized_clip")
        c = PetDataset(tmp_path / "Train" / "resized",
                       tmp_path / "Train" / "resized_label", **clip_args)
        d = PetDataset(tmp_path / "Train" / "resized",
                       tmp_path / "Train" / "resized_label",
                       cache_dir=tmp_path / "c2", **clip_args)
        it_c, it_d = c.load_item(2), d.load_item(2)
        assert it_c["clip_image"].shape == (224, 224, 3)
        for k in it_c:
            np.testing.assert_array_equal(it_c[k], it_d[k], err_msg=k)

    def test_multihost_sharding(self, tmp_path):
        self._make_processed(tmp_path / "Train", with_aug=False)
        d0 = PetDataset(tmp_path / "Train" / "resized", None,
                        mode="reconstruction", process_index=0, process_count=2)
        d1 = PetDataset(tmp_path / "Train" / "resized", None,
                        mode="reconstruction", process_index=1, process_count=2)
        names0 = {p.name for p in d0.image_files}
        names1 = {p.name for p in d1.image_files}
        # EQUAL shards (unequal per-host file counts would desynchronize the
        # per-epoch batch counts → collective deadlock); the non-divisible
        # tail is padded by wrapping from the start, so every file is seen
        # by SOME host: 5 files / 2 hosts → 3 + 3 with one duplicate.
        assert len(d0.image_files) == len(d1.image_files) == 3
        assert names0 | names1 == {f"img_{i}.jpg" for i in range(5)}
        assert len(names0 & names1) <= 1  # only the wrap-pad duplicate

    def test_multihost_sharding_fewer_files_than_hosts(self, tmp_path):
        # Wrap-pad must be MODULAR: 2 files / 5 hosts pads by repeating the
        # list (not files[:pad], which is short) so every host still gets a
        # non-empty, equal shard and no host deadlocks with zero batches.
        root = tmp_path / "Train" / "resized"
        root.mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(root / f"img_{i}.jpg"),
                        np.zeros((8, 8, 3), np.uint8))
        shards = [
            PetDataset(root, None, mode="reconstruction",
                       process_index=p, process_count=5).image_files
            for p in range(5)
        ]
        assert all(len(s) == 1 for s in shards)
        names = {f.name for s in shards for f in s}
        assert names == {"img_0.jpg", "img_1.jpg"}

    def test_blank_fallback_on_missing_mask(self, tmp_path):
        self._make_processed(tmp_path / "Train", with_aug=False)
        import os
        os.remove(tmp_path / "Train" / "resized_label" / "img_0.png")
        ds = PetDataset(tmp_path / "Train" / "resized",
                        tmp_path / "Train" / "resized_label")
        item = ds.load_item(0)  # must not raise — blank fallback sample
        assert item["mask"].max() == 0


class TestEvalProtocol:
    def test_resize_nearest_np_matches_device(self):
        from unet_implementations_tpu.recipes.common import resize_nearest_np
        import jax.numpy as jnp
        from unet_implementations_tpu.ops.resize import resize_nearest

        rng = np.random.default_rng(7)
        arr = rng.integers(0, 3, (512, 512)).astype(np.uint8)
        for size in [(375, 500), (333, 217)]:
            host = resize_nearest_np(arr, size)
            dev = np.asarray(resize_nearest(jnp.asarray(arr), size))
            np.testing.assert_array_equal(host, dev)

    def test_evaluate_segmentation_perfect_prediction(self, tmp_path):
        # A predict_fn that returns the ground truth must score 1.0
        root = tmp_path / "Test"
        rng = np.random.default_rng(8)
        (root / "resized").mkdir(parents=True)
        (root / "processed_labels").mkdir(parents=True)
        originals = {}
        for i in range(3):
            img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "resized" / f"img_{i}.jpg"), img)
            oh, ow = int(rng.integers(300, 400)), int(rng.integers(300, 400))
            m = np.zeros((oh, ow), np.uint8)
            m[50:150, 50:150] = 1 + (i % 2)
            Image.fromarray(m).save(root / "processed_labels" / f"img_{i}.png")
            originals[f"img_{i}"] = m

        from unet_implementations_tpu.recipes.common import evaluate_segmentation

        ds = PetDataset(root / "resized", root / "processed_labels",
                        include_augmented=False)

        def predict_fn(batch):
            return batch["mask"]  # echo the 512² ground truth

        res = evaluate_segmentation(predict_fn, ds, batch_size=2,
                                    output_dir=tmp_path / "out", verbose=False)
        assert res["pixel_accuracy"] == pytest.approx(1.0)
        assert res["mean_foreground_dice"] == pytest.approx(1.0)
        assert (tmp_path / "out" / "evaluation_results.json").exists()

    def test_evaluate_segmentation_mesh_sharded_matches_unsharded(self, tmp_path):
        """The mesh-sharded, pipelined eval path returns bit-identical
        metrics to the serial single-device path (8-device CPU mesh)."""
        import jax
        import jax.numpy as jnp
        from unet_implementations_tpu.parallel import create_mesh
        from unet_implementations_tpu.recipes.common import evaluate_segmentation

        root = tmp_path / "Test"
        rng = np.random.default_rng(9)
        (root / "resized").mkdir(parents=True)
        (root / "processed_labels").mkdir(parents=True)
        for i in range(10):  # batch 8 -> one full + one tail batch
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "resized" / f"img_{i}.jpg"), img)
            oh, ow = int(rng.integers(40, 80)), int(rng.integers(40, 80))
            m = rng.integers(0, 3, (oh, ow)).astype(np.uint8)
            Image.fromarray(m).save(root / "processed_labels" / f"img_{i}.png")

        ds = PetDataset(root / "resized", root / "processed_labels",
                        include_augmented=False, target_size=(64, 64))

        @jax.jit
        def model(images):
            # Deterministic pseudo-model: channel argmax of a fixed projection.
            w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)),
                            jnp.float32)
            return jnp.argmax(images.astype(jnp.float32) @ w, axis=-1).astype(
                jnp.int32)

        def predict_fn(batch):
            return model(jnp.asarray(batch["image"]))

        serial = evaluate_segmentation(predict_fn, ds, batch_size=8, verbose=False)
        sharded = evaluate_segmentation(predict_fn, ds, batch_size=8,
                                        mesh=create_mesh(), verbose=False)
        for k in ("pixel_accuracy", "mean_iou", "mean_foreground_dice"):
            assert serial[k] == pytest.approx(sharded[k], abs=1e-9), k

    def test_probs_fn_called_only_for_visualized_batches(self, tmp_path):
        # probs_fn is a SECOND full model forward (softmax probabilities for
        # confidence maps). It must run only for the batches that will render
        # — never once per batch when visualize_samples == 0.
        from unet_implementations_tpu.recipes.common import evaluate_segmentation

        root = tmp_path / "Test"
        rng = np.random.default_rng(11)
        (root / "resized").mkdir(parents=True)
        (root / "processed_labels").mkdir(parents=True)
        for i in range(6):  # batch 2 -> 3 batches
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "resized" / f"img_{i}.jpg"), img)
            m = rng.integers(0, 3, (64, 64)).astype(np.uint8)
            Image.fromarray(m).save(root / "processed_labels" / f"img_{i}.png")
        ds = PetDataset(root / "resized", root / "processed_labels",
                        include_augmented=False, target_size=(64, 64))

        calls = []

        def probs_fn(batch):
            calls.append(1)
            b = batch["image"].shape[0]
            return np.full((b, 64, 64, 3), 1 / 3, np.float32)

        def predict_fn(batch):
            return np.asarray(batch["mask"])

        evaluate_segmentation(predict_fn, ds, batch_size=2, verbose=False,
                              output_dir=tmp_path / "o0",
                              visualize_samples=0, probs_fn=probs_fn)
        assert calls == []
        evaluate_segmentation(predict_fn, ds, batch_size=2, verbose=False,
                              output_dir=tmp_path / "o1",
                              visualize_samples=1, probs_fn=probs_fn)
        assert len(calls) == 1
        assert (tmp_path / "o1" / "visualizations"
                / "confidence_batch0.png").exists()


class TestEvaluateReconstruction:
    def test_matches_bruteforce_oracle(self, tmp_path):
        """The pipelined on-device metric path == per-image numpy oracle
        (reference protocol: mean over per-image MSE/PSNR/SSIM,
        AE_pretrained/reconstruction/src/evaluate.py)."""
        import jax.numpy as jnp
        from unet_implementations_tpu.ops.losses import psnr, ssim
        from unet_implementations_tpu.recipes.common import (
            evaluate_reconstruction,
        )

        root = tmp_path / "Test"
        rng = np.random.default_rng(13)
        (root / "resized").mkdir(parents=True)
        for i in range(5):  # batch 2 -> two full + one tail batch
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / "resized" / f"img_{i}.jpg"), img)

        ds = PetDataset(root / "resized", None, include_augmented=False,
                        mode="reconstruction", target_size=(64, 64))

        def recon_fn(batch):  # deterministic pseudo-model: dimmed input
            return jnp.asarray(batch["image"]) * 0.9

        res = evaluate_reconstruction(recon_fn, ds, batch_size=2,
                                      output_dir=tmp_path / "out",
                                      verbose=False)

        mses, psnrs, ssims = [], [], []
        for batch in batch_iterator(ds, 1, shuffle=False, num_threads=1):
            r = np.asarray(batch["image"], np.float32) * 0.9
            t = np.asarray(batch["target"], np.float32)
            mses.append(float(np.mean((r - t) ** 2)))
            psnrs.append(float(psnr(jnp.asarray(r), jnp.asarray(t))[0]))
            ssims.append(float(ssim(jnp.asarray(r), jnp.asarray(t))[0]))

        assert res["num_images"] == 5
        assert res["mse"] == pytest.approx(np.mean(mses), rel=1e-5)
        assert res["psnr"] == pytest.approx(np.mean(psnrs), rel=1e-5)
        assert res["ssim"] == pytest.approx(np.mean(ssims), rel=1e-5)
        assert (tmp_path / "out" / "reconstruction_metrics.json").exists()
