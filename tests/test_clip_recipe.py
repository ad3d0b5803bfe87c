"""CLIP recipe plumbing: embedding cache vs live extraction, online augment."""

import numpy as np
import cv2
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from unet_implementations_tpu.data.loader import PetDataset, batch_iterator
from unet_implementations_tpu.recipes.clip_unet import _attach_features, _embedding_table
from unet_implementations_tpu.recipes.common import (
    wrap_online_augment,
    wrap_online_augment_clip,
)


class FakeExtractor:
    """Deterministic stand-in: embedding = per-image mean stats."""

    output_dim = 8

    def __call__(self, clip_images):
        x = jnp.asarray(clip_images, jnp.float32)
        means = jnp.mean(x, axis=(1, 2))  # (B, 3)
        return jnp.tile(means, (1, 3))[:, : self.output_dim]


def _make_ds(root, n=5):
    rng = np.random.default_rng(0)
    (root / "resized").mkdir(parents=True)
    (root / "resized_label").mkdir(parents=True)
    for i in range(n):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "resized" / f"img_{i}.jpg"), img)
        m = np.zeros((64, 64), np.uint8)
        m[10:30, 10:30] = 1 + (i % 2)
        Image.fromarray(m).save(root / "resized_label" / f"img_{i}.png")
    return PetDataset(root / "resized", root / "resized_label",
                      include_augmented=False, target_size=(64, 64),
                      clip_dir=root / "resized", clip_size=32)


class TestEmbeddingCache:
    def test_cached_equals_live(self, tmp_path):
        ds = _make_ds(tmp_path)
        ex = FakeExtractor()
        table = _embedding_table(ex, ds, batch_size=2)
        assert table.shape == (5, 8)

        live = list(_attach_features(
            batch_iterator(ds, 2, shuffle=True, seed=3), ex, None))
        cached = list(_attach_features(
            batch_iterator(ds, 2, shuffle=True, seed=3), ex, table))
        for a, b in zip(live, cached):
            np.testing.assert_array_equal(a["index"], b["index"])
            np.testing.assert_allclose(
                np.asarray(a["clip_features"]), np.asarray(b["clip_features"]),
                rtol=1e-5, atol=1e-6,
            )
            assert "clip_image" not in a and "clip_image" not in b

    def test_table_indexed_by_dataset_order(self, tmp_path):
        ds = _make_ds(tmp_path)
        ex = FakeExtractor()
        table = _embedding_table(ex, ds, batch_size=3)
        item = ds.load_item(2)
        expected = np.asarray(ex(jnp.asarray(item["clip_image"][None])))[0]
        np.testing.assert_allclose(table[2], expected, rtol=1e-5, atol=1e-6)


class TestEmbeddingDump:
    def test_dump_and_reload_row_alignment(self, tmp_path, monkeypatch):
        """The embed CLI's tables reload row-aligned by filename, and a
        model-name mismatch falls back to live extraction."""
        import unet_implementations_tpu.recipes.clip_unet as cu

        _make_ds(tmp_path / "Train")
        _make_ds(tmp_path / "Val", n=3)
        monkeypatch.setattr(cu, "ClipFeatureExtractor",
                            lambda *a, **k: FakeExtractor())
        written = cu.dump_embeddings(
            tmp_path, tmp_path / "emb", clip_model="ViT-B/16",
            splits=("Train", "Val"), verbose=False)
        assert set(written) == {"Train", "Val"}

        # Same clip_size as the dump's internal dataset (default 224) so the
        # recomputed expectation sees identical pixels.
        ds = PetDataset(tmp_path / "Train" / "resized",
                        tmp_path / "Train" / "resized_label",
                        include_augmented=False, target_size=(64, 64),
                        clip_dir=tmp_path / "Train" / "resized_clip")
        table = cu._load_embedding_table(
            tmp_path / "emb", "Train", ds, "ViT-B/16", verbose=False)
        # dump_embeddings used clip_dir=resized_clip (absent) -> loader
        # fallback resize path; recompute directly and compare rows.
        expected = cu._embedding_table(FakeExtractor(), ds, batch_size=2)
        np.testing.assert_allclose(table, expected, rtol=1e-5, atol=1e-6)

        assert cu._load_embedding_table(
            tmp_path / "emb", "Train", ds, "ViT-L/14", verbose=False) is None
        assert cu._load_embedding_table(
            tmp_path / "emb", "Test", ds, "ViT-B/16", verbose=False) is None


class TestClipDim:
    def test_vit_l14_dim_threads_through_model(self):
        # ViT-L/14 embeds at 768, not 512 — the fusion conv must be sized
        # from the encoder variant (regression: hardcoded 512 crashed L/14).
        from unet_implementations_tpu.models.clip import CLIP_CONFIGS
        from unet_implementations_tpu.recipes.clip_unet import build_model

        dim = CLIP_CONFIGS["ViT-L/14"].output_dim
        assert dim == 768
        model = build_model(jnp.float32, clip_dim=dim)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, dim))
        )["params"]
        kernel = params["clip_fusion_conv"]["kernel"]
        assert kernel.shape[2] == 512 + dim  # bottleneck 512 + clip 768
        out = model.apply({"params": params}, jnp.zeros((1, 32, 32, 3)),
                          jnp.zeros((1, dim)))
        assert out.shape == (1, 32, 32, 3)


class TestOnlineAugmentWrapper:
    def test_normalizes_and_keeps_labels_valid(self, tmp_path):
        ds = _make_ds(tmp_path)
        ds.normalize = False  # [0,1] images as the online path expects
        batches = list(wrap_online_augment(
            batch_iterator(ds, 2, drop_last=True), epoch=0, seed=0))
        assert batches
        for b in batches:
            img = np.asarray(b["image"])
            # ImageNet-normalized output: roughly zero-centered
            assert img.min() < -0.5 and img.max() > 0.5
            assert set(np.unique(np.asarray(b["mask"]))) <= {0, 1, 2, 255}

    @pytest.mark.slow
    def test_clip_wrapper_extracts_from_augmented_pixels(self, tmp_path):
        # Live extraction: features come from the AUGMENTED pixels (change
        # with the augmentation key), image/mask match the plain wrapper's
        # output for the same key, clip_image is dropped.
        ds = _make_ds(tmp_path)
        ds.normalize = False
        ds.clip_dir = None
        ex = FakeExtractor()
        batches = list(wrap_online_augment_clip(
            batch_iterator(ds, 2, drop_last=True), epoch=0, seed=0,
            extractor=ex))
        plain = list(wrap_online_augment(
            batch_iterator(ds, 2, drop_last=True), epoch=0, seed=0))
        assert batches
        for b, p in zip(batches, plain):
            assert "clip_image" not in b
            assert np.asarray(b["clip_features"]).shape == (2, ex.output_dim)
            np.testing.assert_allclose(
                np.asarray(b["image"]), np.asarray(p["image"]),
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(b["mask"]), np.asarray(p["mask"]))
        other = list(wrap_online_augment_clip(
            batch_iterator(ds, 2, drop_last=True), epoch=1, seed=0,
            extractor=ex))
        assert not np.allclose(
            np.asarray(batches[0]["clip_features"]),
            np.asarray(other[0]["clip_features"]),
        )
