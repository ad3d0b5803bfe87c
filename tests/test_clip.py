"""Tests for the Flax CLIP vision tower and feature extractor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_implementations_tpu.models.clip import (
    CLIP_CONFIGS,
    CLIPVisionConfig,
    CLIPVisionTransformer,
    ClipFeatureExtractor,
    load_torch_clip_weights,
    quick_gelu,
)


TINY = CLIPVisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                        heads=2, output_dim=16)


class TestVisionTower:
    def test_tiny_output_shape(self):
        model = CLIPVisionTransformer(TINY)
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16)
        assert out.dtype == jnp.float32

    def test_quick_gelu(self):
        x = jnp.asarray([-1.0, 0.0, 1.0])
        out = np.asarray(quick_gelu(x))
        expected = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_configs_grid(self):
        assert CLIP_CONFIGS["ViT-B/16"].grid == 14
        assert CLIP_CONFIGS["ViT-B/32"].grid == 7
        assert CLIP_CONFIGS["ViT-L/14"].grid == 16


class TestExtractor:
    def test_zeros_fallback(self):
        ex = ClipFeatureExtractor("ViT-B/16", zeros=True)
        out = ex(jnp.ones((3, 224, 224, 3)))
        assert out.shape == (3, 512)
        assert np.all(np.asarray(out) == 0)


class TestWeightConversion:
    def test_torch_state_dict_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")

        cfg = TINY
        model = CLIPVisionTransformer(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        params = model.init(jax.random.key(0), x)["params"]

        g = torch.Generator().manual_seed(0)
        w, grid, dim = cfg.width, cfg.grid, cfg.output_dim
        sd = {
            "visual.conv1.weight": torch.randn(w, 3, 16, 16, generator=g),
            "visual.class_embedding": torch.randn(w, generator=g),
            "visual.positional_embedding": torch.randn(grid * grid + 1, w, generator=g),
            "visual.ln_pre.weight": torch.randn(w, generator=g),
            "visual.ln_pre.bias": torch.randn(w, generator=g),
            "visual.ln_post.weight": torch.randn(w, generator=g),
            "visual.ln_post.bias": torch.randn(w, generator=g),
            "visual.proj": torch.randn(w, dim, generator=g),
        }
        for i in range(cfg.layers):
            b = f"visual.transformer.resblocks.{i}."
            sd.update({
                b + "ln_1.weight": torch.randn(w, generator=g),
                b + "ln_1.bias": torch.randn(w, generator=g),
                b + "ln_2.weight": torch.randn(w, generator=g),
                b + "ln_2.bias": torch.randn(w, generator=g),
                b + "attn.in_proj_weight": torch.randn(3 * w, w, generator=g),
                b + "attn.in_proj_bias": torch.randn(3 * w, generator=g),
                b + "attn.out_proj.weight": torch.randn(w, w, generator=g),
                b + "attn.out_proj.bias": torch.randn(w, generator=g),
                b + "mlp.c_fc.weight": torch.randn(4 * w, w, generator=g),
                b + "mlp.c_fc.bias": torch.randn(4 * w, generator=g),
                b + "mlp.c_proj.weight": torch.randn(w, 4 * w, generator=g),
                b + "mlp.c_proj.bias": torch.randn(w, generator=g),
            })
        path = tmp_path / "clip.pt"
        torch.save(sd, path)

        converted = load_torch_clip_weights(path, params)
        # spot-check exact value placement
        np.testing.assert_allclose(
            np.asarray(converted["class_embedding"]),
            sd["visual.class_embedding"].numpy(), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(converted["patch_embed"]["kernel"]),
            sd["visual.conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(converted["block_0"]["mlp_fc"]["kernel"]),
            sd["visual.transformer.resblocks.0.mlp.c_fc.weight"].numpy().T,
            rtol=1e-6,
        )
        # converted params must run
        out = model.apply({"params": converted}, jnp.ones((1, 32, 32, 3)))
        assert out.shape == (1, 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_attention_conversion_matches_torch(self, tmp_path):
        """The attention weight layout conversion must reproduce torch
        nn.MultiheadAttention numerics on the same input."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn_t

        w, heads, seq = 8, 2, 5
        mha = nn_t.MultiheadAttention(w, heads, batch_first=True)
        x = torch.randn(1, seq, w, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            ref, _ = mha(x, x, x, need_weights=False)

        from flax import linen as nn

        fl = nn.MultiHeadDotProductAttention(
            num_heads=heads, qkv_features=w, out_features=w)
        xj = jnp.asarray(x.numpy())
        params = fl.init(jax.random.key(0), xj, xj)["params"]

        wq, wk, wv = np.split(mha.in_proj_weight.detach().numpy(), 3, axis=0)
        bq, bk, bv = np.split(mha.in_proj_bias.detach().numpy(), 3, axis=0)
        hd = w // heads
        p = jax.tree.map(np.asarray, params)
        p["query"]["kernel"] = wq.T.reshape(w, heads, hd)
        p["key"]["kernel"] = wk.T.reshape(w, heads, hd)
        p["value"]["kernel"] = wv.T.reshape(w, heads, hd)
        p["query"]["bias"] = bq.reshape(heads, hd)
        p["key"]["bias"] = bk.reshape(heads, hd)
        p["value"]["bias"] = bv.reshape(heads, hd)
        p["out"]["kernel"] = mha.out_proj.weight.detach().numpy().T.reshape(heads, hd, w)
        p["out"]["bias"] = mha.out_proj.bias.detach().numpy()

        ours = np.asarray(fl.apply({"params": p}, xj, xj))
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)
