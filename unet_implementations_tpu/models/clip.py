"""Frozen CLIP image encoder as a Flax ViT (TPU-native replacement).

The reference wraps the OpenAI ``clip`` package's ViT and uses ONLY the
global image embedding: ``encode_image`` under no_grad → (B, 512), broadcast
over a 16×16 grid at the UNet bottleneck (``CLIP_UNet/models/unet.py:
494-618`` — despite the "PatchExtractor" name, no patch tokens are used).

Here the visual tower is implemented directly in Flax (patch conv → class
token + positional embeddings → pre-LN transformer with QuickGELU → ln_post
→ projection), with a converter from an OpenAI/open_clip torch ``state_dict``
(``load_torch_clip_weights``) since this environment has no network egress to
fetch pretrained weights. Without weights the encoder runs randomly
initialized — functionally complete, documented as non-pretrained. The tower
AND the converter are verified full-stack against HuggingFace's independent
torch CLIP implementation at real ViT-B/16 size: a checkpoint in the exact
OpenAI ``visual.*`` key schema round-trips through the converter and our
``image_embeds`` match torch's (``tests/test_clip.py::TestHFOracle``) — a
real ``ViT-B-16.pt`` differs only in the parameter values. The
fusion path itself is exercised either way, and the reference's published
CLIP eval ran *without* CLIP conditioning anyway (``CLIP_UNet/src/
evaluate.py`` passes no features).

Precomputed-embedding caching lives in the recipe
(``recipes/clip_unet.py::_embedding_table``) — the cheaper equivalent of the
reference's frozen no-grad usage.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


CLIP_CONFIGS: Dict[str, CLIPVisionConfig] = {
    "ViT-B/16": CLIPVisionConfig(patch_size=16, width=768, layers=12, heads=12,
                                 output_dim=512),
    "ViT-B/32": CLIPVisionConfig(patch_size=32, width=768, layers=12, heads=12,
                                 output_dim=512),
    "ViT-L/14": CLIPVisionConfig(patch_size=14, width=1024, layers=24, heads=16,
                                 output_dim=768),
}


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 * x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.width,
            out_features=self.width,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_proj")(y)
        return x + y


class CLIPVisionTransformer(nn.Module):
    config: CLIPVisionConfig = CLIP_CONFIGS["ViT-B/16"]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """NHWC images (B, 224, 224, 3) → global embeddings (B, output_dim)."""
        cfg = self.config
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(images.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, cfg.grid * cfg.grid, cfg.width)

        class_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,), jnp.float32
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.grid * cfg.grid + 1, cfg.width), jnp.float32,
        )
        cls = jnp.broadcast_to(class_emb.astype(self.dtype), (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1) + pos_emb.astype(self.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, dtype=self.dtype, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(cfg.width**-0.5),
            (cfg.width, cfg.output_dim), jnp.float32,
        )
        return (x.astype(jnp.float32) @ proj).astype(jnp.float32)


class ClipFeatureExtractor:
    """Frozen extractor: (B, 224, 224, 3) NHWC → (B, output_dim).

    The jitted apply runs under stop_gradient semantics by construction (the
    params never enter the optimizer). On any load failure the reference
    returns zeros (``CLIP_UNet/models/unet.py:615-618``); ``zeros=True``
    reproduces that fallback explicitly.
    """

    def __init__(
        self,
        model_name: str = "ViT-B/16",
        weights_path: Optional[str | Path] = None,
        dtype: Any = jnp.bfloat16,
        zeros: bool = False,
    ):
        self.config = CLIP_CONFIGS[model_name]
        self.model = CLIPVisionTransformer(self.config, dtype=dtype)
        self.zeros = zeros
        self.output_dim = self.config.output_dim
        if zeros:
            self.params = None
        else:
            rng = jax.random.key(0)
            dummy = jnp.zeros((1, self.config.image_size, self.config.image_size, 3))
            self.params = self.model.init(rng, dummy)["params"]
            if weights_path is not None:
                self.params = load_torch_clip_weights(weights_path, self.params)
            self._apply = jax.jit(
                lambda p, imgs: self.model.apply({"params": p}, imgs)
            )

    def __call__(self, images: jax.Array) -> jax.Array:
        if self.zeros:
            return jnp.zeros((images.shape[0], self.output_dim), jnp.float32)
        if images.dtype == jnp.uint8:
            # Raw uint8 clip view from an emit_uint8 loader: apply the host
            # loader's exact normalization in-graph (ImageNet stats — the
            # reference quirk, CLIP_UNet/src/train.py:303-308 applied to the
            # clip image too). ops/normalize.py.
            from unet_implementations_tpu.ops.normalize import normalize_image

            images = normalize_image(images)
        if images.shape[1:3] != (self.config.image_size, self.config.image_size):
            from unet_implementations_tpu.ops.resize import resize_bilinear

            images = resize_bilinear(
                images, (self.config.image_size, self.config.image_size),
                spatial_axes=(1, 2),
            )
        return self._apply(self.params, images)


def load_torch_clip_weights(path: str | Path, abstract_params: Dict) -> Dict:
    """Convert a CLIP torch state_dict (visual tower) to our tree.

    Accepts any of the common on-disk formats — all share the OpenAI ViT
    attribute naming for the visual tower:
    - an OpenAI CLIP state dict (keys ``visual.*``) or visual-only dump;
    - an open_clip checkpoint: ``{"state_dict": {...}}`` wrapper and/or
      DDP ``module.`` prefixes (open_clip's VisionTransformer keeps the
      OpenAI resblock naming for ViT-B/16, B/32, L/14);
    - a TorchScript archive (OpenAI's published ``ViT-B-16.pt`` download).
    Requires torch to deserialize.
    """
    import torch

    try:
        sd = torch.load(str(path), map_location="cpu", weights_only=False)
    except Exception:
        sd = torch.jit.load(str(path), map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]  # open_clip wrapper
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    prefix = "visual." if any(k.startswith("visual.") for k in sd) else ""

    def get(name):
        return np.asarray(sd[prefix + name].float().numpy())

    p = jax.tree.map(np.asarray, abstract_params)
    width = p["class_embedding"].shape[0]

    p["patch_embed"]["kernel"] = get("conv1.weight").transpose(2, 3, 1, 0)
    p["class_embedding"] = get("class_embedding")
    p["positional_embedding"] = get("positional_embedding")
    p["ln_pre"]["scale"] = get("ln_pre.weight")
    p["ln_pre"]["bias"] = get("ln_pre.bias")
    p["ln_post"]["scale"] = get("ln_post.weight")
    p["ln_post"]["bias"] = get("ln_post.bias")
    p["proj"] = get("proj")

    n_layers = len([k for k in p if k.startswith("block_")])
    for i in range(n_layers):
        blk = p[f"block_{i}"]
        base = f"transformer.resblocks.{i}."
        blk["ln_1"]["scale"] = get(base + "ln_1.weight")
        blk["ln_1"]["bias"] = get(base + "ln_1.bias")
        blk["ln_2"]["scale"] = get(base + "ln_2.weight")
        blk["ln_2"]["bias"] = get(base + "ln_2.bias")
        w_qkv = get(base + "attn.in_proj_weight")  # (3*W, W)
        b_qkv = get(base + "attn.in_proj_bias")
        wq, wk, wv = np.split(w_qkv, 3, axis=0)
        bq, bk, bv = np.split(b_qkv, 3, axis=0)
        heads = blk["attn"]["query"]["kernel"].shape[1]
        head_dim = width // heads

        def fmt_w(w):  # torch (out, in) → flax (in, heads, head_dim)
            return w.T.reshape(width, heads, head_dim)

        def fmt_b(b):
            return b.reshape(heads, head_dim)

        blk["attn"]["query"]["kernel"] = fmt_w(wq)
        blk["attn"]["key"]["kernel"] = fmt_w(wk)
        blk["attn"]["value"]["kernel"] = fmt_w(wv)
        blk["attn"]["query"]["bias"] = fmt_b(bq)
        blk["attn"]["key"]["bias"] = fmt_b(bk)
        blk["attn"]["value"]["bias"] = fmt_b(bv)
        w_out = get(base + "attn.out_proj.weight")  # (W, W)
        blk["attn"]["out"]["kernel"] = w_out.T.reshape(heads, head_dim, width)
        blk["attn"]["out"]["bias"] = get(base + "attn.out_proj.bias")
        blk["mlp_fc"]["kernel"] = get(base + "mlp.c_fc.weight").T
        blk["mlp_fc"]["bias"] = get(base + "mlp.c_fc.bias")
        blk["mlp_proj"]["kernel"] = get(base + "mlp.c_proj.weight").T
        blk["mlp_proj"]["bias"] = get(base + "mlp.c_proj.bias")

    return jax.tree.map(jnp.asarray, p)
