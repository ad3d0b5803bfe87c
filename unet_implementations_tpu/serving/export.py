"""Ahead-of-time model export for production serving (``jax.export``).

The reference's deployment story is "load the ``.pth`` and re-instantiate
the Python model class" (``Our_UNet/src/evaluate.py:147-160``) — serving
requires the full torch stack plus the exact model source at the right
version. The TPU-native answer is AOT export: serialize the **jitted
forward** to versioned StableHLO with ``jax.export``, so a serving host
replays the exact compiled computation with no model code, no Flax, and no
tracing — just JAX runtime + the artifact. Multi-platform lowerings
("tpu" and "cpu" by default) are baked into one module, so the same
artifact serves on a TPU pod and on a CPU canary. This works because the
entire inference path is pure XLA-lowerable ops (the Pallas upsample
variants are off-default; the s2d levels are plain convolutions —
``models/s2d.py``).

Artifact layout (a directory):

    forward.jaxexport   versioned serialized Exported (StableHLO + ABI)
    params/             Orbax PyTree of {"params": ...} (f32, from training)
    export_meta.json    recipe, batch/image geometry, platforms, versions

The loader rebuilds the abstract parameter tree **from the Exported
module's own input signature** (``in_tree``/``in_avals``) — no model class
is needed to restore the checkpoint into the right structure.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

ARTIFACT_FORWARD = "forward.jaxexport"
ARTIFACT_PARAMS = "params"
ARTIFACT_META = "export_meta.json"

# Recipes whose forward takes (params, image); clip_unet additionally takes
# the CLIP embedding table for the batch.
_IMAGE_ONLY_RECIPES = ("our_unet", "ae_transfer", "ae_recon")
_RECIPES = _IMAGE_ONLY_RECIPES + ("clip_unet",)


def _build_recipe_model(recipe: str, dtype, clip_dim: int):
    if recipe in ("our_unet", "ae_transfer"):
        from unet_implementations_tpu.models.unet import unet_6stage

        return unet_6stage(dtype=dtype)
    if recipe == "ae_recon":
        from unet_implementations_tpu.models.unet import autoencoder_6stage

        return autoencoder_6stage(dtype=dtype)
    if recipe == "clip_unet":
        from unet_implementations_tpu.models.unet import UNet

        return UNet(clip_fusion=True, clip_dim=clip_dim, dtype=dtype)
    raise ValueError(f"unknown recipe {recipe!r}; expected one of {_RECIPES}")


def export_forward(
    model,
    params,
    *,
    batch_size: int = 1,
    img_size: int = 512,
    clip_dim: Optional[int] = None,
    input_dtype=jnp.bfloat16,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> jax_export.Exported:
    """Export ``model``'s deterministic forward at a static serving shape.

    ``clip_dim`` not None exports ``fn(params, image, clip_features)`` for
    the CLIP-fusion variant; otherwise ``fn(params, image)``.
    """

    if clip_dim is None:

        def forward(params, image):
            return model.apply({"params": params}, image, deterministic=True)

        args = (
            params,
            jax.ShapeDtypeStruct((batch_size, img_size, img_size, 3), input_dtype),
        )
    else:

        def forward(params, image, clip_features):
            return model.apply(
                {"params": params}, image, clip_features, deterministic=True
            )

        args = (
            params,
            jax.ShapeDtypeStruct((batch_size, img_size, img_size, 3), input_dtype),
            jax.ShapeDtypeStruct((batch_size, clip_dim), input_dtype),
        )
    return jax_export.export(jax.jit(forward), platforms=tuple(platforms))(*args)


def save_exported(
    output_dir: str | Path,
    model,
    params,
    *,
    recipe: str = "our_unet",
    batch_size: int = 1,
    img_size: int = 512,
    clip_dim: Optional[int] = None,
    input_dtype=jnp.bfloat16,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Path:
    """Export + write the self-contained serving artifact directory."""
    import orbax.checkpoint as ocp

    output_dir = Path(output_dir).absolute()
    output_dir.mkdir(parents=True, exist_ok=True)

    exported = export_forward(
        model,
        params,
        batch_size=batch_size,
        img_size=img_size,
        clip_dim=clip_dim,
        input_dtype=input_dtype,
        platforms=platforms,
    )
    (output_dir / ARTIFACT_FORWARD).write_bytes(bytes(exported.serialize()))

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(output_dir / ARTIFACT_PARAMS, {"params": params}, force=True)
    ckptr.wait_until_finished()

    meta = {
        "recipe": recipe,
        "batch_size": int(batch_size),
        "img_size": int(img_size),
        "clip_dim": None if clip_dim is None else int(clip_dim),
        "input_dtype": jnp.dtype(input_dtype).name,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": int(exported.calling_convention_version),
        "output_shape": [int(d) for d in exported.out_avals[0].shape],
    }
    (output_dir / ARTIFACT_META).write_text(json.dumps(meta, indent=4))
    return output_dir


class ServingModel:
    """A loaded serving artifact: ``predict`` pads/slices to the exported
    static batch, so callers can send any batch size ≤ the exported one
    (larger inputs are processed in chunks)."""

    def __init__(self, exported: jax_export.Exported, params, meta: Dict[str, Any]):
        self.exported = exported
        self.params = params
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self._call = jax.jit(exported.call)

    def __call__(self, image, clip_features=None):
        """Raw exported call — shapes must match the export exactly."""
        if clip_features is None:
            return self._call(self.params, image)
        return self._call(self.params, image, clip_features)

    def predict(self, image, clip_features=None) -> np.ndarray:
        """Forward arbitrary-batch inputs through the static-batch module."""
        image = jnp.asarray(image)
        n, bs = image.shape[0], self.batch_size
        if n == 0:
            raise ValueError("predict() called with an empty batch")
        outs = []
        for lo in range(0, n, bs):
            chunk = image[lo : lo + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            if clip_features is not None:
                cf = jnp.asarray(clip_features)[lo : lo + bs]
                if pad:
                    cf = jnp.concatenate(
                        [cf, jnp.zeros((pad,) + cf.shape[1:], cf.dtype)]
                    )
                out = self(chunk, cf)
            else:
                out = self(chunk)
            outs.append(np.asarray(out[: bs - pad if pad else bs]))
        return np.concatenate(outs) if len(outs) > 1 else outs[0]


def _abstract_params_from_exported(exported: jax_export.Exported):
    """Rebuild the abstract params PyTree from the module's signature."""
    flat = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in exported.in_avals]
    args, _kwargs = jax.tree.unflatten(exported.in_tree, flat)
    return args[0]


def load_exported(path: str | Path) -> ServingModel:
    """Load a ``save_exported`` artifact; no model code required."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    exported = jax_export.deserialize(
        bytearray((path / ARTIFACT_FORWARD).read_bytes())
    )
    meta = json.loads((path / ARTIFACT_META).read_text())

    abstract = _abstract_params_from_exported(exported)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path / ARTIFACT_PARAMS, {"params": abstract})
    return ServingModel(exported, restored["params"], meta)


def export_recipe_checkpoint(
    model_path: str | Path,
    output_dir: str | Path,
    *,
    recipe: str = "our_unet",
    batch_size: int = 1,
    img_size: int = 512,
    clip_dim: int = 512,
    dtype=jnp.bfloat16,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Tuple[Path, Dict[str, Any]]:
    """CLI body: restore a training checkpoint and export it for serving."""
    from unet_implementations_tpu.training.checkpoint import restore_params

    use_clip = recipe == "clip_unet"
    model = _build_recipe_model(recipe, dtype, clip_dim)
    if use_clip:
        abstract = model.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 3), dtype),
            jnp.zeros((1, clip_dim), dtype),
        )["params"]
    else:
        abstract = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), dtype))[
            "params"
        ]
    params = restore_params(model_path, abstract)
    out = save_exported(
        output_dir,
        model,
        params,
        recipe=recipe,
        batch_size=batch_size,
        img_size=img_size,
        clip_dim=clip_dim if use_clip else None,
        input_dtype=dtype,
        platforms=platforms,
    )
    meta = json.loads((out / ARTIFACT_META).read_text())
    return out, meta
