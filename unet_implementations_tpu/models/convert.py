"""Torch↔Flax UNet checkpoint conversion.

Lets users of the reference PyTorch suite bring their trained weights into
this framework (and validates architecture parity bit-for-bit). The torch
state-dict layout (``Our_UNet/models/unet.py``):

    encoder_stages.{i}.block.{idx}.weight/bias     Conv2d / InstanceNorm2d
    decoder_stages.{d}.conv_block.block.{idx}....
    segmentation_output.weight/bias                (1x1 head)
    reconstruction_output.0.weight/bias            (AE: Conv2d + Sigmoid)
    clip_fusion_conv.{0,1}.weight/bias             (CLIP variant fusion)

Inside each ``block`` Sequential, every conv contributes
[Conv2d, InstanceNorm2d, LeakyReLU(, SpatialDropout2d)] — activation/dropout
own no params but OCCUPY indices, so the per-conv stride is 3 without
dropout and 4 with (dropout present iff the stage's rate > 0).

Weight layout maps: Conv2d (out,in,kh,kw) → HWIO; InstanceNorm weight/bias →
scale/bias.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np

from unet_implementations_tpu.models.unet import UNet


def _conv_np(w) -> np.ndarray:
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def torch_unet_state_dict_to_params(
    state_dict: Dict[str, "np.ndarray"],
    model: UNet,
) -> Dict:
    """Convert a reference UNet/Autoencoder torch state dict to our tree.

    ``state_dict`` values may be torch tensors or numpy arrays. The returned
    tree matches ``model.init(...)['params']`` exactly (names, shapes).
    """

    def get(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    n = model.n_stages
    params: Dict = {}

    def convert_block(prefix_t: str, n_convs: int, dropout_rate: float) -> Dict:
        step = 4 if dropout_rate > 0 else 3
        out = {}
        for j in range(n_convs):
            conv_idx = j * step
            norm_idx = j * step + 1
            out[f"conv_{j}"] = {
                "kernel": _conv_np(get(f"{prefix_t}.block.{conv_idx}.weight")),
                "bias": get(f"{prefix_t}.block.{conv_idx}.bias"),
            }
            out[f"norm_{j}"] = {
                "scale": get(f"{prefix_t}.block.{norm_idx}.weight"),
                "bias": get(f"{prefix_t}.block.{norm_idx}.bias"),
            }
        return out

    for i in range(n):
        params[f"encoder_{i}"] = convert_block(
            f"encoder_stages.{i}", model.n_conv_per_stage,
            model.encoder_dropout_rates[i],
        )
    for d in range(n - 1):
        params[f"decoder_{d}"] = {
            "conv_block": convert_block(
                f"decoder_stages.{d}.conv_block",
                model.n_conv_per_stage_decoder,
                model.decoder_dropout_rates[d],
            )
        }

    if model.head == "reconstruction":
        params["head"] = {
            "kernel": _conv_np(get("reconstruction_output.0.weight")),
            "bias": get("reconstruction_output.0.bias"),
        }
    else:
        params["head"] = {
            "kernel": _conv_np(get("segmentation_output.weight")),
            "bias": get("segmentation_output.bias"),
        }

    if model.clip_fusion and "clip_fusion_conv.0.weight" in state_dict:
        params["clip_fusion_conv"] = {
            "kernel": _conv_np(get("clip_fusion_conv.0.weight")),
            "bias": get("clip_fusion_conv.0.bias"),
        }
        params["clip_fusion_norm"] = {
            "scale": get("clip_fusion_conv.1.weight"),
            "bias": get("clip_fusion_conv.1.bias"),
        }

    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def load_torch_checkpoint(path, model: UNet) -> Dict:
    """Load a reference ``.pth`` checkpoint (full dict or bare state dict)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return torch_unet_state_dict_to_params(sd, model)


def _model_for_arch(arch: str) -> UNet:
    """The reference-trained model each CLI ``--arch`` value maps to (shared
    by ``convert`` and ``export_torch`` so the two directions can never
    disagree): our_unet | ae_transfer (the same 6-stage model) | ae_recon
    (sigmoid head) | clip_unet (bottleneck fusion, clip_dim 512 — the only
    variant the reference trained)."""
    from unet_implementations_tpu.models.unet import (
        autoencoder_6stage,
        unet_6stage,
    )

    if arch in ("our_unet", "ae_transfer"):
        return unet_6stage()
    if arch == "ae_recon":
        return autoencoder_6stage()
    if arch == "clip_unet":
        return UNet(clip_fusion=True)
    raise ValueError(f"unknown arch {arch!r}")


def convert_torch_checkpoint(
    torch_path,
    output_path,
    arch: str = "our_unet",
) -> None:
    """``.pth`` → Orbax checkpoint directory loadable by the evaluate CLIs.

    Preserves the torch checkpoint's epoch and best metric in the Orbax
    meta when present. See ``_model_for_arch`` for the ``arch`` values.
    """
    import jax.numpy as jnp
    import torch

    from unet_implementations_tpu.training import create_train_state, sgd_nesterov
    from unet_implementations_tpu.training.checkpoint import save_checkpoint

    model = _model_for_arch(arch)
    ckpt = torch.load(str(torch_path), map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    params = torch_unet_state_dict_to_params(sd, model)

    kwargs = (
        {"clip_features": jnp.zeros((1, model.clip_dim))}
        if model.clip_fusion else {}
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
        sgd_nesterov(), **kwargs,
    )
    state = state.replace(params=params)
    meta = ckpt if isinstance(ckpt, dict) else {}
    save_checkpoint(
        output_path, state,
        epoch=int(meta.get("epoch", 0)),
        best_metric=float(meta.get("best_dice", meta.get("best_loss", 0.0))),
        config={"converted_from": str(torch_path), "arch": arch},
    )


def _conv_torch(kernel) -> np.ndarray:
    """HWIO → torch Conv2d (out, in, kh, kw)."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(kernel, np.float32), (3, 2, 0, 1))
    )


def params_to_torch_unet_state_dict(params: Dict, model: UNet) -> Dict:
    """Inverse of ``torch_unet_state_dict_to_params``: our params tree →
    the reference's torch state-dict key/layout scheme, as numpy arrays.

    Emits EXACTLY the key set the reference model owns (its strict-mode
    ``load_state_dict``, ``Our_UNet/src/evaluate.py:103-147``, rejects
    missing or unexpected keys)."""
    n = model.n_stages
    sd: Dict[str, np.ndarray] = {}

    def to_np(x):
        return np.asarray(jax.device_get(x), np.float32)

    def emit_block(prefix_t: str, tree: Dict, n_convs: int, dropout: float):
        step = 4 if dropout > 0 else 3
        for j in range(n_convs):
            conv_idx, norm_idx = j * step, j * step + 1
            sd[f"{prefix_t}.block.{conv_idx}.weight"] = _conv_torch(
                tree[f"conv_{j}"]["kernel"])
            sd[f"{prefix_t}.block.{conv_idx}.bias"] = to_np(
                tree[f"conv_{j}"]["bias"])
            sd[f"{prefix_t}.block.{norm_idx}.weight"] = to_np(
                tree[f"norm_{j}"]["scale"])
            sd[f"{prefix_t}.block.{norm_idx}.bias"] = to_np(
                tree[f"norm_{j}"]["bias"])

    for i in range(n):
        emit_block(f"encoder_stages.{i}", params[f"encoder_{i}"],
                   model.n_conv_per_stage, model.encoder_dropout_rates[i])
    for d in range(n - 1):
        emit_block(f"decoder_stages.{d}.conv_block",
                   params[f"decoder_{d}"]["conv_block"],
                   model.n_conv_per_stage_decoder,
                   model.decoder_dropout_rates[d])

    head_key = ("reconstruction_output.0"
                if model.head == "reconstruction" else "segmentation_output")
    sd[f"{head_key}.weight"] = _conv_torch(params["head"]["kernel"])
    sd[f"{head_key}.bias"] = to_np(params["head"]["bias"])

    if model.clip_fusion and "clip_fusion_conv" in params:
        sd["clip_fusion_conv.0.weight"] = _conv_torch(
            params["clip_fusion_conv"]["kernel"])
        sd["clip_fusion_conv.0.bias"] = to_np(
            params["clip_fusion_conv"]["bias"])
        sd["clip_fusion_conv.1.weight"] = to_np(
            params["clip_fusion_norm"]["scale"])
        sd["clip_fusion_conv.1.bias"] = to_np(
            params["clip_fusion_norm"]["bias"])
    return sd


def export_torch_checkpoint(
    checkpoint_path,
    output_path,
    arch: str = "our_unet",
) -> None:
    """Orbax checkpoint directory → reference-loadable ``.pth``.

    The inverse of ``convert_torch_checkpoint``: a model trained HERE can be
    evaluated with the reference's own ``evaluate.py`` (its ``load_model``
    accepts either a bare state dict or a full checkpoint dict and reads
    ``model_state_dict`` — ``Our_UNet/src/evaluate.py:135-141``). Writes the
    reference trainer's checkpoint schema (``Our_UNet/src/train.py:709-714``:
    epoch / model_state_dict / best_dice) minus the torch-specific
    optimizer/scheduler states, which its load path never reads.
    """
    import json
    from pathlib import Path

    import jax.numpy as jnp
    import torch

    from unet_implementations_tpu.training.checkpoint import (
        META_FILE,
        restore_params,
    )

    model = _model_for_arch(arch)
    checkpoint_path = Path(checkpoint_path)
    kwargs = (
        {"clip_features": jnp.zeros((1, model.clip_dim))}
        if model.clip_fusion else {}
    )
    # eval_shape: restore_params only needs shapes/structure — materializing
    # ~30M real init values to immediately overwrite them is wasted startup.
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           **kwargs)
    )["params"]
    params = restore_params(checkpoint_path, abstract)
    sd = {
        k: torch.from_numpy(v)
        for k, v in params_to_torch_unet_state_dict(params, model).items()
    }

    meta = {}
    meta_file = checkpoint_path / META_FILE
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    torch.save(
        {
            "epoch": int(meta.get("epoch", 0)),
            "model_state_dict": sd,
            "best_dice": float(meta.get("best_metric", 0.0)),
            "config": {"exported_from": str(checkpoint_path), "arch": arch},
        },
        str(output_path),
    )
