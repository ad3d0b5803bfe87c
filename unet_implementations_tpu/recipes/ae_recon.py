"""AE_pretrained phase 1: autoencoder reconstruction pretraining.

Mirrors ``AE_pretrained/reconstruction/src/train.py:675-843`` /
``evaluate.py``: same-topology UNet with sigmoid head and lowered dropout,
Adam(1e-3, wd 1e-5) + cosine LR (T_max=epochs, eta_min=1e-6), [0,1] images
with target==input, early stopping on val loss (correct min-mode — the
reference AE early stopper is inverted, a documented bug we fix), PSNR/SSIM
evaluation writing ``reconstruction_metrics.json``, and optional latent-space
PCA/t-SNE analysis (``evaluate.py:380-440``).

The trained objective defaults to plain MSE — the reference parses
``--mse_weight/--perceptual_weight/--ssim_weight`` but
``get_loss_function()`` ignores them and returns ``nn.MSELoss()``
(``reconstruction/src/train.py:420-437``); pass nonzero perceptual/ssim
weights to actually enable the combined loss the reference intended.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.loader import PetDataset, batch_iterator
from unet_implementations_tpu.models.unet import autoencoder_6stage
from unet_implementations_tpu.ops.normalize import normalize_image
from unet_implementations_tpu.ops.losses import reconstruction_loss
from unet_implementations_tpu.parallel import create_mesh
from unet_implementations_tpu.ops.tuning import inference_jit
from unet_implementations_tpu.recipes.common import (
    check_grad_accum,
    evaluate_reconstruction,
)
from unet_implementations_tpu.training import (
    adam_l2,
    cosine_lr,
    create_train_state,
    make_reconstruction_eval_step,
)
from unet_implementations_tpu.training.checkpoint import (
    restore_checkpoint,
    restore_params,
)
from unet_implementations_tpu.training.loop import train_loop, write_training_config
from unet_implementations_tpu.training.train_state import TrainState

ARCH_CONFIG = {
    "head": "reconstruction",
    "n_stages": 6,
    "features_per_stage": [32, 64, 128, 256, 512, 512],
    "encoder_dropout_rates": [0.0, 0.0, 0.05, 0.1, 0.15, 0.15],
    "decoder_dropout_rates": [0.15, 0.1, 0.1, 0.05, 0.0],
}


def build_model(dtype=jnp.bfloat16):
    return autoencoder_6stage(dtype=dtype)


def make_datasets(data_dir: str | Path, emit_uint8: bool = True):
    # emit_uint8: raw uint8 batches; the reconstruction steps convert to
    # [0,1] in-graph (ops/normalize.py) — the 1-core-host starvation fix.
    data_dir = Path(data_dir)
    train = PetDataset(
        data_dir / "Train" / "resized", None, include_augmented=True,
        mode="reconstruction", emit_uint8=emit_uint8,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    val = PetDataset(
        data_dir / "Val" / "resized", None, include_augmented=False,
        mode="reconstruction", emit_uint8=emit_uint8,
    )
    return train, val


def make_loss_fn(mse_weight=1.0, perceptual_weight=0.0, ssim_weight=0.0,
                 feature_fns=None):
    """``loss_fn(state, params, batch, rng) -> loss`` for the composite AE
    objective — the shape ``training.steps.make_accum_train_step`` consumes.
    ``feature_fns`` (``models/vgg.py::make_features_fn``) is required for
    a nonzero ``perceptual_weight`` — ``train`` wires it automatically."""
    if perceptual_weight > 0 and feature_fns is None:
        raise ValueError(
            "perceptual_weight > 0 requires feature_fns "
            "(models/vgg.py::make_features_fn)"
        )

    def loss_fn(state, params, batch, rng):
        recon = state.apply_fn(
            {"params": params},
            normalize_image(batch["image"], mode="unit"),
            deterministic=False, rngs={"dropout": rng},
        )
        return reconstruction_loss(
            recon, normalize_image(batch["target"], mode="unit"),
            mse_weight=mse_weight,
            perceptual_weight=perceptual_weight, ssim_weight=ssim_weight,
            feature_fns=feature_fns,
        )

    return loss_fn


def make_train_step(mse_weight=1.0, perceptual_weight=0.0, ssim_weight=0.0,
                    donate: bool = True, feature_fns=None):
    loss_fn = make_loss_fn(mse_weight, perceptual_weight, ssim_weight,
                           feature_fns)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(state, p, batch, rng)
        )(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def train(
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    batch_size: int = 32,
    epochs: int = 100,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    mse_weight: float = 1.0,
    perceptual_weight: float = 0.0,
    ssim_weight: float = 0.0,
    patience: int = 15,
    save_every: int = 10,
    resume: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.bfloat16,
    use_mesh: bool = True,
    num_threads: int = 8,
    grad_accum: int = 1,
    verbose: bool = True,
) -> Dict:
    check_grad_accum(batch_size, grad_accum, use_mesh=use_mesh)
    output_dir = Path(output_dir)
    write_training_config(output_dir, dict(
        data_dir=str(data_dir), output_dir=str(output_dir),
        batch_size=batch_size, epochs=epochs, lr=lr, weight_decay=weight_decay,
        mse_weight=mse_weight, perceptual_weight=perceptual_weight,
        ssim_weight=ssim_weight, patience=patience, save_every=save_every,
        seed=seed, dtype=str(dtype), grad_accum=grad_accum,
    ))

    train_ds, val_ds = make_datasets(data_dir)
    if verbose:
        print(f"Training dataset size: {len(train_ds)}")
        print(f"Validation dataset size: {len(val_ds)}")
    mesh = create_mesh() if use_mesh and jax.device_count() > 1 else None

    model = build_model(dtype)
    tx = adam_l2(lr, weight_decay)
    sample = next(batch_iterator(train_ds, min(2, batch_size)))
    state = create_train_state(
        model, jax.random.key(seed),
        normalize_image(jnp.asarray(sample["image"]), mode="unit"), tx,
    )

    feature_fns = None
    if perceptual_weight > 0:
        from unet_implementations_tpu.models.vgg import make_features_fn

        # Random-init VGG like the reference's weights=None quirk
        # (AE_pretrained/reconstruction/models/losses.py:100); pass
        # converted torchvision weights via make_features_fn(params=...)
        # for a meaningful perceptual term.
        feature_fns = make_features_fn(jax.random.key(seed + 2), dtype=dtype)
    if grad_accum > 1:
        from unet_implementations_tpu.training.steps import make_accum_train_step

        train_step = make_accum_train_step(
            make_loss_fn(mse_weight, perceptual_weight, ssim_weight,
                         feature_fns=feature_fns),
            grad_accum,
        )
    else:
        train_step = make_train_step(mse_weight, perceptual_weight,
                                     ssim_weight, feature_fns=feature_fns)
    eval_step = make_reconstruction_eval_step()

    start_epoch, best, es_state = 0, None, None
    if resume:
        state, meta = restore_checkpoint(resume, state)
        start_epoch = meta.get("epoch", 0)
        best = meta.get("best_metric")
        es_state = meta.get("early_stopping")

    # V5 parity: dump original/reconstruction comparisons at every
    # checkpoint (reference reconstruction/src/train.py:616-672).
    def save_recon_samples(ckpt_state, epoch):
        try:
            from unet_implementations_tpu.utils.visualize import save_comparison_grid

            first = next(batch_iterator(val_ds, min(4, batch_size)))
            images01 = normalize_image(jnp.asarray(first["image"]),
                                       mode="unit")
            recon = np.asarray(ckpt_state.apply_fn(
                {"params": ckpt_state.params},
                images01.astype(dtype), deterministic=True,
            ), np.float32)
            vis_dir = output_dir / "reconstructions"
            vis_dir.mkdir(exist_ok=True)
            save_comparison_grid(np.asarray(images01, np.float32), recon,
                                 vis_dir / f"epoch_{epoch}.png")
        except Exception as e:  # pragma: no cover - visualization is best-effort
            if verbose:
                print(f"reconstruction snapshot failed: {e}")

    result = train_loop(
        state,
        train_step=train_step,
        eval_step=eval_step,
        train_batches=lambda epoch: batch_iterator(
            train_ds, batch_size, shuffle=True, seed=seed * 1000 + epoch,
            drop_last=True, num_threads=num_threads),
        val_batches=lambda: batch_iterator(val_ds, batch_size, num_threads=num_threads),
        checkpoint_callback=save_recon_samples,
        lr_schedule=cosine_lr(lr, epochs),
        epochs=epochs,
        output_dir=output_dir,
        task="reconstruction",
        mesh=mesh,
        rng=jax.random.key(seed + 1),
        save_every=save_every,
        patience=patience,
        start_epoch=start_epoch,
        best_metric=best,
        early_stopping_state=es_state,
        arch_config=ARCH_CONFIG,
        verbose=verbose,
    )
    return result


def evaluate(
    model_path: str | Path,
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    batch_size: int = 32,
    dtype=jnp.bfloat16,
    analyze_latent_space: bool = False,
    num_threads: int = 8,
    verbose: bool = True,
) -> Dict:
    model = build_model(dtype)
    abstract = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params = restore_params(model_path, abstract)

    test_ds = PetDataset(
        Path(data_dir) / "Test" / "resized", None,
        include_augmented=False, mode="reconstruction",
    )
    if verbose:
        print(f"Test dataset size: {len(test_ds)} images")

    @inference_jit
    def forward(params, images):
        return model.apply({"params": params}, images, deterministic=True)

    results = evaluate_reconstruction(
        lambda batch: forward(params, jnp.asarray(batch["image"], dtype)),
        test_ds, batch_size, output_dir, num_threads=num_threads,
        verbose=verbose,
    )

    # Comparison artifacts (reference E5/V4: original | recon | error map,
    # reconstruction/src/evaluate.py:268-378 + utils/visualize.py).
    if output_dir is not None and len(test_ds) > 0:
        from unet_implementations_tpu.data.loader import batch_iterator
        from unet_implementations_tpu.utils.visualize import save_comparison_grid

        first = next(batch_iterator(test_ds, min(8, batch_size)))
        recon = np.asarray(forward(params, jnp.asarray(first["image"], dtype)),
                           np.float32)
        save_comparison_grid(
            first["image"], recon, Path(output_dir) / "reconstruction_comparison.png"
        )

    if analyze_latent_space:
        results["latent_analysis"] = analyze_latent(
            model, params, test_ds, Path(data_dir), Path(output_dir),
            batch_size, dtype, verbose,
        )
    return results


def analyze_latent(model, params, test_ds, data_dir, output_dir, batch_size,
                   dtype, verbose=True) -> Dict:
    """PCA + t-SNE scatter of flattened bottlenecks colored by class label
    (``reconstruction/src/evaluate.py:380-440``). Class from Test masks."""
    from unet_implementations_tpu.data.pipeline import is_cat_image

    @inference_jit
    def encode(params, images):
        _, z = model.apply(
            {"params": params}, images, deterministic=True, return_bottleneck=True
        )
        return z

    zs, labels = [], []
    for batch in batch_iterator(test_ds, batch_size, shuffle=False):
        zs.append(np.asarray(encode(params, jnp.asarray(batch["image"], dtype)), np.float32))
    # labels from filenames (cat=1/dog=2), aligned with sorted file order
    for p in test_ds.image_files:
        labels.append(1 if is_cat_image(p.stem) else 2)
    z = np.concatenate(zs)[: len(labels)]
    labels = np.array(labels[: len(z)])

    from sklearn.decomposition import PCA

    pca = PCA(n_components=2).fit_transform(z)
    out = {"pca_explained": None, "n": int(len(z))}
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 6))
        for cls, name, color in [(1, "cat", "tab:red"), (2, "dog", "tab:green")]:
            sel = labels == cls
            ax.scatter(pca[sel, 0], pca[sel, 1], s=8, label=name, color=color)
        ax.legend()
        ax.set_title("Latent space (PCA)")
        fig.savefig(output_dir / "latent_space_pca.png", dpi=120)
        plt.close(fig)

        if len(z) >= 10:
            from sklearn.manifold import TSNE

            ts = TSNE(n_components=2, init="pca",
                      perplexity=min(30, max(2, len(z) // 4))).fit_transform(z)
            fig, ax = plt.subplots(figsize=(8, 6))
            for cls, name, color in [(1, "cat", "tab:red"), (2, "dog", "tab:green")]:
                sel = labels == cls
                ax.scatter(ts[sel, 0], ts[sel, 1], s=8, label=name, color=color)
            ax.legend()
            ax.set_title("Latent space (t-SNE)")
            fig.savefig(output_dir / "latent_space_tsne.png", dpi=120)
            plt.close(fig)
    except Exception as e:  # pragma: no cover
        if verbose:
            print(f"latent visualization failed: {e}")
    return out
