"""CLIP_UNet recipe: frozen CLIP image embedding fused at the UNet bottleneck.

Mirrors ``CLIP_UNet/src/train.py`` (batch size default 16, frozen ViT-B/16
run under no-grad per batch, fusion inside the model) with two TPU-native
improvements (SURVEY §7.1):

- the fusion conv is statically sized (the reference lazily rebuilds it on
  channel mismatch, ``CLIP_UNet/models/unet.py:459-474`` — a bug workaround)
- embeddings can be precomputed once per dataset (``embedding_cache=True``)
  instead of re-running the frozen encoder every step — identical numbers,
  the encoder is deterministic and frozen.

Evaluation defaults to WITH clip conditioning (same as training). The
reference evaluator silently drops the features (``CLIP_UNet/src/
evaluate.py`` calls ``model(images)``, so its published numbers are
unconditioned); pass ``use_clip_features=False`` to reproduce that quirk.

Without pretrained CLIP weights (no network egress here), the encoder runs
randomly initialized — pass ``clip_weights`` (torch checkpoint) to convert.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.loader import PetDataset, batch_iterator
from unet_implementations_tpu.models.clip import ClipFeatureExtractor
from unet_implementations_tpu.models.unet import UNet
from unet_implementations_tpu.parallel import create_mesh
from unet_implementations_tpu.ops.normalize import normalize_image
from unet_implementations_tpu.ops.tuning import inference_jit
from unet_implementations_tpu.recipes.common import (
    check_grad_accum,
    evaluate_segmentation,
)
from unet_implementations_tpu.recipes.our_unet import (
    ARCH_CONFIG as _SEG_ARCH,
    compute_static_weights,
)
from unet_implementations_tpu.training import (
    create_train_state,
    make_segmentation_eval_step,
    make_segmentation_train_step,
    poly_lr,
    sgd_nesterov,
)
from unet_implementations_tpu.training.checkpoint import (
    restore_checkpoint,
    restore_params,
)
from unet_implementations_tpu.training.loop import train_loop, write_training_config

def arch_config(clip_dim: int = 512) -> dict:
    return dict(_SEG_ARCH, with_clip_features=True, clip_dim=clip_dim)


ARCH_CONFIG = arch_config()


def build_model(dtype=jnp.bfloat16, clip_dim: int = 512) -> UNet:
    # clip_dim follows the encoder variant (512 for ViT-B/16 and ViT-B/32,
    # 768 for ViT-L/14 — models/clip.py CLIP_CONFIGS).
    return UNet(clip_fusion=True, clip_dim=clip_dim, dtype=dtype)


def make_datasets(data_dir: str | Path, include_augmented: bool = True,
                  normalize_train: bool = True, emit_uint8: bool = True):
    # emit_uint8: raw uint8 batches; steps + ClipFeatureExtractor normalize
    # in-graph (ops/normalize.py) — the 1-core-host starvation fix.
    data_dir = Path(data_dir)
    train = PetDataset(
        data_dir / "Train" / "resized",
        data_dir / "Train" / "resized_label",
        include_augmented=include_augmented,
        normalize=normalize_train,
        emit_uint8=emit_uint8,
        # Online-augment mode derives the 224² view on device from the
        # augmented pixels — no host clip image needed. When resized_clip/
        # is absent the LOADER falls back per file to one cv2 resize of its
        # own decode — never aliased to the 512² copies, which would route
        # through a second (post-normalization, jax-bilinear) resize in the
        # extractor: two code paths, two different pixel results.
        clip_dir=None if not normalize_train else data_dir / "Train" / "resized_clip",
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    val = PetDataset(
        data_dir / "Val" / "resized",
        data_dir / "Val" / "processed_labels",
        include_augmented=False,
        clip_dir=data_dir / "Val" / "resized_clip",
        emit_uint8=emit_uint8,
    )
    return train, val


def _embedding_table(extractor, dataset, batch_size=64) -> np.ndarray:
    """(len(dataset), dim) embedding table indexed by dataset index."""
    feats = np.zeros((len(dataset), extractor.output_dim), np.float32)
    for batch in batch_iterator(dataset, batch_size, shuffle=False):
        f = np.asarray(extractor(jnp.asarray(batch["clip_image"])))
        feats[batch["index"]] = f
    return feats


def _table_file(embeddings_dir, split: str) -> Path:
    return Path(embeddings_dir) / f"clip_embeddings_{split.lower()}.npz"


def dump_embeddings(
    data_dir: str | Path,
    output_dir: Optional[str | Path] = None,
    *,
    clip_model: str = "ViT-B/16",
    clip_weights: Optional[str] = None,
    batch_size: int = 64,
    splits: Tuple[str, ...] = ("Train", "Val", "Test"),
    include_augmented: bool = True,
    dtype=jnp.bfloat16,
    verbose: bool = True,
) -> Dict[str, str]:
    """Write per-split CLIP embedding tables to ``.npz`` files on disk.

    The frozen encoder's output never changes, so computing it once and
    reusing the table across train/eval runs amortizes the ViT forward
    entirely (reference re-extracts per batch per epoch,
    ``CLIP_UNet/src/train.py:714-719``). Each file stores ``embeddings``
    (N, dim), ``files`` (the image filenames, row-aligned) and ``model``.
    """
    data_dir = Path(data_dir)
    out = Path(output_dir) if output_dir is not None else data_dir / "clip_embeddings"
    out.mkdir(parents=True, exist_ok=True)
    extractor = ClipFeatureExtractor(clip_model, clip_weights, dtype=dtype)
    written = {}
    for split in splits:
        images = data_dir / split / "resized"
        if not images.exists():
            if verbose:
                print(f"embed: skipping {split} (no {images})")
            continue
        ds = PetDataset(
            images, None,
            include_augmented=include_augmented and split == "Train",
            clip_dir=data_dir / split / "resized_clip",
        )
        table = _embedding_table(extractor, ds, batch_size)
        path = _table_file(out, split)
        np.savez(
            path,
            embeddings=table,
            files=np.asarray([f.name for f in ds.image_files]),
            model=np.asarray(clip_model),
        )
        written[split] = str(path)
        if verbose:
            print(f"embed: {split}: {table.shape} -> {path}")
    return written


def _load_embedding_table(
    embeddings_dir, split: str, dataset, clip_model: str, verbose: bool = True
) -> Optional[np.ndarray]:
    """Load a dumped table and re-align rows to ``dataset``'s file order.

    Returns None (caller computes live) when the file is absent, was built
    with a different encoder, or is missing files the dataset contains.
    """
    path = _table_file(embeddings_dir, split)
    if not path.exists():
        if verbose:
            print(f"embed cache: {path} not found; extracting live")
        return None
    data = np.load(path, allow_pickle=False)
    if str(data["model"]) != clip_model:
        if verbose:
            print(f"embed cache: {path} was built with {data['model']}, "
                  f"not {clip_model}; extracting live")
        return None
    rows = {name: i for i, name in enumerate(data["files"])}
    idx = []
    for f in dataset.image_files:
        if f.name not in rows:
            if verbose:
                print(f"embed cache: {f.name} missing from {path}; extracting live")
            return None
        idx.append(rows[f.name])
    return np.ascontiguousarray(data["embeddings"][np.asarray(idx)])


def _attach_features(batches, extractor, table):
    for batch in batches:
        if table is not None:
            batch = dict(batch, clip_features=table[batch["index"]])
        else:
            batch = dict(
                batch,
                clip_features=np.asarray(extractor(jnp.asarray(batch["clip_image"]))),
            )
        batch.pop("clip_image", None)
        yield batch


def train(
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    clip_model: str = "ViT-B/16",
    clip_weights: Optional[str] = None,
    embedding_cache: bool = True,
    embeddings_dir: Optional[str | Path] = None,
    batch_size: int = 16,
    epochs: int = 100,
    lr: float = 5e-3,
    weight_decay: float = 1e-4,
    momentum: float = 0.99,
    weighted_ce: bool = True,
    static_weights: bool = False,
    dice_weight: float = 1.0,
    ce_weight: float = 1.0,
    patience: int = 15,
    save_every: int = 10,
    resume: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.bfloat16,
    use_mesh: bool = True,
    num_threads: int = 8,
    online_augment: bool = False,
    grad_accum: int = 1,
    verbose: bool = True,
) -> Dict:
    """``online_augment=True`` augments on device per batch and extracts CLIP
    features LIVE from the augmented pixels (embeddings can't be cached when
    the pixels change each epoch — matching the reference's per-batch
    extraction, ``CLIP_UNet/src/train.py:714-719``)."""
    check_grad_accum(batch_size, grad_accum, use_mesh=use_mesh)
    output_dir = Path(output_dir)
    write_training_config(output_dir, dict(
        data_dir=str(data_dir), output_dir=str(output_dir),
        clip_model=clip_model, clip_weights=clip_weights,
        embedding_cache=embedding_cache, batch_size=batch_size, epochs=epochs,
        lr=lr, weight_decay=weight_decay, momentum=momentum,
        weighted_ce=weighted_ce, static_weights=static_weights,
        dice_weight=dice_weight, ce_weight=ce_weight, patience=patience,
        save_every=save_every, seed=seed, dtype=str(dtype),
        with_clip_features=True, online_augment=online_augment,
        grad_accum=grad_accum,
    ))

    train_ds, val_ds = make_datasets(
        data_dir,
        include_augmented=not online_augment,
        normalize_train=not online_augment,
    )
    if verbose:
        print(f"Training dataset size: {len(train_ds)}")
        print(f"Validation dataset size: {len(val_ds)}")
    mesh = create_mesh() if use_mesh and jax.device_count() > 1 else None

    extractor = ClipFeatureExtractor(clip_model, clip_weights, dtype=dtype)
    if verbose and clip_weights is None:
        print("WARNING: no CLIP weights provided — encoder is randomly "
              "initialized (no network egress; pass --clip_weights to convert "
              "an OpenAI checkpoint).")

    train_table = val_table = None
    if embeddings_dir is not None:
        # Reuse tables dumped by the ``embed`` CLI (cross-run cache).
        if not online_augment:
            train_table = _load_embedding_table(
                embeddings_dir, "Train", train_ds, clip_model, verbose)
        val_table = _load_embedding_table(
            embeddings_dir, "Val", val_ds, clip_model, verbose)
    if embedding_cache:
        if verbose and (train_table is None or val_table is None):
            print("Precomputing CLIP embeddings (frozen encoder, computed once)...")
        if not online_augment and train_table is None:
            train_table = _embedding_table(extractor, train_ds)
        if val_table is None:
            val_table = _embedding_table(extractor, val_ds)

    model = build_model(dtype, clip_dim=extractor.output_dim)
    tx = sgd_nesterov(lr, weight_decay, momentum)
    sample = next(batch_iterator(train_ds, min(2, batch_size)))
    state = create_train_state(
        model, jax.random.key(seed),
        normalize_image(jnp.asarray(sample["image"])), tx,
        clip_features=jnp.zeros(
            (int(sample["image"].shape[0]), extractor.output_dim)
        ),
    )

    sw = None
    if weighted_ce and static_weights:
        sw = jnp.asarray(compute_static_weights(train_ds, batch_size))
    loss_kw = dict(
        weight_ce=ce_weight, weight_dice=dice_weight,
        dynamic_weights=weighted_ce and not static_weights,
        static_weights=sw if weighted_ce else None,
    )
    if grad_accum > 1:
        from unet_implementations_tpu.training.steps import (
            make_accum_train_step,
            make_segmentation_loss_fn,
        )

        train_step = make_accum_train_step(
            make_segmentation_loss_fn(use_clip=True, **loss_kw), grad_accum
        )
    else:
        train_step = make_segmentation_train_step(use_clip=True, **loss_kw)
    eval_step = make_segmentation_eval_step(use_clip=True, **loss_kw)

    start_epoch, best, es_state = 0, None, None
    if resume:
        state, meta = restore_checkpoint(resume, state)
        start_epoch = meta.get("epoch", 0)
        best = meta.get("best_metric")
        es_state = meta.get("early_stopping")

    def train_batches(epoch):
        it = batch_iterator(train_ds, batch_size, shuffle=True,
                            seed=seed * 1000 + epoch, drop_last=True,
                            num_threads=num_threads)
        if online_augment:
            from unet_implementations_tpu.recipes.common import (
                wrap_online_augment_clip,
            )

            return wrap_online_augment_clip(it, epoch, seed, extractor)
        return _attach_features(it, extractor, train_table)

    def val_batches():
        return _attach_features(
            batch_iterator(val_ds, batch_size, num_threads=num_threads),
            extractor, val_table,
        )

    return train_loop(
        state,
        train_step=train_step,
        eval_step=eval_step,
        train_batches=train_batches,
        val_batches=val_batches,
        lr_schedule=poly_lr(lr, epochs),
        epochs=epochs,
        output_dir=output_dir,
        task="segmentation",
        mesh=mesh,
        rng=jax.random.key(seed + 1),
        save_every=save_every,
        patience=patience,
        start_epoch=start_epoch,
        best_metric=best,
        early_stopping_state=es_state,
        arch_config=arch_config(extractor.output_dim),
        verbose=verbose,
    )


def evaluate(
    model_path: str | Path,
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    batch_size: int = 16,
    dtype=jnp.bfloat16,
    clip_model: str = "ViT-B/16",
    clip_weights: Optional[str] = None,
    embeddings_dir: Optional[str | Path] = None,
    use_clip_features: bool = True,
    visualize_samples: int = 0,
    num_threads: int = 8,
    verbose: bool = True,
) -> Dict:
    from unet_implementations_tpu.models.clip import CLIP_CONFIGS

    clip_dim = CLIP_CONFIGS[clip_model].output_dim
    model = build_model(dtype, clip_dim=clip_dim)
    abstract = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, clip_dim))
    )["params"]
    params = restore_params(model_path, abstract)

    data_dir = Path(data_dir)
    test_ds = PetDataset(
        data_dir / "Test" / "resized",
        data_dir / "Test" / "processed_labels",
        include_augmented=False,
        clip_dir=data_dir / "Test" / "resized_clip",
    )
    if verbose:
        print(f"Test dataset size: {len(test_ds)} images")
        if not use_clip_features:
            print("NOTE: evaluating WITHOUT clip conditioning "
                  "(reproducing the reference evaluator quirk)")

    test_table = None
    if use_clip_features and embeddings_dir is not None:
        test_table = _load_embedding_table(
            embeddings_dir, "Test", test_ds, clip_model, verbose)
    extractor = (
        ClipFeatureExtractor(clip_model, clip_weights, dtype=dtype)
        if use_clip_features and test_table is None else None
    )

    @inference_jit
    def forward(params, images, clip_features):
        logits = model.apply({"params": params}, images, clip_features,
                             deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    @inference_jit
    def forward_plain(params, images):
        logits = model.apply({"params": params}, images, None, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def predict_fn(batch):
        images = jnp.asarray(batch["image"], dtype)
        if test_table is not None:
            return forward(params, images, jnp.asarray(test_table[batch["index"]]))
        if extractor is None:
            return forward_plain(params, images)
        cf = extractor(jnp.asarray(batch["clip_image"]))
        return forward(params, images, cf)

    return evaluate_segmentation(
        predict_fn, test_ds, batch_size, output_dir,
        visualize_samples=visualize_samples, num_threads=num_threads,
        verbose=verbose,
    )
