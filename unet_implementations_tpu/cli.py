"""Unified CLI mirroring the reference per-sub-repo entry points.

Reference: four ``src/main.py``/``train.py``/``evaluate.py`` triples with
argparse flags (SURVEY §1.1). Here::

    python -m unet_implementations_tpu.cli our_unet train --data_dir ... --output_dir ...
    python -m unet_implementations_tpu.cli our_unet evaluate --model_path ... --data_dir ...
    python -m unet_implementations_tpu.cli ae_recon train ...
    python -m unet_implementations_tpu.cli ae_transfer train --pretrained_encoder ...
    python -m unet_implementations_tpu.cli clip_unet train --clip_model ViT-B/16 ...
    python -m unet_implementations_tpu.cli pipeline --raw_dir ... --processed_dir ...
    python -m unet_implementations_tpu.cli augment --data_dir ...  (offline augmentation)

Divergence from reference bugs: ``--batch_size`` is honored (the reference
force-overrides to 32/16 post-parse, ``Our_UNet/src/train.py:748``,
``CLIP_UNet/src/train.py:841``) — the defaults match those values instead.
"""

from __future__ import annotations

import argparse
import sys


def _add_common_train_flags(p: argparse.ArgumentParser, batch_size: int = 32):
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=batch_size)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num_threads", type=int, default=8)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--patience", type=int, default=15)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_mesh", action="store_true", help="disable data-parallel mesh")
    p.add_argument("--f32", action="store_true", help="compute in float32 (default bf16)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each batch into N sequential microbatches "
                        "inside one jit (gradient accumulation) — large "
                        "effective batches past the single-chip HBM train "
                        "ceiling. batch_size must divide by N")
    _add_compat_flags(p)


def _add_compat_flags(p: argparse.ArgumentParser):
    """Reference CLI flags accepted for drop-in compatibility (SURVEY §1.1).

    ``--num_workers`` maps to our ``--num_threads``; the rest are no-ops:
    ``--device`` (device selection is JAX's), ``--amp`` (bf16 mixed precision
    is the default; use ``--f32`` to disable), ``--reduced_complexity``
    (parsed but never consumed by the reference, ``Our_UNet/src/train.py:110``).
    """
    p.add_argument("--num_workers", type=int, default=None,
                   help="compat alias for --num_threads")
    p.add_argument("--decode_cache", default=None, metavar="DIR",
                   help="decode each image/mask ONCE into a uint8 memmap "
                        "cache under DIR and stream from it thereafter — "
                        "the host-side fix for 1-core hosts where jpg "
                        "decode (~23 img/s) starves the TPU (~169 img/s "
                        "train). Applies to every dataset the command "
                        "opens (train/val/test). Invalidated automatically "
                        "when source files change.")
    p.add_argument("--device", default=None, help=argparse.SUPPRESS)
    p.add_argument("--amp", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--reduced_complexity", action="store_true",
                   help=argparse.SUPPRESS)


def _add_seg_train_flags(p: argparse.ArgumentParser):
    p.add_argument("--online_augment", action="store_true",
                   help="augment on device per batch instead of reading the "
                        "offline 5x/2x expansion")
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.99)
    p.add_argument("--weighted_ce", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--static_weights", action="store_true")
    p.add_argument("--dice_weight", type=float, default=1.0)
    p.add_argument("--ce_weight", type=float, default=1.0)


def _add_eval_flags(p: argparse.ArgumentParser):
    p.add_argument("--model_path", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", default="evaluation_results")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--visualize_samples", type=int, default=3)
    p.add_argument("--f32", action="store_true")
    _add_compat_flags(p)


def _dtype(args):
    import jax.numpy as jnp

    return jnp.float32 if args.f32 else jnp.bfloat16


def _num_threads(args):
    # torch's num_workers=0 means "decode in the main process"; our threaded
    # loader needs >=1 worker, so 0 maps to the default thread count.
    nw = getattr(args, "num_workers", None)
    if nw is not None and nw > 0:
        return nw
    return getattr(args, "num_threads", 8)


def _seg_train_kwargs(args):
    return dict(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        weight_decay=args.weight_decay, momentum=args.momentum,
        weighted_ce=args.weighted_ce, static_weights=args.static_weights,
        dice_weight=args.dice_weight, ce_weight=args.ce_weight,
        patience=args.patience, save_every=args.save_every, resume=args.resume,
        seed=args.seed, dtype=_dtype(args), use_mesh=not args.no_mesh,
        num_threads=_num_threads(args), grad_accum=args.grad_accum,
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="unet_implementations_tpu")
    sub = parser.add_subparsers(dest="recipe", required=True)

    # --- our_unet ---------------------------------------------------------
    our = sub.add_parser("our_unet").add_subparsers(dest="cmd", required=True)
    t = our.add_parser("train")
    _add_common_train_flags(t)
    _add_seg_train_flags(t)
    t.add_argument("--spatial", type=int, default=0,
                   help="shard image ROWS over N devices during training "
                        "(2-D data x space mesh: halo exchanges + two-axis "
                        "grad reduction by XLA SPMD) — the beyond-HBM "
                        "image-size configuration. Requires H/32 >= N")
    e = our.add_parser("evaluate")
    _add_eval_flags(e)

    # --- clip_unet --------------------------------------------------------
    clip = sub.add_parser("clip_unet").add_subparsers(dest="cmd", required=True)
    t = clip.add_parser("train")
    _add_common_train_flags(t, batch_size=16)
    _add_seg_train_flags(t)
    t.add_argument("--clip_model", default="ViT-B/16",
                   choices=["ViT-B/16", "ViT-B/32", "ViT-L/14"])
    t.add_argument("--clip_weights", default=None,
                   help="path to converted CLIP weights (msgpack); random init if absent")
    # Reference --use_clip is store_true with default=True, i.e. cannot be
    # disabled from the CLI (CLIP_UNet/src/train.py:131-137) — accepted as a
    # no-op for drop-in compatibility.
    t.add_argument("--use_clip", action="store_true", help=argparse.SUPPRESS)
    t.add_argument("--embeddings_dir", default=None,
                   help="dir of tables written by `clip_unet embed` (skips "
                        "live extraction)")
    e = clip.add_parser("evaluate")
    _add_eval_flags(e)
    e.add_argument("--clip_model", default="ViT-B/16",
                   choices=["ViT-B/16", "ViT-B/32", "ViT-L/14"])
    e.add_argument("--clip_weights", default=None)
    e.add_argument("--embeddings_dir", default=None)
    e.add_argument("--no_clip_features", action="store_true",
                   help="reproduce the reference evaluator quirk (no conditioning)")
    em = clip.add_parser(
        "embed", help="precompute per-split CLIP embedding tables to disk")
    em.add_argument("--data_dir", required=True)
    em.add_argument("--output_dir", default=None,
                    help="default: <data_dir>/clip_embeddings")
    em.add_argument("--clip_model", default="ViT-B/16",
                    choices=["ViT-B/16", "ViT-B/32", "ViT-L/14"])
    em.add_argument("--clip_weights", default=None)
    em.add_argument("--batch_size", type=int, default=64)
    em.add_argument("--no_augmented", action="store_true",
                    help="skip Train/augmented images")

    # --- ae_recon ---------------------------------------------------------
    ae = sub.add_parser("ae_recon").add_subparsers(dest="cmd", required=True)
    t = ae.add_parser("train")
    _add_common_train_flags(t)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--weight_decay", type=float, default=1e-5)
    t.add_argument("--mse_weight", type=float, default=1.0)
    t.add_argument("--perceptual_weight", type=float, default=0.0)
    t.add_argument("--ssim_weight", type=float, default=0.0)
    e = ae.add_parser("evaluate")
    _add_eval_flags(e)
    e.add_argument("--analyze_latent_space", action="store_true")

    # --- ae_transfer ------------------------------------------------------
    tr = sub.add_parser("ae_transfer").add_subparsers(dest="cmd", required=True)
    t = tr.add_parser("train")
    _add_common_train_flags(t)
    _add_seg_train_flags(t)
    t.add_argument("--pretrained_encoder", required=True,
                   help="path to the phase-1 AE best_model checkpoint")
    e = tr.add_parser("evaluate")
    _add_eval_flags(e)

    # --- offline pipeline -------------------------------------------------
    pl = sub.add_parser("pipeline")
    pl.add_argument("--raw_dir", required=True)
    pl.add_argument("--processed_dir", required=True)
    pl.add_argument("--val_ratio", type=float, default=0.2)
    pl.add_argument("--seed", type=int, default=42)
    pl.add_argument("--target_size", type=int, default=512)

    aug = sub.add_parser("augment")
    aug.add_argument("--data_dir", required=True,
                     help="processed dir; writes Train/augmented/{images,masks}")
    aug.add_argument("--cat_augmentations", type=int, default=5)
    aug.add_argument("--dog_augmentations", type=int, default=2)
    aug.add_argument("--seed", type=int, default=42)
    aug.add_argument("--config", default=None,
                     help="reference-format augmentation_config.yaml")

    clipimg = sub.add_parser("clip_resize")
    clipimg.add_argument("--data_dir", required=True)
    clipimg.add_argument("--size", type=int, default=224)

    sanity = sub.add_parser("sanity_checks")
    sanity.add_argument("--data_dir", required=True)
    sanity.add_argument("--sample", type=int, default=None)

    dl = sub.add_parser("download")
    dl.add_argument("--raw_dir", required=True)
    dl.add_argument("--archive", default=None)

    conv = sub.add_parser(
        "convert", help="convert a reference .pth checkpoint to this "
                        "framework's Orbax format")
    conv.add_argument("--torch_checkpoint", required=True)
    conv.add_argument("--output", required=True,
                      help="Orbax checkpoint directory to create")
    conv.add_argument("--arch", default="our_unet",
                      choices=["our_unet", "clip_unet", "ae_recon",
                               "ae_transfer"])

    conv_r = sub.add_parser(
        "export_torch", help="convert an Orbax checkpoint back to a "
                             "reference-loadable .pth (the inverse of "
                             "convert: evaluate models trained here with "
                             "the reference's own evaluate.py)")
    conv_r.add_argument("--checkpoint", required=True,
                        help="Orbax checkpoint directory")
    conv_r.add_argument("--output", required=True, help=".pth file to write")
    conv_r.add_argument("--arch", default="our_unet",
                        choices=["our_unet", "clip_unet", "ae_recon",
                                 "ae_transfer"])

    prof = sub.add_parser(
        "profile", help="compile a model step and print its per-fusion "
                        "analytic cost table (FLOPs, HBM bytes, roofline)")
    prof.add_argument("--arch", default="our_unet",
                      choices=["our_unet", "clip_unet", "ae_recon",
                               "ae_transfer"])
    prof.add_argument("--batch_size", type=int, default=128)
    prof.add_argument("--size", type=int, default=512)
    prof.add_argument("--train", action="store_true",
                      help="profile the full train step instead of inference")
    prof.add_argument("--top", type=int, default=30)
    prof.add_argument("--f32", action="store_true")

    exp = sub.add_parser(
        "export", help="AOT-export a trained checkpoint to a self-contained "
                       "StableHLO serving artifact (jax.export)")
    exp.add_argument("--model_path", required=True,
                     help="training checkpoint (e.g. <out>/best_model)")
    exp.add_argument("--output_dir", required=True)
    exp.add_argument("--arch", default="our_unet",
                     choices=["our_unet", "clip_unet", "ae_recon",
                              "ae_transfer"])
    exp.add_argument("--batch_size", type=int, default=1,
                     help="static serving batch baked into the module")
    exp.add_argument("--img_size", type=int, default=512)
    exp.add_argument("--clip_dim", type=int, default=512)
    exp.add_argument("--platforms", default="tpu,cpu",
                     help="comma-separated lowering targets")
    exp.add_argument("--f32", action="store_true")

    pred = sub.add_parser(
        "predict", help="run a trained UNet on an image file or directory")
    pred.add_argument("--model_path", required=True)
    pred.add_argument("--input", required=True,
                      help="an image file or a directory of images")
    pred.add_argument("--output_dir", default="predictions")
    pred.add_argument("--batch_size", type=int, default=32)
    pred.add_argument("--no_overlay", action="store_true")
    pred.add_argument("--f32", action="store_true")
    pred.add_argument("--spatial", type=int, default=0,
                      help="shard image rows over this many devices on a "
                           "(data, space) mesh — batch-1 latency scaling")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    if getattr(args, "decode_cache", None):
        # Env-var plumbing so every PetDataset the recipe opens (train, val,
        # test, static-weight recount) picks the cache up without threading
        # a parameter through each signature (data/loader.py docstring).
        import os

        os.environ["UNET_TPU_DECODE_CACHE"] = args.decode_cache

    if args.recipe in ("our_unet", "clip_unet", "ae_recon", "ae_transfer"):
        # Multi-host DCN wiring must happen before the first backend use
        # (no-op without coordinator info in the environment).
        from unet_implementations_tpu.parallel.distributed import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed()

    if args.recipe == "pipeline":
        from unet_implementations_tpu.data.pipeline import run_pipeline

        stats = run_pipeline(args.raw_dir, args.processed_dir,
                             args.val_ratio, args.seed, args.target_size)
        print(stats)
        return

    if args.recipe == "augment":
        from unet_implementations_tpu.data.augment import augment_dataset_offline

        policy = None
        if args.config:
            from unet_implementations_tpu.data.augment import load_policy_yaml

            policy = load_policy_yaml(args.config)
        stats = augment_dataset_offline(
            args.data_dir, cat_augmentations=args.cat_augmentations,
            dog_augmentations=args.dog_augmentations, seed=args.seed,
            policy=policy,
        )
        print(stats)
        return

    if args.recipe == "sanity_checks":
        from unet_implementations_tpu.data.sanity_checks import run_sanity_checks

        reports = run_sanity_checks(args.data_dir, args.sample)
        for r in reports:
            print(r)
        if not all(r.passed for r in reports):
            raise SystemExit(1)
        return

    if args.recipe == "download":
        from unet_implementations_tpu.data.download import download_and_extract

        download_and_extract(args.raw_dir, args.archive)
        return

    if args.recipe == "convert":
        from unet_implementations_tpu.models.convert import (
            convert_torch_checkpoint,
        )

        convert_torch_checkpoint(args.torch_checkpoint, args.output, args.arch)
        print(f"converted {args.torch_checkpoint} -> {args.output}")
        return

    if args.recipe == "export_torch":
        from unet_implementations_tpu.models.convert import (
            export_torch_checkpoint,
        )

        export_torch_checkpoint(args.checkpoint, args.output, args.arch)
        print(f"exported {args.checkpoint} -> {args.output}")
        return

    if args.recipe == "profile":
        import jax
        import jax.numpy as jnp

        from unet_implementations_tpu.models.unet import (
            autoencoder_6stage,
            unet_6stage,
        )
        from unet_implementations_tpu.utils.profiling import (
            cost_table_from_text,
            format_table,
        )

        dtype = _dtype(args)
        clip = args.arch == "clip_unet"
        if args.arch == "ae_recon":
            model = autoencoder_6stage(dtype=dtype)
        else:
            model = unet_6stage(dtype=dtype, clip_fusion=clip)
        x1 = jnp.zeros((1, args.size, args.size, 3), dtype)
        extra = ((jnp.zeros((1, 512), dtype),) if clip else ())
        params = model.init(jax.random.key(0), x1, *extra)["params"]
        xb = jnp.zeros((args.batch_size, args.size, args.size, 3), dtype)
        extrab = ((jnp.zeros((args.batch_size, 512), dtype),) if clip
                  else ())

        if args.train:
            from unet_implementations_tpu.training import (
                create_train_state,
                make_reconstruction_train_step,
                make_segmentation_train_step,
                sgd_nesterov,
            )

            state = create_train_state(
                model, jax.random.key(0), x1, sgd_nesterov(),
                clip_features=extra[0] if clip else None)
            if args.arch == "ae_recon":
                step = make_reconstruction_train_step(donate=False)
                batch = {"image": xb, "target": xb}
            else:
                step = make_segmentation_train_step(donate=False,
                                                    use_clip=clip)
                batch = {"image": xb,
                         "mask": jnp.zeros(xb.shape[:3], jnp.int32)}
                if clip:
                    batch["clip_features"] = extrab[0]
            compiled = step.lower(state, batch, jax.random.key(1)).compile()
        else:
            from unet_implementations_tpu.ops.tuning import inference_jit

            @inference_jit
            def infer(img, *ex):
                return model.apply({"params": params}, img, *ex,
                                   deterministic=True)

            compiled = infer.lower(xb, *extrab).compile()
        print(format_table(cost_table_from_text(compiled.as_text()),
                           top=args.top))
        return

    if args.recipe == "export":
        from unet_implementations_tpu.serving import export as serving_export

        out, meta = serving_export.export_recipe_checkpoint(
            args.model_path, args.output_dir,
            recipe=args.arch, batch_size=args.batch_size,
            img_size=args.img_size, clip_dim=args.clip_dim,
            dtype=_dtype(args),
            platforms=tuple(p for p in args.platforms.split(",") if p),
        )
        print(f"exported {args.arch} -> {out} "
              f"(batch={meta['batch_size']}, {meta['img_size']}px, "
              f"platforms={','.join(meta['platforms'])})")
        return

    if args.recipe == "predict":
        from unet_implementations_tpu.recipes.common import predict_segmentation

        predict_segmentation(
            args.model_path, args.input, args.output_dir,
            batch_size=args.batch_size, dtype=_dtype(args),
            overlay=not args.no_overlay, spatial=args.spatial,
        )
        return

    if args.recipe == "clip_resize":
        from pathlib import Path

        from unet_implementations_tpu.data.pipeline import create_clip_resized

        for split in ("Train", "Val", "Test"):
            d = Path(args.data_dir) / split
            if (d / "resized").exists():
                n = create_clip_resized([d / "resized"], d / "resized_clip", args.size)
                print(f"{split}: {n} images")
        return

    if args.recipe == "our_unet":
        from unet_implementations_tpu.recipes import our_unet as r

        if args.cmd == "train":
            r.train(args.data_dir, args.output_dir,
                    online_augment=args.online_augment, spatial=args.spatial,
                    **_seg_train_kwargs(args))
        else:
            r.evaluate(args.model_path, args.data_dir, args.output_dir,
                       batch_size=args.batch_size, dtype=_dtype(args),
                       visualize_samples=args.visualize_samples,
                       num_threads=_num_threads(args))
    elif args.recipe == "clip_unet":
        from unet_implementations_tpu.recipes import clip_unet as r

        if args.cmd == "train":
            r.train(args.data_dir, args.output_dir,
                    clip_model=args.clip_model, clip_weights=args.clip_weights,
                    embeddings_dir=args.embeddings_dir,
                    online_augment=args.online_augment,
                    **_seg_train_kwargs(args))
        elif args.cmd == "embed":
            r.dump_embeddings(
                args.data_dir, args.output_dir, clip_model=args.clip_model,
                clip_weights=args.clip_weights, batch_size=args.batch_size,
                include_augmented=not args.no_augmented)
        else:
            r.evaluate(args.model_path, args.data_dir, args.output_dir,
                       batch_size=args.batch_size, dtype=_dtype(args),
                       clip_model=args.clip_model, clip_weights=args.clip_weights,
                       embeddings_dir=args.embeddings_dir,
                       use_clip_features=not args.no_clip_features,
                       visualize_samples=args.visualize_samples,
                       num_threads=_num_threads(args))
    elif args.recipe == "ae_recon":
        from unet_implementations_tpu.recipes import ae_recon as r

        if args.cmd == "train":
            r.train(args.data_dir, args.output_dir,
                    batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
                    weight_decay=args.weight_decay, mse_weight=args.mse_weight,
                    perceptual_weight=args.perceptual_weight,
                    ssim_weight=args.ssim_weight, patience=args.patience,
                    save_every=args.save_every, resume=args.resume,
                    seed=args.seed, dtype=_dtype(args),
                    use_mesh=not args.no_mesh, num_threads=_num_threads(args),
                    grad_accum=args.grad_accum)
        else:
            r.evaluate(args.model_path, args.data_dir, args.output_dir,
                       batch_size=args.batch_size, dtype=_dtype(args),
                       analyze_latent_space=args.analyze_latent_space,
                       num_threads=_num_threads(args))
    elif args.recipe == "ae_transfer":
        from unet_implementations_tpu.recipes import ae_transfer as r

        if args.cmd == "train":
            r.train(args.data_dir, args.output_dir,
                    pretrained_encoder=args.pretrained_encoder,
                    online_augment=args.online_augment,
                    **_seg_train_kwargs(args))
        else:
            r.evaluate(args.model_path, args.data_dir, args.output_dir,
                       batch_size=args.batch_size, dtype=_dtype(args),
                       visualize_samples=args.visualize_samples,
                       num_threads=_num_threads(args))


if __name__ == "__main__":
    main()
