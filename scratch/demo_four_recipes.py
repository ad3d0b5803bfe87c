"""Regenerate demo/four_recipes on real hardware (round 4).

Drives all FOUR reference recipes through the real CLIs on a synthetic
pet-like 512² dataset in the reference directory schema, then copies the
artifacts into demo/four_recipes/ and aggregates SUMMARY.json. The round-3
artifacts were produced on the CPU backend at 128² (tunnel down); this
rerun upgrades them to the TPU at the reference's full 512² resolution and
exercises the round-4 per-mode train program (dense fold OFF in training,
ON in the eval jits) end to end.

Run on TPU:  python scratch/demo_four_recipes.py [workdir]
"""

import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np
from PIL import Image

from unet_implementations_tpu import cli
from unet_implementations_tpu.data.synthetic import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    synthetic_sample,
)

SIZE = 512
N_TRAIN, N_VAL, N_TEST = 64, 16, 16
REPO = Path(__file__).resolve().parent.parent


def build_dataset(root: Path, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    for split, n in (("Train", N_TRAIN), ("Val", N_VAL), ("Test", N_TEST)):
        img_dir = root / split / "resized"
        img_dir.mkdir(parents=True, exist_ok=True)
        if split == "Train":
            mask_dir = root / split / "resized_label"
        else:
            mask_dir = root / split / "processed_labels"
        mask_dir.mkdir(parents=True, exist_ok=True)
        (root / split / "masks").mkdir(exist_ok=True)  # AE eval labels
        for i in range(n):
            img_n, mask = synthetic_sample(rng, SIZE)
            img = np.clip(img_n * IMAGENET_STD + IMAGENET_MEAN, 0, 1)
            cv2.imwrite(
                str(img_dir / f"img_{i}.jpg"),
                cv2.cvtColor((img * 255).astype(np.uint8),
                             cv2.COLOR_RGB2BGR))
            m = mask.astype(np.uint8)
            if split != "Train":
                # non-square ORIGINAL sizes so the original-resolution eval
                # protocol (nearest resize back) is exercised
                oh = int(rng.integers(300, 480))
                ow = int(rng.integers(300, 480))
                m = cv2.resize(m, (ow, oh), interpolation=cv2.INTER_NEAREST)
            Image.fromarray(m).save(mask_dir / f"img_{i}.png")
            Image.fromarray(m).save(root / split / "masks" / f"img_{i}.png")


def run(argv):
    print(f"+ cli {' '.join(argv)}", flush=True)
    cli.main(argv)


def copy_artifacts(src: Path, dst: Path, names) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    for n in names:
        p = src / n
        if p.exists():
            shutil.copy2(p, dst / n)


def main():
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/demo_r4")
    data = work / "data"
    if not (data / "Train" / "resized").exists():
        print("building 512² synthetic dataset...", flush=True)
        build_dataset(data)
    out = work / "runs"
    demo = REPO / "demo" / "four_recipes"
    summary = {}

    # 1. our_unet with online on-device augmentation
    run(["our_unet", "train", "--data_dir", str(data),
         "--output_dir", str(out / "our_unet"), "--batch_size", "32",
         "--epochs", "10", "--patience", "10", "--save_every", "5",
         "--online_augment", "--num_threads", "4", "--seed", "0"])
    run(["our_unet", "evaluate",
         "--model_path", str(out / "our_unet" / "best_model"),
         "--data_dir", str(data),
         "--output_dir", str(out / "our_unet" / "eval"),
         "--batch_size", "16", "--visualize_samples", "1"])
    summary["our_unet"] = json.loads(
        (out / "our_unet" / "eval" / "evaluation_results.json").read_text())
    copy_artifacts(out / "our_unet", demo / "our_unet",
                   ["training_config.json", "training_log.csv"])
    copy_artifacts(out / "our_unet" / "eval", demo / "our_unet",
                   ["evaluation_results.json"])

    # 2. AE phase 1
    run(["ae_recon", "train", "--data_dir", str(data),
         "--output_dir", str(out / "ae"), "--batch_size", "32",
         "--epochs", "6", "--patience", "6", "--save_every", "3",
         "--num_threads", "4", "--seed", "0"])
    run(["ae_recon", "evaluate",
         "--model_path", str(out / "ae" / "best_model"),
         "--data_dir", str(data), "--output_dir", str(out / "ae" / "eval"),
         "--batch_size", "16", "--analyze_latent_space"])
    summary["ae"] = json.loads(
        (out / "ae" / "eval" / "reconstruction_metrics.json").read_text())
    copy_artifacts(out / "ae", demo / "ae",
                   ["training_config.json", "training_log.csv"])
    copy_artifacts(out / "ae" / "eval", demo / "ae",
                   ["reconstruction_metrics.json"])

    # 3. transfer phase 2 (frozen encoder from phase 1)
    run(["ae_transfer", "train", "--data_dir", str(data),
         "--output_dir", str(out / "transfer"),
         "--pretrained_encoder", str(out / "ae" / "best_model"),
         "--batch_size", "32", "--epochs", "6", "--patience", "6",
         "--save_every", "3", "--num_threads", "4", "--seed", "0"])
    run(["ae_transfer", "evaluate",
         "--model_path", str(out / "transfer" / "best_model"),
         "--data_dir", str(data),
         "--output_dir", str(out / "transfer" / "eval"),
         "--batch_size", "16", "--visualize_samples", "0"])
    summary["transfer"] = json.loads(
        (out / "transfer" / "eval" / "evaluation_results.json").read_text())
    copy_artifacts(out / "transfer", demo / "transfer",
                   ["training_config.json", "training_log.csv"])
    copy_artifacts(out / "transfer" / "eval", demo / "transfer",
                   ["evaluation_results.json"])

    # 4. CLIP: resized_clip images -> embedding tables -> train -> eval
    run(["clip_resize", "--data_dir", str(data)])
    run(["clip_unet", "embed", "--data_dir", str(data),
         "--output_dir", str(out / "clip_embeddings"), "--batch_size", "32"])
    run(["clip_unet", "train", "--data_dir", str(data),
         "--output_dir", str(out / "clip"),
         "--embeddings_dir", str(out / "clip_embeddings"),
         "--batch_size", "16", "--epochs", "6", "--patience", "6",
         "--save_every", "3", "--num_threads", "4", "--seed", "0"])
    run(["clip_unet", "evaluate",
         "--model_path", str(out / "clip" / "best_model"),
         "--data_dir", str(data),
         "--output_dir", str(out / "clip" / "eval"),
         "--embeddings_dir", str(out / "clip_embeddings"),
         "--batch_size", "16", "--visualize_samples", "0"])
    summary["clip"] = json.loads(
        (out / "clip" / "eval" / "evaluation_results.json").read_text())
    copy_artifacts(out / "clip", demo / "clip",
                   ["training_config.json", "training_log.csv"])
    copy_artifacts(out / "clip" / "eval", demo / "clip",
                   ["evaluation_results.json"])

    import jax

    summary["_meta"] = {
        "image_size": SIZE,
        "backend": jax.default_backend(),
        "train_images": N_TRAIN,
        "val_images": N_VAL,
        "test_images": N_TEST,
        "round": 4,
        "note": "regenerated on TPU at 512² with the per-mode fold program",
    }
    (demo / "SUMMARY.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: (v.get("mean_foreground_dice")
                          if isinstance(v, dict) else v)
                      for k, v in summary.items() if k != "_meta"},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()
