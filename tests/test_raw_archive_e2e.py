"""Real-archive readiness: raw Drive-archive layout → evaluation_results.json
with ZERO code changes (VERDICT r3 #7).

The reference's dataset downloads as ``Data_filtered.tar`` and untars to
``Dataset_filtered/{TrainVal,Test}/{color,label}``
(``data_augmentation/src/preprocess_dataset.py:75-78,512,476``), with:

- TrainVal masks: 2-D {0, 1|2, 255} pngs (class encoded in the values),
- Test masks: **3-channel** pngs whose foreground is value 128, class
  recoverable only from the breed filename
  (``preprocess_test_val_labels.py:201-331``),
- breed-cased filenames (cat breeds capitalized: ``Abyssinian_1.jpg``),
- the occasional corrupt file the corruption scan must drop
  (``preprocess_dataset.py:119-161``).

This test builds a fixture mimicking exactly that layout — corrupt plant,
3-channel 128-valued test masks, breed filenames, archive dir nesting —
and drives the REAL CLI through the full chain:

    pipeline → augment → our_unet train → our_unet evaluate

asserting the artifacts at each stage, so a future egress window needs
only the download, no code changes. Slow (full 512² train-step compile on
the CPU backend); the quick suite covers each stage separately.
"""

import json
from pathlib import Path

import cv2
import numpy as np
import pytest
from PIL import Image

from unet_implementations_tpu import cli

pytestmark = pytest.mark.slow


def make_raw_archive(root: Path) -> dict:
    """Fixture tree in the REAL extraction layout (see module docstring)."""
    rng = np.random.default_rng(11)
    base = root / "Dataset_filtered"
    names = {"trainval": [], "test": []}

    tv = base / "TrainVal"
    (tv / "color").mkdir(parents=True)
    (tv / "label").mkdir(parents=True)
    # 4 cats + 2 dogs, real breed casing
    stems = [f"Abyssinian_{i}" for i in range(4)] + [
        f"beagle_{i}" for i in range(2)]
    for i, stem in enumerate(stems):
        cls = 1 if stem[0].isupper() else 2
        h, w = int(rng.integers(220, 420)), int(rng.integers(220, 420))
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        img[: h // 2] //= 2  # structure, so training has signal
        cv2.imwrite(str(tv / "color" / f"{stem}.jpg"), img)
        m = np.zeros((h, w), np.uint8)
        m[h // 4: h // 2, w // 4: w // 2] = cls
        m[h // 4 - 2: h // 4, w // 4: w // 2] = 255  # border ring
        Image.fromarray(m).save(tv / "label" / f"{stem}.png")
        names["trainval"].append(stem)

    # corrupt plant: truncated jpg WITH a valid mask — the corruption scan
    # must drop it (it would otherwise join the split)
    (tv / "color" / "Bengal_9.jpg").write_bytes(b"\xff\xd8\xff\xe0corrupt")
    m = np.zeros((64, 64), np.uint8)
    m[8:32, 8:32] = 1
    Image.fromarray(m).save(tv / "label" / "Bengal_9.png")
    # mask-less image: must be skipped, not crash
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tv / "color" / "pug_77.jpg"), img)

    te = base / "Test"
    (te / "color").mkdir(parents=True)
    (te / "label").mkdir(parents=True)
    for i, stem in enumerate(["Siamese_0", "boxer_1"]):
        cls = 1 if stem[0].isupper() else 2
        h, w = int(rng.integers(220, 420)), int(rng.integers(220, 420))
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        img[:, : w // 2] //= 2
        cv2.imwrite(str(te / "color" / f"{stem}.jpg"), img)
        # the REAL test-mask encoding: 3-channel, foreground == 128
        m = np.zeros((h, w, 3), np.uint8)
        m[h // 4: h // 2, w // 4: w // 2] = 128
        m[:3, :] = 255
        Image.fromarray(m).save(te / "label" / f"{stem}.png")
        names["test"].append(stem)
    return names


class TestRawArchiveEndToEnd:
    def test_full_chain_from_real_layout(self, tmp_path):
        raw = tmp_path / "raw"
        raw.mkdir()
        names = make_raw_archive(raw)
        proc = tmp_path / "processed"
        out = tmp_path / "run"
        eval_out = tmp_path / "eval"

        # 1. pipeline — pointed at the EXTRACTION ROOT, like a user would
        cli.main(["pipeline", "--raw_dir", str(raw),
                  "--processed_dir", str(proc),
                  "--val_ratio", "0.25", "--seed", "1"])
        # corrupt plant excluded everywhere
        produced = {p.stem for d in ("Train", "Val")
                    for p in (proc / d / "resized").glob("*.jpg")}
        assert "Bengal_9" not in produced and "pug_77" not in produced
        assert produced == set(names["trainval"])
        # test masks: original size, remapped {0,1,2,255}, class by breed
        for stem in names["test"]:
            m = np.array(Image.open(
                proc / "Test" / "processed_labels" / f"{stem}.png"))
            assert m.ndim == 2 and m.shape != (512, 512)
            want_cls = 1 if stem[0].isupper() else 2
            assert set(np.unique(m)) == {0, want_cls, 255}

        # 2. offline augmentation (cat 2x / dog 1x to keep the test fast;
        #    the 5x/2x policy scale is covered by tests/test_augment.py)
        cli.main(["augment", "--data_dir", str(proc),
                  "--cat_augmentations", "2", "--dog_augmentations", "1",
                  "--seed", "0"])
        aug_imgs = sorted((proc / "Train" / "augmented" / "images").glob("*"))
        aug_masks = sorted((proc / "Train" / "augmented" / "masks").glob("*"))
        assert len(aug_imgs) == len(aug_masks) > 0

        # 3. one real training epoch through the CLI (512², CPU backend)
        cli.main(["our_unet", "train", "--data_dir", str(proc),
                  "--output_dir", str(out), "--batch_size", "2",
                  "--epochs", "1", "--patience", "1", "--num_threads", "2",
                  "--no_mesh", "--seed", "0"])
        assert (out / "best_model").exists()
        assert (out / "training_log.csv").exists()
        header = (out / "training_log.csv").read_text().splitlines()[0]
        assert header == ("epoch,train_loss,val_loss,dice_background,"
                          "dice_cat,dice_dog,dice_mean_foreground,"
                          "learning_rate,epoch_time")

        # 4. evaluation at original resolution → the reference's artifact
        cli.main(["our_unet", "evaluate",
                  "--model_path", str(out / "best_model"),
                  "--data_dir", str(proc), "--output_dir", str(eval_out),
                  "--batch_size", "2", "--visualize_samples", "0"])
        results = json.loads(
            (eval_out / "evaluation_results.json").read_text())
        for key in ("pixel_accuracy", "mean_iou", "background", "cat",
                    "dog", "mean_foreground_dice"):
            assert key in results, f"artifact missing {key}"
        for cls in ("background", "cat", "dog"):
            assert set(results[cls]) == {"dice", "iou", "precision",
                                         "recall"}
        assert 0.0 <= results["pixel_accuracy"] <= 1.0
