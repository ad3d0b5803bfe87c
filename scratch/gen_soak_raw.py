"""Generate a reference-scale synthetic raw archive for the round-5 soak.

Writes the REAL Drive-archive extraction layout
(``Dataset_filtered/{TrainVal,Test}/{color,label}``, see
``data/pipeline.py::resolve_raw_layout`` and
``/root/reference/data_augmentation/src/preprocess_dataset.py:75-78``)
at the reference's data volume:

- TrainVal: 4,300 raw images (1/3 cat breeds, 2/3 dog breeds), 2-D
  {0, cls, 255} masks.  With ``--val_ratio 0.33`` the pipeline splits
  this into ~2,881 train / ~1,419 val, and 2x/2x offline augmentation
  brings the train epoch to ~8,643 images — the VERDICT r4 target scale
  (~8.6k train / ~1.4k val / ~3.7k test).
- Test: 3,694 images (the reference's n, ``BASELINE.md``), 3-channel
  masks with foreground==128 and class recoverable only from the
  breed-cased filename (``preprocess_test_val_labels.py:201-331``).
- Two corrupt plants in TrainVal the corruption scan must drop.

Images are pet-like and learnable (elliptical object, class-dependent
color, border ring) at random original sizes 250-500px, like
``data/synthetic.py`` but saved as raw uint8 jpgs before any
normalization, so the full pipeline → augment → train → evaluate chain
runs on realistic bytes.
"""

import sys
import time
from pathlib import Path

import cv2
import numpy as np

CAT_BREEDS = ["Abyssinian", "Bengal", "Birman", "Bombay", "British",
              "Egyptian", "Maine", "Persian", "Ragdoll", "Russian",
              "Siamese", "Sphynx"]
DOG_BREEDS = ["beagle", "boxer", "chihuahua", "havanese", "keeshond",
              "newfoundland", "pomeranian", "pug", "samoyed", "shiba",
              "staffordshire", "wheaten", "yorkshire"]


def make_sample(rng, h, w, cls):
    """(uint8 image[h,w,3], uint8 mask[h,w] in {0,cls,255})."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy = rng.uniform(0.3, 0.7) * h
    cx = rng.uniform(0.3, 0.7) * w
    ry = rng.uniform(0.15, 0.3) * h
    rx = rng.uniform(0.15, 0.3) * w
    ang = rng.uniform(0, np.pi)
    ca, sa = np.cos(ang), np.sin(ang)
    u = (yy - cy) * ca + (xx - cx) * sa
    v = -(yy - cy) * sa + (xx - cx) * ca
    dist = (u / ry) ** 2 + (v / rx) ** 2
    inside = dist <= 1.0
    border = (dist > 1.0) & (dist <= 1.25)

    img = rng.normal(0.4, 0.08, (h, w, 3)).astype(np.float32)
    # low-frequency background structure so jpgs are non-trivial
    img += 0.1 * np.sin(yy / rng.uniform(20, 60))[:, :, None]
    color = np.array(
        [0.85, 0.3, 0.25] if cls == 1 else [0.25, 0.35, 0.85], np.float32)
    n_in = int(inside.sum())
    img[inside] = color + rng.normal(0, 0.05, (n_in, 3)).astype(np.float32)
    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)

    mask = np.zeros((h, w), np.uint8)
    mask[inside] = cls
    mask[border] = 255
    return img8, mask


def main(root: Path, n_trainval=4300, n_test=3694, seed=7):
    rng = np.random.default_rng(seed)
    base = root / "Dataset_filtered"
    t0 = time.time()

    for split, n in (("TrainVal", n_trainval), ("Test", n_test)):
        cdir = base / split / "color"
        ldir = base / split / "label"
        cdir.mkdir(parents=True, exist_ok=True)
        ldir.mkdir(parents=True, exist_ok=True)
        n_cats = n // 3
        for i in range(n):
            cls = 1 if i < n_cats else 2
            breed = (CAT_BREEDS if cls == 1 else DOG_BREEDS)[
                i % (12 if cls == 1 else 13)]
            stem = f"{breed}_{i}"
            h = int(rng.integers(250, 500))
            w = int(rng.integers(250, 500))
            img, mask = make_sample(rng, h, w, cls)
            cv2.imwrite(str(cdir / f"{stem}.jpg"), img[:, :, ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
            if split == "TrainVal":
                cv2.imwrite(str(ldir / f"{stem}.png"), mask)
            else:
                # real test-mask encoding: 3-channel, foreground == 128
                m3 = np.zeros((h, w, 3), np.uint8)
                m3[mask == cls] = 128
                m3[mask == 255] = 255
                cv2.imwrite(str(ldir / f"{stem}.png"), m3)
            if (i + 1) % 500 == 0:
                print(f"{split}: {i+1}/{n} ({time.time()-t0:.0f}s)",
                      flush=True)

    # corrupt plants (with valid masks) — the scan must drop them
    (base / "TrainVal" / "color" / "Bengal_99999.jpg").write_bytes(
        b"\xff\xd8\xff\xe0corrupt")
    m = np.zeros((64, 64), np.uint8)
    m[8:32, 8:32] = 1
    cv2.imwrite(str(base / "TrainVal" / "label" / "Bengal_99999.png"), m)
    print(f"done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/soak/raw"))
