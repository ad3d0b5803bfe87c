"""Migration-loop oracle: the REFERENCE'S OWN evaluator vs ours (VERDICT r3 #5).

One slow end-to-end test closes the migration loop with upstream code as
the oracle: a fixed-seed model is exported through
``models/convert.py::export_torch_checkpoint`` and evaluated twice on the
same synthetic test tree —

1. by OUR protocol (`recipes/common.py::evaluate_segmentation`, the
   pipelined original-resolution evaluator), and
2. by the reference's own ``evaluate.py`` (the CLIP_UNet copy — the only
   one with working imports, ``CLIP_UNet/src/evaluate.py:32``; Our_UNet's
   has the stale ``from src.models.unet`` refactor, SURVEY §2.5) running
   real torch on CPU,

and every metric in the results dict must agree. This independently
validates, in one test: the eval protocol (512² forward → argmax →
per-image nearest resize of pred AND mask to original dims →
dataset-level accumulation, ``CLIP_UNet/src/evaluate.py:186-210``), the
reverse checkpoint converter (their ``load_model`` does a STRICT
``load_state_dict`` on our exported key set against their real module
tree), the dataset contract (both sides read the same files), and the
``evaluation_results.json`` artifact schema.

Execution notes (why the fixture does what it does):
- The reference snapshot is copied to tmp and given a ``src/utils`` →
  ``utils`` symlink: ``evaluate.py`` imports ``src.utils.metrics`` but the
  snapshot keeps utils at the repo root — the one layout quirk between
  how it ran historically and how it was committed. No reference code is
  modified.
- ``src/train.py`` does ``import clip`` at module level; openai-clip is
  not installed here, so a bare stub module is injected. The evaluator
  never touches it (its published eval ran without CLIP conditioning —
  ``CLIP_UNet/models/unet.py:442``; fusion skips when features are None).
- The exported checkpoint is the CLIP-variant (fusion params present)
  because their ``load_model`` builds ``UNet(with_clip_features=True)``
  by default and loads strictly. Both sides evaluate WITHOUT clip
  features — the reference's own documented behavior.
"""

import importlib
import json
import os
import shutil
import sys
import types
from pathlib import Path

import cv2
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

REF = Path("/root/reference/CLIP_UNet")

pytestmark = pytest.mark.slow


def _make_test_tree(root: Path, n_images: int = 4) -> None:
    """Synthetic Test/ split in the reference's processed-data schema:
    512² jpgs in resized/, ORIGINAL-size {0,1,2,255} pngs in
    processed_labels/ (P4 output contract, SURVEY §1.5)."""
    (root / "Test" / "resized").mkdir(parents=True)
    (root / "Test" / "processed_labels").mkdir(parents=True)
    rng = np.random.default_rng(42)
    sizes = [(375, 500), (333, 217), (300, 400), (512, 512)]
    for i in range(n_images):
        oh, ow = sizes[i % len(sizes)]
        img = (rng.random((oh, ow, 3)) * 255).astype(np.uint8)
        # structured content so a random-init model still produces varied
        # argmax regions (a constant-prediction eval would not exercise
        # the resize protocol)
        img[: oh // 2] = img[: oh // 2] // 2 + 96
        scale = 512 / max(oh, ow)
        nh, nw = int(oh * scale), int(ow * scale)
        canvas = np.zeros((512, 512, 3), np.uint8)
        y0, x0 = (512 - nh) // 2, (512 - nw) // 2
        canvas[y0:y0 + nh, x0:x0 + nw] = cv2.resize(
            img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        cv2.imwrite(str(root / "Test" / "resized" / f"img_{i}.jpg"), canvas)

        mask = np.zeros((oh, ow), np.uint8)
        cls = 1 + (i % 2)
        mask[oh // 4: oh // 2, ow // 4: ow // 2] = cls
        # border ring (ignore_index 255) around the blob, like the real data
        mask[oh // 4 - 3: oh // 4, ow // 4: ow // 2] = 255
        mask[oh // 2: oh // 2 + 3, ow // 4: ow // 2] = 255
        Image.fromarray(mask).save(
            root / "Test" / "processed_labels" / f"img_{i}.png")


@pytest.fixture(scope="module")
def reference_evaluator(tmp_path_factory):
    """Import the reference's evaluate.py from a tmp copy of the snapshot
    (src/utils symlink + clip stub), and clean sys.path/sys.modules after."""
    if not REF.exists():  # pragma: no cover
        pytest.skip("reference snapshot not present")
    tmp = tmp_path_factory.mktemp("refcopy")
    dst = tmp / "CLIP_UNet"
    shutil.copytree(
        REF, dst,
        ignore=shutil.ignore_patterns(
            "notebooks", "*.ipynb", "evaluation_results",
            "clip_unet_pet_segmentation", "__pycache__"),
    )
    (dst / "src" / "utils").symlink_to(dst / "utils")

    os.environ.setdefault("MPLBACKEND", "Agg")
    saved_modules = dict(sys.modules)
    sys.path.insert(0, str(dst))
    sys.modules.setdefault("clip", types.ModuleType("clip"))
    try:
        ref_eval = importlib.import_module("src.evaluate")
        ref_train = importlib.import_module("src.train")
        yield ref_eval, ref_train
    finally:
        sys.path.remove(str(dst))
        for name in list(sys.modules):
            if name not in saved_modules:
                del sys.modules[name]


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = float(v)
    return out


class TestReferenceEvaluatorOracle:
    def test_results_match_reference_evaluator(
        self, reference_evaluator, tmp_path
    ):
        ref_eval, ref_train = reference_evaluator
        from unet_implementations_tpu.models.convert import (
            export_torch_checkpoint,
        )
        from unet_implementations_tpu.recipes.common import (
            evaluate_segmentation,
        )
        from unet_implementations_tpu.data.loader import PetDataset
        from unet_implementations_tpu.models.unet import unet_6stage

        data = tmp_path / "processed"
        _make_test_tree(data)

        # --- fixed-seed CLIP-variant params (fusion params created at init
        # by passing features once) → Orbax → .pth via the real exporter
        model = unet_6stage(dtype=jnp.float32, clip_fusion=True)
        params = model.init(
            jax.random.key(3), jnp.zeros((1, 64, 64, 3)),
            clip_features=jnp.zeros((1, model.clip_dim)),
        )["params"]
        import orbax.checkpoint as ocp

        ckpt = tmp_path / "orbax_ckpt"
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(ckpt.absolute(), {"params": params})
        ckptr.wait_until_finished()
        pth = tmp_path / "exported.pth"
        export_torch_checkpoint(ckpt, pth, arch="clip_unet")

        # --- OUR protocol (unconditioned forward, like the reference eval)
        ds = PetDataset(
            data / "Test" / "resized", data / "Test" / "processed_labels",
            include_augmented=False,
        )

        @jax.jit
        def forward(images):
            logits = model.apply({"params": params}, images,
                                 deterministic=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        ours = evaluate_segmentation(
            lambda b: forward(jnp.asarray(b["image"], jnp.float32)),
            ds, batch_size=2, output_dir=tmp_path / "ours",
            visualize_samples=0, num_threads=2, verbose=False,
        )
        # the artifact the reference workflow expects
        art = json.loads(
            (tmp_path / "ours" / "evaluation_results.json").read_text())

        # --- THEIR protocol: their load_model (strict load_state_dict on
        # their real module tree), their dataset, their evaluate_model
        device = torch.device("cpu")
        tmodel = ref_eval.load_model(str(pth), device)
        tds = ref_train.PetSegmentationDataset(
            images_dir=str(data / "Test" / "resized"),
            masks_dir=str(data / "Test" / "processed_labels"),
            include_augmented=False,
            target_size=(512, 512),
        )
        loader = torch.utils.data.DataLoader(
            tds, batch_size=2, shuffle=False, num_workers=0)
        theirs = ref_eval.evaluate_model(
            tmodel, loader, device, visualize_samples=0)

        ours_flat = _flatten(ours)
        theirs_flat = _flatten(theirs)
        art_flat = _flatten(art)
        assert set(theirs_flat) <= set(ours_flat), (
            "our results dict is missing reference keys: "
            f"{set(theirs_flat) - set(ours_flat)}")
        for key, want in theirs_flat.items():
            got = ours_flat[key]
            if np.isnan(want):
                assert np.isnan(got), f"{key}: ours {got}, reference NaN"
                continue
            assert got == pytest.approx(want, abs=2e-3), (
                f"{key}: ours {got:.6f} vs reference evaluator {want:.6f}")
        # and the committed artifact is what the function returned
        for key, want in ours_flat.items():
            assert art_flat[key] == pytest.approx(want, abs=1e-9, nan_ok=True)
