"""Round-5 VERDICT #3: measure the CLIP recipe's training throughput.

Three measurements at the reference's bs16 and our default bs32, chained
through data dependencies (the only honest timing on this runtime — see
bench.py::time_chained):

  1. table  — the embedding-table path: seg train step with precomputed
              clip_features (what ``--embeddings_dir`` runs per batch).
  2. vit    — frozen ViT-B/16 extraction alone (224² view).
  3. live   — the full online path per batch: on-device augment → 224² view
              → ViT extraction → train step (wrap_online_augment_clip's
              device work, reference CLIP_UNet/src/train.py:714-719).

Reference baseline: 181–191 s/epoch at bs16 over 11,528 imgs ≈ 60–64 img/s
on its GPU (BASELINE.md:32).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.augment import augment_and_normalize_with_clip
from unet_implementations_tpu.models.clip import ClipFeatureExtractor
from unet_implementations_tpu.recipes import clip_unet
from unet_implementations_tpu.training import (
    create_train_state,
    make_segmentation_train_step,
    sgd_nesterov,
)


def bench_one(batch_size: int, iters: int = 10):
    model = clip_unet.build_model()
    rng = jax.random.key(0)
    img = jax.random.uniform(rng, (batch_size, 512, 512, 3), jnp.float32)
    img01 = img  # augment path wants [0,1] pixels
    mask = jnp.zeros((batch_size, 512, 512), jnp.int32)
    feats0 = jnp.zeros((batch_size, 512), jnp.float32)

    state = create_train_state(
        model, jax.random.key(1),
        jnp.zeros((1, 512, 512, 3), jnp.float32), sgd_nesterov(0.005),
        clip_features=feats0[:1],
    )
    train_step = make_segmentation_train_step(use_clip=True)
    extractor = ClipFeatureExtractor("ViT-B/16")

    norm = (img - 0.45) / 0.25  # stand-in normalized pixels, shape is what matters

    def run_table():
        s = state
        loss = None
        batch = {"image": norm, "mask": mask, "clip_features": feats0}
        s, loss = train_step(s, batch, jax.random.key(2))
        jax.block_until_ready(loss)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            s, loss = train_step(s, batch, jax.random.key(2))
        float(loss)  # chain barrier: loss depends on the final state
        return (time.perf_counter() - t0) / iters

    def run_vit():
        clip_img = jax.random.uniform(rng, (batch_size, 224, 224, 3), jnp.float32)
        f = extractor(clip_img)
        jax.block_until_ready(f)
        t0 = time.perf_counter()
        f = clip_img[:, 0, 0, 0][:, None] * 0 + 0.0  # dummy init chain carrier
        x = clip_img
        for _ in range(iters):
            out = extractor(x)
            # chain: perturb next input by a scalar derived from the output
            x = x + out.mean() * 1e-6
        float(out.mean())
        return (time.perf_counter() - t0) / iters

    def run_live():
        s = state
        key = jax.random.key(3)
        aug, msk, clip_view = augment_and_normalize_with_clip(key, img01, mask)
        f = extractor(clip_view)
        s, loss = train_step(s, {"image": aug, "mask": msk, "clip_features": f},
                             jax.random.key(4))
        jax.block_until_ready(loss)  # compile all three programs
        t0 = time.perf_counter()
        for i in range(iters):
            key = jax.random.fold_in(jax.random.key(3), i)
            aug, msk, clip_view = augment_and_normalize_with_clip(key, img01, mask)
            f = extractor(clip_view)
            s, loss = train_step(
                s, {"image": aug, "mask": msk, "clip_features": f},
                jax.random.key(4),
            )
        float(loss)  # final loss depends on every iteration's state update
        return (time.perf_counter() - t0) / iters

    out = {}
    for name, fn in (("table", run_table), ("vit", run_vit), ("live", run_live)):
        dt = fn()
        ips = batch_size / dt
        out[name] = (dt, ips)
        print(f"bs{batch_size} {name:5s}: {dt*1e3:8.2f} ms/batch -> {ips:7.1f} img/s",
              flush=True)
    return out


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for bs in (16, 32):
        bench_one(bs)
