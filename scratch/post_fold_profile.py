"""Post-fold HLO cost-table: rank the residual HBM byte groups.

VERDICT round-2 #3: the pre-fold inference program moved 107.5 GB of HBM
traffic at b128 (~49 GB of it upsample); the s2d fold removed ~13 GB and the
dense fold claims ~25-30 GB more. This script compiles the b128 512^2
inference graph with the upsample folds OFF and ON, diffs the two cost
tables, and prints the top residual byte groups of the ON program — the
next-optimization ranking.

Fold flags are read from the environment at TRACE time (models/s2d.py), so
one process can compile both variants by flipping os.environ between
compiles.

Run on TPU:  python scratch/post_fold_profile.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_table():
    from unet_implementations_tpu.models.unet import unet_6stage
    from unet_implementations_tpu.ops.tuning import INFERENCE_COMPILER_OPTIONS
    from unet_implementations_tpu.utils import profiling

    model = unet_6stage(dtype=jnp.bfloat16)
    x = jnp.zeros((128, 512, 512, 3), jnp.bfloat16)
    params = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x[:1])["params"]
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)

    def fwd(img):
        return model.apply({"params": params}, img, deterministic=True)

    kw = {}
    if jax.default_backend() in ("tpu", "axon"):
        kw["compiler_options"] = INFERENCE_COMPILER_OPTIONS
    return profiling.cost_table(fwd, x, **kw)


def main():
    from unet_implementations_tpu.utils import profiling

    print(f"backend: {jax.default_backend()}", flush=True)

    os.environ["UNET_TPU_S2D_UP_FOLD"] = "0"
    os.environ["UNET_TPU_DENSE_UP_FOLD"] = "0"
    off = build_table()
    print("\n=== folds OFF ===")
    print(profiling.format_table(off, top=15))

    os.environ["UNET_TPU_S2D_UP_FOLD"] = "1"
    os.environ["UNET_TPU_DENSE_UP_FOLD"] = "1"
    on = build_table()
    print("\n=== folds ON ===")
    print(profiling.format_table(on, top=15))

    print("\n=== diff (OFF -> ON) ===")
    print(profiling.format_diff(profiling.diff_tables(off, on), top=25))

    print("\n=== residual byte ranking (folds ON) ===")
    groups = profiling._group_by_op_name(on)
    by_bytes = sorted(groups.items(), key=lambda kv: -kv[1]["bytes"])
    for name, g in by_bytes[:25]:
        print(f"{g['bytes'] / 1e9:8.2f} GB  {g['t_roofline_us']:>9.1f} us  "
              f"n={g['n']:<3d} {name[:80]}")
    total = sum(g["bytes"] for g in groups.values())
    print(f"TOTAL: {total / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
