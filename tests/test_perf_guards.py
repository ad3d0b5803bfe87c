"""Structural performance-regression guards (CPU-runnable).

The round-1 throughput (516 img/s/chip, BENCH_r01.json) depends on two
load-bearing graph properties that a refactor could silently undo:

1. **Space-to-depth execution of the full-resolution level** — no dense
   convolution ever runs at 512x512 spatial (models/s2d.py; measured 2x on
   the stage-0 pair).
2. **Decoder concats are never materialized** — UpBlock passes the
   (upsampled, skip) pair unmerged and the first conv splits over segments
   (``conv(concat(xs), K) == sum conv(x_i, K_i)``, models/blocks.py). A
   regression reintroduces the model's largest tensors (e.g. a 6 GB HLO
   temp for decoder_4 at b128 — models/s2d.py docstring).

Both are asserted on the lowered StableHLO text — no compile, no TPU.
``bench.py --assert-baseline`` guards the measured numbers on real hardware
(tests can't: the CPU backend's timings say nothing about the TPU).
"""

import re

import jax
import jax.numpy as jnp
import pytest

from unet_implementations_tpu.models.unet import unet_6stage


@pytest.fixture(scope="module")
def lowered_texts():
    model = unet_6stage(dtype=jnp.bfloat16)
    x = jnp.zeros((2, 512, 512, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x))["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    fwd = jax.jit(
        lambda p, x: model.apply({"params": p}, x, deterministic=True)
    ).lower(params, x).as_text()

    def loss_fn(p, x):
        out = model.apply({"params": p}, x, deterministic=True)
        return jnp.sum(out.astype(jnp.float32))

    bwd = jax.jit(jax.grad(loss_fn)).lower(params, x).as_text()
    return fwd, bwd


def _conv_out_shapes(txt):
    return re.findall(r"stablehlo\.convolution.*?->\s*tensor<([^>]+)>", txt)


def _concat_out_shapes(txt):
    return re.findall(r"stablehlo\.concatenate.*?->\s*tensor<([^>]+)>", txt)


# NHWC activation with 512x512 SPATIAL dims (batch x 512 x 512 x channels);
# weight shapes like 3x3x512x512 (a 512->512 kernel grad) must not match.
_SPATIAL_512 = re.compile(r"^\d+x512x512x\d+x")


class TestS2dPathActive:
    def test_no_dense_conv_at_512_forward(self, lowered_texts):
        fwd, _ = lowered_texts
        at512 = [s for s in _conv_out_shapes(fwd) if _SPATIAL_512.match(s)]
        assert at512 == [], f"dense 512x512 convs reappeared: {at512}"

    def test_no_dense_conv_at_512_backward(self, lowered_texts):
        _, bwd = lowered_texts
        at512 = [s for s in _conv_out_shapes(bwd) if _SPATIAL_512.match(s)]
        assert at512 == [], f"dense 512x512 convs in the grad: {at512}"


class TestDecoderConcatNeverMaterialized:
    # The three dense mid-level decoder concat results (batch-agnostic):
    # 1024ch@32^2, 512ch@64^2, 256ch@128^2. None exist today; any refactor
    # that merges (upsampled, skip) before the conv recreates them.
    REGRESSION = [
        re.compile(r"x32x32x1024x"),
        re.compile(r"x64x64x512x"),
        re.compile(r"x128x128x256x"),
    ]

    @pytest.mark.parametrize("which", [0, 1], ids=["forward", "backward"])
    def test_no_materialized_decoder_concat(self, lowered_texts, which):
        txt = lowered_texts[which]
        hits = [
            s
            for s in _concat_out_shapes(txt)
            for pat in self.REGRESSION
            if pat.search(f"x{s}x")
        ]
        assert hits == [], f"decoder concat materialized: {hits}"
