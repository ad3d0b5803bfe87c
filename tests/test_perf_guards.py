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


@pytest.fixture(scope="module")
def lowered_fold_texts():
    """Lowered texts with BOTH upsample folds forced on — the TPU inference
    configuration (on CPU the folds default off, so the other fixture
    exercises the live path)."""
    import os

    saved = {k: os.environ.get(k)
             for k in ("UNET_TPU_S2D_UP_FOLD", "UNET_TPU_DENSE_UP_FOLD")}
    os.environ["UNET_TPU_S2D_UP_FOLD"] = "1"
    os.environ["UNET_TPU_DENSE_UP_FOLD"] = "1"
    try:
        model = unet_6stage(dtype=jnp.bfloat16)
        x = jnp.zeros((2, 512, 512, 3), jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x))["params"]
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        fwd = jax.jit(
            lambda p, x: model.apply({"params": p}, x, deterministic=True)
        ).lower(params, x).as_text()

        def loss_fn(p, x):
            out = model.apply({"params": p}, x, deterministic=True)
            return jnp.sum(out.astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss_fn)).lower(params, x).as_text()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return fwd, bwd


class TestDenseUpFoldActive:
    """The round-2 dense-level fold (models/s2d.py::conv_dense_up_fold,
    632-img/s configuration): at 512² the dense decoders' up segments must
    run as coarse-grid convs emitting q-major 4·Cout outputs, and the
    materialized fine-grid upsampled tensors must be gone."""

    # Fold interior convs: d0 x@16² 512→2048, d1 x@32² 512→1024 (the d2
    # fold conv 2x64x64x512 collides with the d1 live up-tensor shape, so
    # only these two are discriminating).
    FOLD_CONVS = ["2x16x16x2048x", "2x32x32x1024x"]
    # The live path's per-axis interleave intermediates (H doubled, W not)
    # — the only square-model tensors with asymmetric spatial dims, present
    # IFF an upsample materializes (verified on/off at head time):
    # d0 (2,32,16,512), d1 (2,64,32,512), d2 (2,128,64,256).
    HALF_INTERLEAVED = ["tensor<2x32x16x512x", "tensor<2x64x32x512x",
                        "tensor<2x128x64x256x"]

    def test_fold_convs_present_forward(self, lowered_fold_texts):
        fwd, _ = lowered_fold_texts
        outs = _conv_out_shapes(fwd)
        for want in self.FOLD_CONVS:
            assert any(s.startswith(want) for s in outs), (
                f"fold conv {want} missing; conv outs: {sorted(set(outs))}")

    @pytest.mark.parametrize("which", [0, 1], ids=["forward", "backward"])
    def test_no_materialized_upsample(self, lowered_fold_texts, which):
        txt = lowered_fold_texts[which]
        hits = [s for s in self.HALF_INTERLEAVED if s in txt]
        assert hits == [], (
            f"dense-level upsample rematerialized (interleave shapes {hits})")


class TestDenseFoldPerMode:
    """Round-4 per-mode gate: on a TPU backend with NO env overrides, the
    dense-level fold traces into inference jits (deterministic=True) but
    NOT into training jits (deterministic=False) — same-day isolation on
    v5e showed +4.5% inference / −6% train (scratch/measure_r3.log,
    docs/PERFORMANCE.md). Backend is faked; the policy functions read it
    at trace time, so the lowering is the real per-mode program."""

    def _lower(self, deterministic):
        model = unet_6stage(dtype=jnp.bfloat16)
        x = jnp.zeros((2, 512, 512, 3), jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x))["params"]
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        def loss_fn(p, x):
            out = model.apply(
                {"params": p}, x, deterministic=deterministic,
                rngs=None if deterministic else {"dropout": jax.random.key(1)},
            )
            return jnp.sum(out.astype(jnp.float32))

        fwd = jax.jit(
            lambda p, x: model.apply(
                {"params": p}, x, deterministic=deterministic,
                rngs=None if deterministic else {"dropout": jax.random.key(1)},
            )
        ).lower(params, x).as_text()
        bwd = jax.jit(jax.grad(loss_fn)).lower(params, x).as_text()
        return fwd, bwd

    @pytest.fixture
    def tpu_defaults(self, monkeypatch):
        for var in ("UNET_TPU_S2D_UP_FOLD", "UNET_TPU_DENSE_UP_FOLD"):
            monkeypatch.delenv(var, raising=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        return monkeypatch

    def test_inference_jit_has_dense_fold(self, tpu_defaults):
        fwd, _ = self._lower(deterministic=True)
        outs = _conv_out_shapes(fwd)
        for want in TestDenseUpFoldActive.FOLD_CONVS:
            assert any(s.startswith(want) for s in outs), (
                f"inference jit lost the dense fold ({want} missing)")

    def test_train_jit_has_no_dense_fold(self, tpu_defaults):
        fwd, bwd = self._lower(deterministic=False)
        for txt, name in ((fwd, "forward"), (bwd, "backward")):
            outs = _conv_out_shapes(txt)
            hits = [s for s in outs
                    for want in TestDenseUpFoldActive.FOLD_CONVS
                    if s.startswith(want)]
            assert hits == [], (
                f"dense fold traced into the train-{name} program: {hits} — "
                f"it regresses the train step 6% (docs/PERFORMANCE.md)")
