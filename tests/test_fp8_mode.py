"""Opt-in fp8 conv mode (ops/quant.py): policy resolution, lowering, numerics.

The fp8 mode is a serving-only knob justified by the round-4 direct-conv
probe (+23% at the dominant s2dL0 shape — docs/PERFORMANCE.md reduced-
precision section). These tests pin:

1. **Default OFF**: with no env var, the model's lowering contains no fp8
   types — the bf16 program is byte-identical to the pre-fp8-mode one.
2. **Policy resolution**: "all"/integer thresholds and the dtype picker.
3. **Selective lowering**: the min-grid threshold keeps small-grid convs
   in bf16 while big-grid convs go fp8.
4. **Numerics**: the fp8 program's output stays close to bf16 (e4m3: ~3
   mantissa bits of operand rounding; IN renormalizes after every conv) —
   the quality gate for the mode is the measured Dice drift on TPU
   (docs/PERFORMANCE.md), but the CPU check catches gross breakage.

No reference counterpart (the reference's AMP is torch fp16 autocast,
``Our_UNet/src/train.py:638-652``); this is TPU headroom engineering.
"""

import jax
import jax.numpy as jnp
import pytest

from unet_implementations_tpu.models.unet import unet_6stage
from unet_implementations_tpu.ops import quant


@pytest.fixture
def clean_env(monkeypatch):
    for var in ("UNET_TPU_CONV_FP8", "UNET_TPU_CONV_FP8_DTYPE"):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


class TestPolicy:
    def test_default_off(self, clean_env):
        assert quant.fp8_conv_min_grid() is None

    @pytest.mark.parametrize("val,want", [
        ("off", None), ("", None), ("false", None), ("none", None),
        ("all", 0), ("0", 0), ("128", 128), ("192", 192),
        ("garbage", None),
    ])
    def test_min_grid_values(self, clean_env, val, want):
        clean_env.setenv("UNET_TPU_CONV_FP8", val)
        assert quant.fp8_conv_min_grid() == want

    def test_dtype_picker(self, clean_env):
        assert quant.fp8_conv_dtype() == jnp.float8_e5m2
        clean_env.setenv("UNET_TPU_CONV_FP8_DTYPE", "e4m3")
        assert quant.fp8_conv_dtype() == jnp.float8_e4m3fn
        clean_env.setenv("UNET_TPU_CONV_FP8_DTYPE", "e5m2")
        assert quant.fp8_conv_dtype() == jnp.float8_e5m2


def _lower_small(size=64):
    model = unet_6stage(dtype=jnp.bfloat16)
    x = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x))["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return jax.jit(
        lambda p, x: model.apply({"params": p}, x, deterministic=True)
    ).lower(params, x).as_text()


class TestLowering:
    def test_default_has_no_fp8(self, clean_env):
        txt = _lower_small()
        assert "f8E5M2" not in txt and "f8E4M3" not in txt

    def test_all_mode_casts_convs(self, clean_env):
        clean_env.setenv("UNET_TPU_CONV_FP8", "all")
        txt = _lower_small()
        assert "f8E5M2" in txt
        assert "f8E4M3" not in txt

    def test_e4m3_dtype(self, clean_env):
        clean_env.setenv("UNET_TPU_CONV_FP8", "all")
        clean_env.setenv("UNET_TPU_CONV_FP8_DTYPE", "e4m3")
        txt = _lower_small()
        assert "f8E4M3" in txt and "f8E5M2" not in txt

    def test_min_grid_is_selective(self, clean_env):
        # At 64px input the biggest conv grid is 32² (s2d of the 64² level);
        # threshold 32 engages some convs, 64 none.
        clean_env.setenv("UNET_TPU_CONV_FP8", "32")
        some = _lower_small()
        clean_env.setenv("UNET_TPU_CONV_FP8", "all")
        all_ = _lower_small()
        clean_env.setenv("UNET_TPU_CONV_FP8", "64")
        none = _lower_small()
        assert "f8E5M2" in some and "f8E5M2" in all_
        assert all_.count("f8E5M2") > some.count("f8E5M2")
        assert "f8E5M2" not in none

    def test_params_stay_f32(self, clean_env):
        # The cast is execution-side only: the param tree is unchanged, so
        # checkpoints round-trip identically between modes.
        model = unet_6stage(dtype=jnp.bfloat16)
        x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x))["params"]
        assert all(
            s.dtype == jnp.float32 for s in jax.tree.leaves(shapes))


class TestNumerics:
    def test_fp8_drift_is_finite_and_selectivity_reduces_it(self, clean_env):
        # Characterization, not a quality gate: weight-rounding (2^-3
        # relative for e4m3) is a SYSTEMATIC per-layer perturbation that
        # compounds through the 23-conv stack — measured |dlogit| ~0.4×
        # logit-std with everything quantized (random init, 64²). The mode
        # is opt-in serving-only and measured END-TO-END SLOWER than bf16
        # anyway (docs/PERFORMANCE.md fp8 e2e section) — this test pins
        # that the path executes, stays finite, and that the min-grid
        # selectivity monotonically reduces drift (fewer quantized convs).
        model = unet_6stage(dtype=jnp.bfloat16)
        x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3),
                               jnp.bfloat16)
        params = model.init(jax.random.key(0), x)["params"]

        def logits():
            return jax.jit(
                lambda p, x: model.apply({"params": p}, x,
                                         deterministic=True)
            )(params, x).astype(jnp.float32)

        ref = logits()
        clean_env.setenv("UNET_TPU_CONV_FP8_DTYPE", "e4m3")
        clean_env.setenv("UNET_TPU_CONV_FP8", "all")
        got_all = logits()
        # threshold 32 quantizes only the 32²-grid convs (the s2d level
        # at this input size) — a strict subset of "all"
        clean_env.setenv("UNET_TPU_CONV_FP8", "32")
        got_sel = logits()

        assert bool(jnp.all(jnp.isfinite(got_all)))
        assert bool(jnp.all(jnp.isfinite(got_sel)))
        mad_all = float(jnp.abs(got_all - ref).mean())
        mad_sel = float(jnp.abs(got_sel - ref).mean())
        assert mad_all > 0, "fp8 path did not engage"
        assert mad_sel < mad_all, (
            f"selective fp8 should drift less: sel {mad_sel} vs all {mad_all}")
        # and the perturbation stays bounded relative to the signal
        assert mad_all < 2.0 * float(ref.std())
