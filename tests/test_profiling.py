"""Tests for utils/profiling.py — HLO cost-table parsing.

The parser must handle real TPU-style optimized HLO (tiled layouts,
memory-space suffixes, kOutput conv fusions with backend_config) and the
CPU backend's text equally; FLOP math is asserted against hand-computed
values. Replaces the profiler the reference never had (SURVEY §5.1).
"""

import jax
import jax.numpy as jnp
import pytest
from jax import lax

from unet_implementations_tpu.utils.profiling import (
    cost_table,
    cost_table_from_text,
    diff_tables,
    format_diff,
    format_table,
    summarize,
)

# Hand-written module in the exact shape the TPU backend emits (tiled
# layouts, S(1) memory-space suffix, fusion backend_config, tuple types).
TPU_STYLE_HLO = """
HloModule jit_f, is_scheduled=true, entry_computation_layout={(bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)})->bf16[8,32,32,64]{3,0,2,1:T(8,128)(2,1)}}

%fused_computation (param_0.1: bf16[8,64,64,32]) -> bf16[8,64,64,32] {
  %param_0.1 = bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %multiply.1 = bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)} multiply(%param_0.1, %param_0.1)
  ROOT %maximum.1 = bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)} maximum(%param_0.1, %multiply.1)
}

%fused_convolution (param_0.2: bf16[8,64,64,32], param_1.2: bf16[3,3,32,64]) -> bf16[8,32,32,64] {
  %param_0.2 = bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %param_1.2 = bf16[3,3,32,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %convolution.1 = bf16[8,32,32,64]{3,0,2,1:T(8,128)(2,1)} convolution(%param_0.2, %param_1.2), window={size=3x3 stride=2x2 pad=0_1x0_1}, dim_labels=b01f_01io->b01f
}

%multi_out (param_0.3: bf16[8,32,32,64]) -> (bf16[8,32,32,64], f32[8]) {
  %param_0.3 = bf16[8,32,32,64]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %convert.1 = f32[8,32,32,64]{3,0,2,1:T(8,128)} convert(%param_0.3)
  %constant.1 = f32[] constant(0)
  %reduce.1 = f32[8]{0:T(256)} reduce(%convert.1, %constant.1), dimensions={1,2,3}, to_apply=%add_comp
  ROOT %tuple.1 = (bf16[8,32,32,64]{3,0,2,1:T(8,128)(2,1)}, f32[8]{0:T(256)}) tuple(%param_0.3, %reduce.1)
}

ENTRY %main.42 (p0.1: bf16[8,64,64,32], p1.1: bf16[3,3,32,64]) -> bf16[8,32,32,64] {
  %p0.1 = bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)} parameter(0), metadata={op_name="args[0]"}
  %p1.1 = bf16[3,3,32,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %act_fusion = bf16[8,64,64,32]{3,0,2,1:T(8,128)(2,1)S(1)} fusion(%p0.1), kind=kLoop, calls=%fused_computation, metadata={op_name="jit(f)/leaky" source_file="<string>" source_line=7}
  ROOT %conv_fusion = bf16[8,32,32,64]{3,0,2,1:T(8,128)(2,1)} fusion(%act_fusion, %p1.1), kind=kOutput, calls=%fused_convolution, metadata={op_name="jit(f)/conv"}, backend_config={"flag_configs":[],"window_config":{"kernel_window_bounds":["3","3","4","1"]}}
}
"""

# conv: out 8*32*32*64 = 524288 elems, k=3x3, cin=32
CONV_USEFUL = 2 * 524288 * 9 * 32
# lane padding: cin 32->128 (x4), cout 64->128 (x2)
CONV_PADDED = CONV_USEFUL * 4 * 2


class TestParser:
    def test_fixture_rows(self):
        rows = cost_table_from_text(TPU_STYLE_HLO)
        by_name = {r["name"]: r for r in rows}
        assert set(by_name) == {"act_fusion", "conv_fusion"}

        conv = by_name["conv_fusion"]
        assert conv["flops"] == CONV_USEFUL
        assert conv["flops_padded"] == CONV_PADDED
        assert conv["op_name"] == "jit(f)/conv"
        assert conv["heavy_ops"] == ["conv3x3->8x32x32x64"]
        # bytes: input act (8*64*64*32*2) + kernel (3*3*32*64*2) + out
        assert conv["bytes"] == (8 * 64 * 64 * 32 * 2 + 3 * 3 * 32 * 64 * 2
                                 + 8 * 32 * 32 * 64 * 2)

        act = by_name["act_fusion"]
        assert act["flops"] == 0
        assert act["bound"] == "memory"
        assert act["bytes"] == 2 * (8 * 64 * 64 * 32 * 2)

    def test_summary_and_format(self):
        rows = cost_table_from_text(TPU_STYLE_HLO)
        s = summarize(rows)
        assert s["flops"] == CONV_USEFUL
        assert s["flops_padded"] == CONV_PADDED
        txt = format_table(rows)
        assert "TOTAL" in txt and "jit(f)/conv" in txt

    def test_tuple_typed_instruction(self):
        # Tuple types contain spaces and nested parens — the depth scanner
        # must still find the opcode and count every element buffer.
        hlo = """
HloModule jit_g, is_scheduled=true

%fc (param_0: bf16[4,8]) -> (bf16[4,8], f32[4]) {
  %param_0 = bf16[4,8]{1,0:T(8,128)(2,1)} parameter(0)
  %convert.2 = f32[4,8]{1,0:T(8,128)} convert(%param_0)
  %c0 = f32[] constant(0)
  %reduce.2 = f32[4]{0:T(256)} reduce(%convert.2, %c0), dimensions={1}, to_apply=%add
  ROOT %tuple.2 = (bf16[4,8]{1,0:T(8,128)(2,1)}, f32[4]{0:T(256)}) tuple(%param_0, %reduce.2)
}

ENTRY %main (p0: bf16[4,8]) -> (bf16[4,8], f32[4]) {
  %p0 = bf16[4,8]{1,0:T(8,128)(2,1)} parameter(0)
  ROOT %out_fusion = (bf16[4,8]{1,0:T(8,128)(2,1)}, f32[4]{0:T(256)}) fusion(%p0), kind=kOutput, calls=%fc, metadata={op_name="jit(g)/sum"}
}
"""
        rows = cost_table_from_text(hlo)
        (row,) = rows
        assert row["name"] == "out_fusion"
        assert row["opcode"] == "fusion"
        # bytes: input 4*8*2 + tuple output (4*8*2 + 4*4)
        assert row["bytes"] == 4 * 8 * 2 + (4 * 8 * 2 + 4 * 4)

    def test_diff_zero_on_self(self):
        rows = cost_table_from_text(TPU_STYLE_HLO)
        diff = diff_tables(rows, rows)
        assert all(r["delta_us"] == 0 for r in diff)
        assert "TOTAL" in format_diff(diff)


class TestCompiledIntegration:
    def test_cpu_conv_cost(self):
        def f(x, w):
            y = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0.01 * y).mean(axis=(1, 2))

        x = jnp.ones((2, 16, 16, 8), jnp.float32)
        w = jnp.ones((3, 3, 8, 8), jnp.float32)
        rows = cost_table(f, x, w)
        # one conv: 2 * (2*16*16*8) * 9 * 8 useful flops, wherever the
        # backend put it (standalone op or inside a fusion)
        assert summarize(rows)["flops"] == 2 * (2 * 16 * 16 * 8) * 9 * 8
        assert all(r["bytes"] >= 0 for r in rows)
        assert any(r["heavy_ops"] for r in rows)

    def test_cpu_dot_cost(self):
        def f(a, b):
            return jnp.tanh(a @ b)

        a = jnp.ones((64, 32), jnp.float32)
        b = jnp.ones((32, 48), jnp.float32)
        rows = cost_table(f, a, b)
        assert summarize(rows)["flops"] == 2 * 64 * 48 * 32

    def test_unet_block_table(self):
        # The real model's blocks produce a parseable, conv-dominated table.
        from unet_implementations_tpu.models.blocks import ConvBlock

        m = ConvBlock(features=16, n_convs=2, dtype=jnp.float32)
        x = jnp.ones((1, 32, 32, 8), jnp.float32)
        params = m.init(jax.random.key(0), x, deterministic=True)

        rows = cost_table(
            lambda p, x: m.apply(p, x, deterministic=True), params, x)
        s = summarize(rows)
        # two 3x3 convs: 8->16 and 16->16
        expected = (2 * (32 * 32 * 16) * 9 * 8) + (2 * (32 * 32 * 16) * 9 * 16)
        assert s["flops"] == pytest.approx(expected)
        assert s["t_roofline_ms"] > 0
