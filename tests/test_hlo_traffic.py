"""utils/hlo_traffic: the repo's single utilization semantics (post-fusion
top-level HLO traffic, the probe_traffic_floor.py measure now shared by
bench.py and profile_train_step.py — VERDICT r3 #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from freesound_classification_tpu.utils.hlo_traffic import (
    compiled_traffic_bytes,
    entry_traffic,
    shape_bytes,
)


class TestShapeBytes:
    def test_simple(self):
        assert shape_bytes("f32[64,215,64]") == 64 * 215 * 64 * 4
        assert shape_bytes("bf16[8,128]") == 8 * 128 * 2

    def test_tuple(self):
        assert shape_bytes("(f32[2], bf16[3,4])") == 8 + 24

    def test_scalar_and_token(self):
        assert shape_bytes("f32[]") == 4  # rank-0 scalar is one element
        assert shape_bytes("token[]") == 0


class TestEntryTraffic:
    def test_matmul_traffic_bounds(self):
        a = jnp.zeros((256, 256), jnp.float32)
        b = jnp.zeros((256, 256), jnp.float32)
        compiled = jax.jit(lambda x, y: x @ y).lower(a, b).compile()
        total = compiled_traffic_bytes(compiled)
        essential = 3 * 256 * 256 * 4  # two reads + one write
        # the dot itself must be counted; small epilogues may add a bit
        assert total >= essential
        assert total <= 4 * essential

    def test_elementwise_fusion_counts_once(self):
        # a chain of elementwise ops fuses to ~one kernel: traffic should
        # be near read+write of one buffer, NOT 2 bytes per op in the chain
        x = jnp.zeros((1024, 1024), jnp.float32)

        def chain(v):
            for _ in range(8):
                v = v * 1.5 + 0.25
            return v

        compiled = jax.jit(chain).lower(x).compile()
        total = compiled_traffic_bytes(compiled)
        one_pass = 2 * 1024 * 1024 * 4
        assert total <= 2 * one_pass, (
            "elementwise chain not fused — top-level traffic should be "
            "~read+write once")

    def test_per_op_breakdown(self):
        a = jnp.zeros((128, 128), jnp.float32)
        compiled = jax.jit(lambda x: (x @ x).sum()).lower(a).compile()
        total, offenders, by_op = entry_traffic(compiled.as_text())
        assert total > 0
        assert offenders, "expected at least one top-level instruction"
        assert all(isinstance(v, (int, np.integer)) and v >= 0
                   for v in by_op.values())
