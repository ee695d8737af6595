"""Regression guards for the measured kernel tiling/grouping heuristics.

These rules encode real v5e measurements (r2/r3); a silent change flips a
measured-fast configuration to a measured-slow (or compile-OOM) one, so pin
them per shape. Sources: ops/attention.py::_samples_per_cell,
ops/fused_ln.py::_batch_tile, ops/fused_ffn.py LAYOUT_ROWS notes.
"""
from slim_switch_moe_vit_tpu.ops.attention import (
    _round_block_n, _samples_per_cell,
)
from slim_switch_moe_vit_tpu.ops.fused_ln import _batch_tile


def _mha_fwd_G(B, N, C, H):
    nb = _round_block_n(N)
    return _samples_per_cell(B, nb, (3 * C + C) * 2)


def _mha_bwd_G(B, N, C, H):
    nb = _round_block_n(N)
    return _samples_per_cell(B, nb, (2 * 3 * C + C) * 2, bwd=True)


class TestMhaGrouping:
    def test_tiny_eval_forward_groups_two(self):
        # measured r3: G=2 0.295 vs G=1 0.359 ms/block at b256/C=192
        assert _mha_fwd_G(256, 197, 192, 3) == 2

    def test_vit_s_forward_stays_single(self):
        # measured r3: G=2 is 15% SLOWER at ViT-S (0.358 vs 0.311)
        assert _mha_fwd_G(128, 197, 384, 6) == 1

    def test_384px_forward_stays_single(self):
        assert _mha_fwd_G(64, 577, 384, 6) == 1

    def test_vit_s_backward_groups_two(self):
        # measured r2: bwd ~5% faster at G=2 (independent chains)
        assert _mha_bwd_G(128, 197, 384, 6) == 2

    def test_384px_backward_stays_single(self):
        # r2: G=2 at N=577 was a hard scoped-vmem OOM (22.6M vs 16M)
        assert _mha_bwd_G(64, 577, 384, 6) == 1

    def test_odd_batch_never_grouped(self):
        assert _mha_fwd_G(255, 197, 192, 3) == 1
        assert _mha_bwd_G(127, 197, 384, 6) == 1


class TestLnBatchTile:
    def test_vit_s_224(self):
        # r3: G=8 implies an ~18M f32 kernel stack at (197,384) — over the
        # 16M scoped limit (the compact model hit it as a compile OOM)
        assert _batch_tile(128, 197, 384) == 4

    def test_tiny_224(self):
        assert _batch_tile(256, 197, 192) == 8

    def test_384px(self):
        assert _batch_tile(64, 577, 384) == 1

    def test_vmem_budget_counts_kernel_stack(self):
        # every admitted G must keep stack + double-buffered operands <= 13M
        for b, n, d in [(128, 197, 384), (256, 197, 192), (64, 577, 384),
                        (512, 197, 192), (8, 197, 768)]:
            g = _batch_tile(b, n, d)
            per_sample = 6 * n * d * 4 + 4 * n * d * 2 * 2
            assert g * per_sample <= 13 * 2 ** 20
            assert b % g == 0
