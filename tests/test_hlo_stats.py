"""Unit tests for the HLO collective byte accounting (parallel/hlo_stats.py).

Pins the round-5 cost-model fixes: per-instruction replica-subgroup sizes
(a space-axis all-reduce on a DP2xSP4 mesh costs (4-1)/4, not (8-1)/8),
async ``-start`` forms for EVERY collective (reduce-scatter-start /
all-to-all-start were silently dropped before), and ``/*index=N*/`` comment
stripping. The full-model inventory lives in tests/test_collectives.py (slow).
"""
from unet3d_tpu.parallel.hlo_stats import (collective_byte_stats,
                                           wire_bytes_per_chip)

HLO = """
ENTRY %main {
  %ar = f32[100]{0} all-reduce(%a), replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add
  %ar2 = bf16[50]{0} all-reduce-start(%b), replica_groups={{0,1,2,3},{4,5,6,7}}, to_apply=%add
  %rs = f32[10]{0} reduce-scatter-start(%c), replica_groups=[2,4]<=[8], dimensions={0}, to_apply=%add
  %cp = bf16[4,8]{1,0} collective-permute-start(%d), source_target_pairs={{0,1},{1,0}}
  %aa = f32[8]{0} all-to-all-start(%e), replica_groups=[4,2]<=[2,4]T(1,0), dimensions={0}
  %tup = (f32[2]{0}, f32[3]{0} /*index=1*/) all-reduce(%f, %g), replica_groups={{0,1}}, to_apply=%add
}
"""


def test_counts_and_async_forms():
    stats = collective_byte_stats(HLO)
    assert stats["all-reduce"]["count"] == 3
    assert stats["reduce-scatter"]["count"] == 1
    assert stats["collective-permute"]["count"] == 1
    assert stats["all-to-all"]["count"] == 1


def test_bytes_tuple_and_comments():
    stats = collective_byte_stats(HLO)
    # 100*4 + 50*2 + (2+3)*4 — the tuple all-reduce sums both elements even
    # with the /*index=N*/ marker inside the shape list
    assert stats["all-reduce"]["bytes"] == 400 + 100 + 20
    assert stats["reduce-scatter"]["bytes"] == 40
    assert stats["collective-permute"]["bytes"] == 64


def test_group_sizes_both_formats():
    stats = collective_byte_stats(HLO)
    assert stats["all-reduce"]["groups"] == [8, 4, 2]
    assert stats["reduce-scatter"]["groups"] == [4]  # iota [2,4]<=[8]
    assert stats["all-to-all"]["groups"] == [2]      # iota [4,2]<=...


def test_wire_bytes_uses_subgroup_ratio():
    stats = collective_byte_stats(HLO)
    want = (2 * (7 / 8) * 400      # global all-reduce
            + 2 * (3 / 4) * 100    # space-axis all-reduce (NOT 7/8)
            + 2 * (1 / 2) * 20     # pairwise tuple all-reduce
            + (3 / 4) * 40         # reduce-scatter, iota group of 4
            + 64                   # permute: one hop, full buffer
            + 8 * 4)               # all-to-all: full buffer
    assert abs(wire_bytes_per_chip(stats, n_chips=8) - want) < 1e-9


def test_missing_groups_falls_back_to_n_chips():
    stats = collective_byte_stats(
        "%ar = f32[10]{0} all-reduce(%a), to_apply=%add\n")
    assert stats["all-reduce"]["groups"] == [0]
    assert abs(wire_bytes_per_chip(stats, 4) - 2 * (3 / 4) * 40) < 1e-9
