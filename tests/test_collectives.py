"""Collective inventory of the sharded train step (VERDICT r3 item 7).

Compiles the (data x space)-mesh train step on the virtual 8-device CPU mesh
and asserts the post-SPMD HLO contains exactly the intended communication
pattern: gradient/loss all-reduces and conv-halo collective-permutes, and NO
full-activation all-gathers (the signature of a broken sharding that
replicates activations instead of exchanging halos). The matching prose
inventory lives in PERF.md ("Mesh collective inventory").
"""
import re

import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.models.registry import create_model, init_params
from unet3d_tpu.parallel.mesh import (make_mesh, replicate_state,
                                      shard_batch, sharded_train_step_hlo)
from unet3d_tpu.train.losses import DiceLoss
from unet3d_tpu.train.optim import build_optimizer
from unet3d_tpu.train.step import create_train_state

pytestmark = pytest.mark.slow  # one full sharded-step compile (~1-2 min CPU)


def _hlo_op_shapes(hlo: str, op: str):
    """Byte sizes of every `op` instruction's output in the HLO text.

    HLO definition form: ``%name = f32[2,3]{1,0} all-gather(...)`` — the
    shape sits between '=' and the op name."""
    sizes = []
    for m in re.finditer(rf"=\s*\(?(\w+)\[([\d,]*)\]\S*\s+{op}\(", hlo):
        dtype, dims = m.group(1), m.group(2)
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        itemsize = {"f32": 4, "bf16": 2, "f16": 2, "u8": 1, "pred": 1,
                    "s32": 4, "u32": 4, "f64": 8}.get(dtype, 4)
        sizes.append(n * itemsize)
    return sizes


def _count(hlo: str, op: str) -> int:
    """Number of `op` instruction definitions (not operand references)."""
    return len(re.findall(rf"\s{op}\(", hlo))


def _build_sharded_step_hlo(size: int) -> str:
    mesh = make_mesh({"data": 2, "space": 4})
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 3
    model = create_model(
        "DynUNet", in_channels=2, out_channels=3, spatial_dims=3,
        strides=strides, filters=[4, 8, 8, 16],
        kernel_size=[[3, 3, 3]] * 4,
        upsample_kernel_size=[[2, 2, 2]] * 3, deep_supervision=False)
    variables = init_params(model, (size, size, size, 2))
    tx = build_optimizer("Adam", lr=1e-3)
    state = replicate_state(create_train_state(variables, tx), mesh)
    rng = np.random.RandomState(0)
    images = shard_batch(jnp.asarray(rng.rand(2, 2, size, size, size),
                                     jnp.float32), mesh)
    labels = shard_batch(jnp.asarray(rng.rand(2, 3, size, size, size) > 0.5,
                                     jnp.float32), mesh)
    return sharded_train_step_hlo(model, DiceLoss(sigmoid=True), tx, mesh,
                                  state, images, labels, amp=True)


@pytest.fixture(scope="module")
def hlo():
    return _build_sharded_step_hlo(16)


def test_inventory(hlo):
    # printed so the measured counts can be recorded in PERF.md
    counts = {op: _count(hlo, op) for op in
              ("all-reduce", "reduce-scatter", "all-gather",
               "collective-permute")}
    print("collective inventory:", counts)


def test_gradient_cross_device_reduction_present(hlo):
    # replicated params + data-sharded batch => the weight gradients need a
    # cross-device sum (all-reduce, or SPMD's reduce-scatter+all-gather form)
    assert (_count(hlo, "all-reduce") + _count(hlo, "reduce-scatter")) >= 1 \
        or _count(hlo, "all-gather") >= 1


def test_halo_collective_permutes_present(hlo):
    # spatial partitioning of 3^3 convs must exchange halo slabs along D
    assert _count(hlo, "collective-permute") >= 1


def test_no_full_activation_allgather(hlo):
    # Replicating a full activation (instead of halo exchange) would show up
    # as an all-gather at activation scale. The level-0 activation is
    # 2x16x16x16x4 bf16 = 64 KiB; anything >= one full level-0 activation is
    # a broken sharding. Small all-gathers (scalars, norm stats) are fine.
    full_activation_bytes = 2 * 16 * 16 * 16 * 4 * 2
    big = [s for s in _hlo_op_shapes(hlo, "all-gather")
           if s >= full_activation_bytes]
    assert big == [], f"full-activation all-gathers found: {big}"


def test_gradient_allreduce_bytes_cover_params(hlo):
    """The combined gradient all-reduce must move (at least) the full f32
    parameter tree — an undercount means grad sync is silently missing from
    the byte model feeding the PERF.md scaling predictions (VERDICT r4
    item 2; the tools/collective_bytes.py parser originally dropped the
    108-operand tuple all-reduce on XLA's /*index=N*/ comments)."""
    import jax
    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.parallel.hlo_stats import collective_byte_stats
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 3
    model = create_model(
        "DynUNet", in_channels=2, out_channels=3, spatial_dims=3,
        strides=strides, filters=[4, 8, 8, 16],
        kernel_size=[[3, 3, 3]] * 4,
        upsample_kernel_size=[[2, 2, 2]] * 3, deep_supervision=False)
    variables = init_params(model, (16, 16, 16, 2))
    param_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in jax.tree_util.tree_leaves(variables["params"]))
    stats = collective_byte_stats(hlo)
    ar = stats.get("all-reduce", {"bytes": 0})["bytes"]
    assert ar >= param_bytes, (ar, param_bytes)
    # ...and not wildly more: grad sync + per-space norm-stat reductions +
    # loss scalars; 3x params is far below any activation-replication blowup
    assert ar <= 3 * param_bytes + (1 << 20), (ar, param_bytes)


def test_halo_traffic_is_surface_not_volume(hlo):
    """Conv-halo traffic must scale with the shard SURFACE, not its VOLUME
    (VERDICT r4 item 2). Per-instruction size bounds are fragile — XLA's
    collective-permute combiner batches several slabs into one instruction —
    so the robust form is a scaling law: doubling the spatial size grows the
    volume 8x but boundary slabs only 4x. A sharding that degraded to shard
    replication (or thickness-proportional exchange) would track the volume.
    """
    from unet3d_tpu.parallel.hlo_stats import collective_byte_stats
    small = collective_byte_stats(hlo)["collective-permute"]
    big = collective_byte_stats(
        _build_sharded_step_hlo(32))["collective-permute"]
    assert small["bytes"] > 0 and big["bytes"] > 0
    growth = big["bytes"] / small["bytes"]
    # surface scaling is 4x; allow slack for size-dependent fusion choices,
    # but stay well under the 8x volume signature
    assert growth <= 6.0, f"halo bytes grew {growth:.2f}x for 8x volume"


def test_no_involuntary_remat_allreduce_storm(hlo):
    # the r3 failure mode replicated tensors via reshape+all-reduce chains;
    # bound the total collective count to catch a regression to that pattern
    n = sum(_count(hlo, op) for op in
            ("all-reduce", "reduce-scatter", "all-gather",
             "collective-permute"))
    # measured healthy count for this 4-level net on data2 x space4: 201
    # (dominated by fwd+bwd halo permutes around every spatially-sharded
    # conv); an involuntary-remat regression multiplies this
    assert n < 400, f"collective explosion: {n} collectives in one step"
