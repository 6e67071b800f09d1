#!/usr/bin/env python
"""HLO-derived multi-chip scaling prediction (VERDICT r4 item 2).

Compiles the sharded flagship train step on a virtual CPU mesh (no TPU
needed), sums the byte volume of every collective in the post-SPMD HLO, and
folds in v5e ICI bandwidth to predict per-step communication time and scaling
efficiency for a given mesh factorization. Results land in PERF.md
("Predicted multi-chip scaling").

Model:
* all-reduce (grad sync) on an N-chip ring/torus moves 2*(N-1)/N * bytes per
  chip; reduce-scatter / all-gather move (N-1)/N * bytes each.
* collective-permute (conv halo slabs) moves its full buffer once over one
  hop.
* v5e ICI: 4 links/chip x 400 Gbps/link/direction (public spec: 1600 Gbps
  aggregate). A ring all-reduce uses 2 links (1 in + 1 out) concurrently =>
  EFFECTIVE_ICI_GBPS defaults to 45 GB/s per direction with a documented
  pessimistic band down to 25 GB/s (protocol + fragmentation overheads).
* compute/chip is the measured single-chip step time at per-chip batch 1
  (BENCH_r04: 121.7 ms); efficiency bands assume zero overlap (pessimistic)
  and full compute/comm overlap (optimistic).

Usage:
  python tools/collective_bytes.py --mesh data8
  python tools/collective_bytes.py --mesh data2,space4 --shape 128
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SINGLE_CHIP_STEP_MS = 121.7  # measured, BENCH_r04 / PERF.md round 4

from unet3d_tpu.parallel.hlo_stats import (  # noqa: E402
    EFFECTIVE_ICI_GBPS, collective_byte_stats as collective_bytes,
    predict_scaling)


def build_hlo(mesh_spec: dict, shape: int, filters, batch_per_data: int = 1,
              in_channels: int = 4, out_channels: int = 3):
    n = 1
    for v in mesh_spec.values():
        n *= v
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.parallel.mesh import (make_mesh, replicate_state,
                                          shard_batch, sharded_train_step_hlo)
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state

    mesh = make_mesh(mesh_spec)
    nlev = len(filters)
    strides = [[1, 1, 1]] + [[2, 2, 2]] * (nlev - 1)
    model = create_model(
        "DynUNet", in_channels=in_channels, out_channels=out_channels,
        spatial_dims=3, strides=strides, filters=list(filters),
        kernel_size=[[3, 3, 3]] * nlev,
        upsample_kernel_size=[[2, 2, 2]] * (nlev - 1), deep_supervision=False)
    variables = init_params(model, (shape, shape, shape, in_channels))
    import jax as _jax
    param_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in _jax.tree_util.tree_leaves(variables["params"]))
    tx = build_optimizer("Adam", lr=1e-3)
    state = replicate_state(create_train_state(variables, tx), mesh)
    batch = mesh.shape.get("data", 1) * batch_per_data
    rng = np.random.RandomState(0)
    images = shard_batch(jnp.asarray(
        rng.rand(batch, in_channels, shape, shape, shape), jnp.float32), mesh)
    labels = shard_batch(jnp.asarray(
        (rng.rand(batch, out_channels, shape, shape, shape) > 0.5)
        .astype(np.float32)), mesh)
    hlo = sharded_train_step_hlo(model, DiceLoss(sigmoid=True), tx, mesh,
                                 state, images, labels, amp=True)
    return hlo, param_bytes, n


def main():
    from unet3d_tpu.parallel.mesh import parse_mesh_spec
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="data8")
    p.add_argument("--shape", type=int, default=128)
    p.add_argument("--filters", default="64,96,128,192,256,384")
    p.add_argument("--ici_gbps", type=float, default=EFFECTIVE_ICI_GBPS)
    p.add_argument("--step_ms", type=float, default=SINGLE_CHIP_STEP_MS)
    p.add_argument("--hlo_out", default=None,
                   help="Optionally dump the compiled HLO text here.")
    args = p.parse_args()
    spec = parse_mesh_spec(args.mesh)
    filters = [int(f) for f in args.filters.split(",")]
    hlo, param_bytes, n = build_hlo(spec, args.shape, filters)
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(hlo)
    stats = collective_bytes(hlo)
    # per-chip compute stays the single-chip step at per-chip batch 1 for pure
    # DP; a space axis divides the volume (and roughly the compute) per chip
    pred = predict_scaling(stats, n, args.step_ms,
                           space=spec.get("space", 1), ici_gbps=args.ici_gbps)
    result = {
        "mesh": spec, "shape": args.shape, "n_chips": n,
        "param_bytes": param_bytes,
        "collectives": {op: {"count": e["count"], "bytes": e["bytes"],
                             "max_bytes": max(e["sizes"])}
                        for op, e in stats.items()},
        "ici_gbps": args.ici_gbps,
        "wire_bytes_per_chip": pred["wire_bytes_per_chip"],
        "comm_ms": round(pred["comm_ms"], 3),
        "compute_ms_per_chip": round(pred["compute_ms_per_chip"], 3),
        "efficiency_no_overlap": round(pred["efficiency_no_overlap"], 4),
        "efficiency_full_overlap": round(pred["efficiency_full_overlap"], 4),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
