"""Pallas TPU kernel: fused [per-channel affine + LeakyReLU] -> 3x3x3 conv.

The pass-removal experiment VERDICT r4 item 3 asked for, at multi-op
granularity: in a DynUNet basic block (conv -> IN -> lrelu -> conv -> IN ->
lrelu, `models/layers.py`), the normalized+activated intermediate ``z1 =
lrelu(norm(y1))`` is a full materialized HBM pass (write + read ~536 MB at
level 0). This kernel consumes ``y1`` directly: the per-channel affine
``y*scale + shift`` (the IN normalization folded into scale/shift from the
precomputed stats) and the LeakyReLU are applied to each VMEM slab after its
DMA — the elementwise work rides the DMA'd bytes for free (VPU, no HBM
traffic) — and the conv then runs exactly like ``conv3d_kernel``.

Padding semantics: the conv must see ZEROS outside the true volume (SAME
padding applies to z1, not y1), but the affine makes padded zeros nonzero
(``lrelu(shift) != 0``). The kernel therefore masks each transformed slab
back to zero outside the volume: depth validity is a scalar per (step, dz)
(a slab spans one depth), row/column validity are iota masks against the
static tile coordinates.

Cited round-3/4 context: single-op Pallas convs lose at C=64 to the 128-lane
DMA padding tax and every pallas_call site pays ~3 ms of layout-boundary tax
(PERF.md) — this kernel exists to measure whether multi-op fusion amortizes
those taxes. tools/bench_block_kernel.py records the verdict.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover - pallas always importable with jax
    _PALLAS_OK = False

from unet3d_tpu.ops.pallas.conv3d_kernel import _pad_to_lanes, _pick_tile


def pallas_block_conv3d_available(shape: Tuple[int, ...],
                                  w_shape: Tuple[int, ...]) -> bool:
    """The kernel's real preconditions: pallas importable, 3x3x3 taps, and a
    valid H tile (any W tail-pads to 16 sublanes; any C pads to 128 lanes —
    the C<128 padding tax is an economics question, not a validity one).
    ``pallas_block_conv3d`` enforces this; callers use it to pre-screen."""
    if not _PALLAS_OK:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    h = shape[2]
    return _pick_tile(h) is not None


def _block_kernel(th: int, w: int, c: int, cout: int, h_pad: int, d_out: int,
                  w_total: int, n_h_blocks: int, alpha: float):
    n_scan = th + 2

    def _halo_base(step):
        hblk = step % n_h_blocks
        p = step // n_h_blocks
        n = p // d_out
        d = p % d_out
        return (n * (d_out + 2) + d) * h_pad + hblk * th

    def _dma(x_hbm, scratch, sems, base, slot, start=True):
        for dz in range(3):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(base + dz * h_pad, n_scan)],
                scratch.at[pl.ds((slot * 3 + dz) * n_scan, n_scan)],
                sems.at[slot, dz])
            if start:
                cp.start()
            else:
                cp.wait()

    # static column-validity mask: true volume occupies w in [1, w] of the
    # padded (left halo 1 + tail) width
    def _col_mask():
        iw = jax.lax.broadcasted_iota(jnp.int32, (1, w_total, 1), 1)
        return (iw >= 1) & (iw <= w)

    def kernel(x_hbm, w_ref, sc_ref, sh_ref, o_ref, scratch, sems):
        p = pl.program_id(0)
        hblk = pl.program_id(1)
        step = p * n_h_blocks + hblk
        n_steps = pl.num_programs(0) * n_h_blocks
        slot = step % 2
        base = _halo_base(step)
        d_idx = p % d_out  # output depth; input slab dz spans d_idx+dz

        @pl.when(step == 0)
        def _():
            _dma(x_hbm, scratch, sems, base, 0)
        nstep = step + 1
        @pl.when(nstep < n_steps)
        def _():
            _dma(x_hbm, scratch, sems, _halo_base(nstep), nstep % 2)
        _dma(x_hbm, scratch, sems, base, slot, start=False)

        scale = sc_ref[0]   # (C,)
        shift = sh_ref[0]
        col_ok = _col_mask()
        acc = jnp.zeros((th * w, cout), jnp.float32)
        slot_off = slot * 3 * n_scan
        for dz in range(3):
            # depth validity: input depth (d_idx + dz) in padded (D+2) space
            # is real iff 1 <= d_idx+dz <= d_out, i.e. never invalid for
            # dz=1; dz=0 invalid at d_idx==0; dz=2 invalid at d_idx==d_out-1
            if dz == 0:
                d_ok = d_idx > 0
            elif dz == 2:
                d_ok = d_idx < d_out - 1
            else:
                d_ok = None
            for dy in range(3):
                rows = scratch[pl.ds(slot_off + dz * n_scan + dy, th)]
                # row validity: global h position hblk*th + dy + r must be
                # in [1, H] of the padded H+2 space; H = n_h_blocks*th
                ih = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) \
                    + hblk * th + dy
                ok = (ih >= 1) & (ih <= n_h_blocks * th) & col_ok
                if d_ok is not None:
                    ok = ok & d_ok
                z = rows.astype(jnp.float32) * scale + shift
                z = jnp.where(z >= 0, z, z * alpha)
                z = jnp.where(ok, z, 0.0).astype(rows.dtype)
                for dx in range(3):
                    taps = z[:, dx:dx + w, :]
                    acc = acc + jnp.dot(taps.reshape(th * w, c),
                                        w_ref[(dz * 3 + dy) * 3 + dx],
                                        preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(th, w, cout).astype(o_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("alpha",))
def pallas_block_conv3d(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                        shift: jnp.ndarray, alpha: float = 0.01) -> jnp.ndarray:
    """conv3d(lrelu(x*scale + shift), w) with the elementwise chain fused
    into the conv's DMA prologue. x: (N, D, H, W, C) NDHWC; w: (3,3,3,C,Cout);
    scale/shift: (C,) — the instance-norm affine folded with its stats.

    Forward-only (the experiment measures forward economics first; the
    backward would reuse conv3d_kernel's dx/dw with the chain rule applied
    outside)."""
    if not pallas_block_conv3d_available(x.shape, w.shape):
        raise ValueError(
            f"pallas_block_conv3d: unsupported shapes x={x.shape} "
            f"w={w.shape} (needs pallas, 3x3x3 taps, and a tileable H)")
    n, d, h, wd, c = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h)
    cp_ = _pad_to_lanes(c)
    w_pad_total = ((wd + 2 + 15) // 16) * 16
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, w_pad_total - wd - 1),
                     (0, cp_ - c)))
    x3 = xp.reshape(n * (d + 2) * (h + 2), w_pad_total, cp_)
    w_padded = jnp.pad(w.astype(x.dtype), ((0, 0), (0, 0), (0, 0),
                                           (0, cp_ - c), (0, 0)))
    w27 = w_padded.reshape(27, cp_, cout)
    # scale/shift padded to lanes; padded channels get scale=0/shift=0 so the
    # transformed pad lanes stay zero against the zero weight rows anyway
    sc = jnp.pad(scale.astype(jnp.float32), (0, cp_ - c)).reshape(1, cp_)
    sh = jnp.pad(shift.astype(jnp.float32), (0, cp_ - c)).reshape(1, cp_)
    grid = (n * d, h // th)
    out = pl.pallas_call(
        _block_kernel(th, wd, cp_, cout, h + 2, d, w_pad_total, h // th,
                      float(alpha)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, cp_, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp_), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp_), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, wd, cout),
                               lambda i, j: (i * (h // th) + j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * d * h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * 3 * (th + 2), w_pad_total, cp_), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(x3, w27, sc, sh)
    return out.reshape(n, d, h, wd, cout)
