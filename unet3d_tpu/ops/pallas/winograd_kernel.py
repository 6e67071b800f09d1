"""Pallas TPU kernel: Winograd F(2,3) x F(2,3) x direct 3-tap convolution.

VERDICT r2 perf item 1(b): the XLA-level F(2^3,3^3) measured 4-8x WORSE than
decomp2d (tools/microbench_winograd.py) because the 8x transform domain
round-trips HBM. This kernel keeps the transform domain in VMEM.

Design (shaped by the v5e Mosaic constraints recorded in CLAUDE.md):

* Winograd on D and H only (2.25x fewer conv FLOPs); the W axis stays a
  direct 3-tap conv via statically shifted sublane slices — the exact
  access pattern the round-1 conv kernel proved legal. Full F(2^3,3^3)
  would need stride-2 lane/sublane gathers (crash country).
* Halos WITHOUT manual DMA: the padded input is passed FOUR times with
  automatic BlockSpecs whose index maps are offset by one block — (dtile,
  dtile+1) x (hblock, hblock-halo) — so every read is a legal non-overlapping
  block fetch and the halo is just "the neighbor ref".
* Transform math is all leading-dim reshapes, static slices, adds — no
  strided slices, no lane-splitting reshapes, no rolls.
* Per (jd, jh, dx) point the channel contraction is one MXU dot
  (BH*W, C) @ (C, Cout) accumulated in f32; weights arrive pre-transformed
  U2[jd,jh,dx] = sum_{dz,dy} G[jd,dz] G[jh,dy] w[dz,dy,dx] (a (48, C, Cout)
  constant computed in XLA).

Numerics: the D/H input transform runs in bf16 (adds of 4 values), dots
accumulate f32, inverse transform in f32 — same loss profile as the bf16
XLA formulation measured in tests (~1 extra bit vs direct bf16 conv).
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
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)


def transform_weights_dh(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """(3,3,3,C,Co) -> (48, C, Co): G x G over (dz, dy), direct over dx."""
    g = jnp.asarray(_G)
    u = jnp.einsum("az,by,zyxio->abxio", g, g, w.astype(jnp.float32))
    return u.reshape(48, w.shape[3], w.shape[4]).astype(dtype)


def winograd_available(x_shape, w_shape, stride, padding) -> bool:
    if not _PALLAS_OK:
        return False
    # Mosaic-lowered kernel: TPU only (CPU tests take the decomp2d path)
    if jax.default_backend() != "tpu":
        return False
    if tuple(stride) != (1, 1, 1) or padding != "SAME":
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    n, d, h, w, c = x_shape
    if d % 2 or h % 2:
        return False
    return _pick_bh(h, w, c, w_shape[-1], 2) is not None


def _lane_pad(c: int) -> int:
    return ((c + 127) // 128) * 128


def _vmem_estimate(bh: int, w: int, c: int, cout: int, itemsize: int) -> int:
    """Rough per-step VMEM residency (bytes): double-buffered input/output
    blocks, transform intermediates, f32 output accumulators. Calibrated
    against the compiler: bf16 c=128 bh=8 fits (measured), f32 c=128 bh=8
    OOMs at 18M (measured)."""
    cp, cop = _lane_pad(c), _lane_pad(cout)
    in_blocks = 2 * (2 * 2 * bh * (w + 2) * cp) * itemsize * 2
    out_block = (2 * 2 * bh * w * cop) * itemsize * 2
    interm = (2 * 2 * bh * (w + 2) * cp) * itemsize * 4
    acc = 4 * bh * w * cop * 4
    return in_blocks + out_block + interm + acc


_VMEM_BUDGET = 15 * 1024 * 1024


def _pick_bh(h: int, w: int, c: int, cout: int, itemsize: int):
    """H-tiles per grid step: 2*BH rows; H/2 must divide into BH blocks and
    the working set must fit VMEM."""
    for bh in (8, 4, 2):
        if (h // 2) % bh == 0 and _vmem_estimate(bh, w, c, cout,
                                                 itemsize) <= _VMEM_BUDGET:
            return bh
    return None


def _kernel_with_stats(bh: int, w: int, c: int, cout: int, td: int, g_h: int,
                       acc_dtype):
    """Same as _kernel plus per-(item, channel) sum / sum-of-squares outputs
    accumulated across grid steps — the fused instance-norm-stats epilogue
    (PERF.md round-2 item 2): the norm's stats pass no longer re-reads the
    conv output from HBM.

    Stats block (1, 2, cout) keyed on the batch item: consecutive grid steps
    of one item revisit the same block, so it stays VMEM-resident; zeroed on
    the item's first step."""
    AT = ((1, 1, 1, 0), (0, 1, -1, -1))
    base = _kernel(bh, w, c, cout, acc_dtype)
    del AT

    def kernel(xa, xb, ha, hb, u2, o_ref, s_ref):
        t = pl.program_id(0) % td
        q = pl.program_id(1)

        @pl.when(jnp.logical_and(t == 0, q == 0))
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        base(xa, xb, ha, hb, u2, o_ref)
        y = o_ref[...].astype(acc_dtype)
        s_ref[0, 0, :] += jnp.sum(y, axis=(0, 1, 2))
        s_ref[0, 1, :] += jnp.sum(y * y, axis=(0, 1, 2))

    return kernel


def _kernel(bh: int, w: int, c: int, cout: int, acc_dtype):
    """Grid (N*D/2, H/(2*BH)). Refs: xa (2, 2BH, Wp, C) at (dtile, hblk),
    xb same at (dtile+1, hblk), ha (2, 2, Wp, C) at (dtile, hblk-halo),
    hb at (dtile+1, hblk-halo), u2 (48, C, Co); out (2, 2BH, W, Co)."""

    # A^T = [[1, 1, 1, 0], [0, 1, -1, -1]] — the inverse transform is
    # accumulated incrementally so only the four (2x2) output accumulators
    # live in VMEM, not all 16 transform-domain products.
    AT = ((1, 1, 1, 0), (0, 1, -1, -1))

    def kernel(xa, xb, ha, hb, u2, o_ref):
        def d_transform(r0, r1, r2, r3, jd):
            if jd == 0:
                return r0 - r2
            if jd == 1:
                return r1 + r2
            if jd == 2:
                return r2 - r1
            return r1 - r3

        out_acc = [[jnp.zeros((bh, w, cout), acc_dtype) for _ in range(2)]
                   for _ in range(2)]
        for jd in range(4):
            m = d_transform(xa[0], xa[1], xb[0], xb[1], jd)   # (2BH, Wp, C)
            hl = d_transform(ha[0], ha[1], hb[0], hb[1], jd)  # (2, Wp, C)
            # ---- H transform: tile h uses rows (2h, 2h+1, 2h+2, 2h+3) ----
            q = m.reshape(bh, 2, m.shape[-2], c)
            x0 = q[:, 0]                         # (BH, Wp, C)
            x1 = q[:, 1]
            nxt0 = jnp.concatenate([q[1:, 0], hl[0:1]], axis=0)
            nxt1 = jnp.concatenate([q[1:, 1], hl[1:2]], axis=0)
            vh = (x0 - nxt0, x1 + nxt0, nxt0 - x1, x1 - nxt1)
            for jh in range(4):
                v = vh[jh]                       # (BH, Wp, C)
                a = None
                for dx in range(3):
                    taps = v[:, dx:dx + w, :].reshape(bh * w, c)
                    d = jnp.dot(taps, u2[(jd * 4 + jh) * 3 + dx],
                                preferred_element_type=acc_dtype)
                    a = d if a is None else a + d
                m_jdjh = a.reshape(bh, w, cout)
                for od in range(2):
                    cd = AT[od][jd]
                    if cd == 0:
                        continue
                    for oh in range(2):
                        ch = AT[oh][jh]
                        if ch == 0:
                            continue
                        if cd * ch == 1:
                            out_acc[od][oh] = out_acc[od][oh] + m_jdjh
                        else:
                            out_acc[od][oh] = out_acc[od][oh] - m_jdjh

        out_rows = []
        for od in range(2):
            # interleave H tiles: (BH, 2, W, Co) -> (2BH, W, Co)
            y = jnp.stack([out_acc[od][0], out_acc[od][1]],
                          axis=1).reshape(2 * bh, w, cout)
            out_rows.append(y)
        o_ref[:] = jnp.stack(out_rows, axis=0).astype(o_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def _winograd_batched(x: jnp.ndarray, w: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """x (N, D, H, W, C) NDHWC, w (3,3,3,C,Cout); stride-1 SAME conv."""
    n, d, h, wd, c = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, wd, c, cout, x.dtype.itemsize)
    td = d // 2
    g_h = (h // 2) // bh
    # pad: D halo 1 per item, H halo 1, W halo 1 (W handled in-kernel by
    # shifted slices over Wp = W + 2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # fold batch into depth rows: (N*(D+2), H+2, W+2, C); a depth tile t of
    # item i spans rows i*(D+2)+2t .. +4, never crossing items
    xp = xp.reshape(n * (d + 2), h + 2, wd + 2, c)
    u2 = transform_weights_dh(w, x.dtype)

    # all index maps are in units of the ref's own block shape
    def main_map(offset):
        #  dim0 blocks of 2 rows; item i tile t -> row-pair i*(D+2)/2 + t
        return lambda p, q: (p + (p // td) + offset, q, 0, 0)

    def halo_map(offset):
        # dim1 blocks of 2 rows: halo pair index = (q+1)*bh
        return lambda p, q: (p + (p // td) + offset, (q + 1) * bh, 0, 0)

    # NOTE on dim0 index math: row-pair index for (item i, tile t) is
    # (i*(D+2) + 2t)/2 = i*(td+1) + t; with p = i*td + t this equals
    # p + i = p + p//td.
    wp = wd + 2
    kernel = _kernel(bh, wd, c, cout, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n * td, g_h),
        in_specs=[
            pl.BlockSpec((2, 2 * bh, wp, c), main_map(0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * bh, wp, c), main_map(1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, wp, c), halo_map(0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, wp, c), halo_map(1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, c, cout), lambda p, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 2 * bh, wd, cout),
                               lambda p, q: (p, q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * d, h, wd, cout), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, xp, u2)
    return out.reshape(n, d, h, wd, cout)


@partial(jax.jit, static_argnames=("interpret",))
def _winograd_batched_stats(x: jnp.ndarray, w: jnp.ndarray,
                            interpret: bool = False):
    """As _winograd_batched, plus f32 (sum, sum_sq) per (item, channel)."""
    n, d, h, wd, c = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, wd, c, cout, x.dtype.itemsize)
    td = d // 2
    g_h = (h // 2) // bh
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n * (d + 2), h + 2, wd + 2, c)
    u2 = transform_weights_dh(w, x.dtype)

    def main_map(offset):
        return lambda p, q: (p + (p // td) + offset, q, 0, 0)

    def halo_map(offset):
        return lambda p, q: (p + (p // td) + offset, (q + 1) * bh, 0, 0)

    wp = wd + 2
    kernel = _kernel_with_stats(bh, wd, c, cout, td, g_h, jnp.float32)
    out, stats = pl.pallas_call(
        kernel,
        grid=(n * td, g_h),
        in_specs=[
            pl.BlockSpec((2, 2 * bh, wp, c), main_map(0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * bh, wp, c), main_map(1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, wp, c), halo_map(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, wp, c), halo_map(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, c, cout), lambda p, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, 2 * bh, wd, cout), lambda p, q: (p, q, 0, 0),
                         memory_space=pltpu.VMEM),
            # one stats block per batch item, revisited (VMEM-resident)
            # across that item's consecutive grid steps
            pl.BlockSpec((1, 2, cout), lambda p, q: (p // td, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * d, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((n, 2, cout), jnp.float32),
        ),
        interpret=interpret,
    )(xp, xp, xp, xp, u2)
    return out.reshape(n, d, h, wd, cout), stats


@jax.custom_vjp
def winograd_conv3d_stats(x: jnp.ndarray, w: jnp.ndarray):
    """Fused conv + instance-norm-stats epilogue: returns (y, sum, sum_sq)
    with the f32 stats accumulated while the conv output block is still in
    VMEM — the norm's stats pass never re-reads y from HBM."""
    y, stats = _winograd_batched_stats(x, w)
    return y, stats[:, 0], stats[:, 1]


def _fwd_stats(x, w):
    y, s1, s2 = winograd_conv3d_stats(x, w)
    return (y, s1, s2), (x, w, y)


def _bwd_stats(residuals, g):
    x, w, y = residuals
    gy, gs1, gs2 = g
    # d/dy of (y, sum(y), sum(y^2)) contributions fold into one cotangent
    gtot = (gy.astype(jnp.float32)
            + gs1[:, None, None, None, :]
            + 2.0 * y.astype(jnp.float32) * gs2[:, None, None, None, :])
    gtot = gtot.astype(x.dtype)
    dx = _dgrad(gtot, w, x.dtype)
    from unet3d_tpu.ops.conv3d import conv3d_decomp2d

    _, pull = jax.vjp(lambda ww: conv3d_decomp2d(x, ww), w)
    dw, = pull(gtot)
    return dx.astype(x.dtype), dw.astype(w.dtype)


winograd_conv3d_stats.defvjp(_fwd_stats, _bwd_stats)


@jax.custom_vjp
def winograd_conv3d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Fused Winograd-DH conv: x (N,D,H,W,C), w (3,3,3,C,Cout), stride-1 SAME."""
    return _winograd_batched(x, w)


def _fwd(x, w):
    return winograd_conv3d(x, w), (x, w)


_MIN_WINOGRAD_CHANNELS = 96  # measured: K=N=64 runs the MXU at 25%, losing
# to decomp2d; C>=96 wins (tools/probe_winograd_tpu.py)
_MIN_WINOGRAD_VOXELS = 64 ** 3  # below this the pallas_call's fixed cost
# (input pad materialization, grid setup, broken producer/consumer fusion)
# dominates: dispatching the deep 32^3..4^3 levels measured 213 ms/step vs
# 125.5 baseline (/tmp/bisect_step.log, r3) — the op-level wins only exist
# at level-0/1 scale


def winograd_profitable(x_shape) -> bool:
    """Measured profitability gate on top of winograd_available."""
    n, d, h, w, c = x_shape
    return (c >= _MIN_WINOGRAD_CHANNELS
            and d * h * w >= _MIN_WINOGRAD_VOXELS)


def _dgrad(g, w, x_dtype):
    """dx = conv of g with spatially flipped, io-transposed weights — another
    stride-1 SAME 3-cubed conv. Routed through the same profitability rule as
    the forward: the dx conv's input channels are Cout of the primal."""
    from unet3d_tpu.ops.conv3d import conv3d_decomp2d

    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    g = g.astype(x_dtype)
    if winograd_profitable(g.shape):
        return _winograd_batched(g, w_flip)
    return conv3d_decomp2d(g, w_flip)


def _bwd(residuals, g):
    x, w = residuals
    dx = _dgrad(g, w, x.dtype)
    # dw: reuse XLA's autodiff of decomp2d — its per-tap 2D wgrad emitters
    # measured far better than a hand-written 3D correlation here
    from unet3d_tpu.ops.conv3d import conv3d_decomp2d

    _, pull = jax.vjp(lambda ww: conv3d_decomp2d(x, ww), w)
    dw, = pull(g.astype(x.dtype))
    return dx.astype(x.dtype), dw.astype(w.dtype)


winograd_conv3d.defvjp(_fwd, _bwd)
