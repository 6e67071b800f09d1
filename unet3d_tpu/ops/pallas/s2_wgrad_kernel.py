"""Pallas TPU kernel: weight gradient of the SAME k3s2 convolution (NDHWC).

XLA lowers the strided-conv weight gradient as an rhs-dilated convolution that
runs at ~15 TFLOPs on v5e (5.6 ms for the BraTS level-0 128^3 64->96 shape —
the worst op in the round-4 train-step trace, PERF.md). This kernel computes

    dw[kd,kh,kw,ci,co] = sum_{n,od,oh,ow} xp[n, 2od+kd, 2oh+kh, 2ow+kw, ci]
                                          * g[n, od, oh, ow, co]

as plain 2D MXU dots by exploiting the stride-2 parity structure:

* W parity: the padded volume is viewed as scanlines of ``(wp2, 2*C)`` — the
  merged (w-parity, ci) lane block (a pure row-major reshape when ``2*C`` is
  a multiple of 128 lanes) makes the two even/odd W taps LANE HALVES of the
  same sublane:
    - kw in {0, 1}: lanes (pw=kw) at sublane ow       (w-shift 0)
    - kw = 2:       lanes (pw=0)  at sublane ow+1     (w-shift 1)
* H parity is deinterleaved HOST-SIDE: the stack orders each plane's
  scanlines as [even fine-h rows | odd fine-h rows], so a tap's operand is a
  CONTIGUOUS run of ``hq`` scanlines and its merge to a 2D dot operand
  ``(hq*wp2, 2C)`` is layout-free. The deinterleave fuses into the pad copy
  XLA performs anyway.
* D taps: planes 2od+kd stay contiguous in dim0, so each grid step fetches
  one 3-plane window with a single double-buffered async copy.
* **The x operand is never sliced or copied in VMEM.** The SMALL cotangent g
  is padded into four (h-shift, w-shift)-aligned variants once per grid step;
  each (kd, kh, w-shift) contribution is one dot ``(hq*wp2, 2C)^T @
  (hq*wp2, Cout)`` (K ≈ 4.7k). The x columns beyond W+2 are zero-pad and the
  g variants are zero there, so the extra K rows contribute exact zeros. f32
  accumulation into a revisited (9, 2, 2C, Cout) output block; the caller
  scatters the 27 real taps out of the 36 computed lane-tap slots.

Empirical constraints honored (CLAUDE.md): manual DMA on ANY arrays is 3D
with dim0-only windows, 8-aligned dim-1 window sizes and 128-multiple minor
dim; multi-dim dot contractions are NOT supported (Mosaic: "lhs contracting
dims must be of size 1") — hence the host-side deinterleave; in-kernel
jnp.pad is legal; revisited accumulated output blocks work.

Measured (v5e, L0 shape x(1,128^3,64) g(1,64^3,96) bf16): v1 (18 sliced
x-copies per step) 7.95 ms/call; this copy-free form is the round-4
candidate (see PERF.md for the in-context verdict). Opt-in:
UNET3D_TPU_S2GRAD=pallas (ops/conv3d.py).
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

_LANES = 128


def s2_wgrad_available(x_shape: Tuple[int, ...], g_shape: Tuple[int, ...],
                       k: Tuple[int, ...] = (3, 3, 3)) -> bool:
    """Kernel applicability: k3s2 SAME on even spatial dims with (2*C) a
    multiple of 128 lanes (C = 64, 128, ...)."""
    if not _PALLAS_OK:
        return False
    if jax.default_backend() != "tpu":
        return False
    if tuple(k) != (3, 3, 3):
        return False
    n, d, h, w, c = x_shape
    if (2 * c) % _LANES != 0:
        return False
    if d % 2 or h % 2 or w % 2:
        return False
    if g_shape[1:4] != (d // 2, h // 2, w // 2):
        return False
    return True


def _wgrad_kernel(do: int, ho: int, wo: int, c2: int, co: int, hq: int,
                  wp2: int):
    """Grid (N, do). The scanline stack orders rows as
    ((n*(2do+2) + d_fine)*2 + h_parity)*hq + s; each step DMAs the 6*hq rows
    of planes 2od..2od+2. ``wp2`` is the 8-aligned sublane count per scanline
    (>= wo+1; the DMA window spans full scanlines, and Mosaic requires dim-1
    windows aligned to the (8,128) tiling)."""
    n_rows = 3 * 2 * hq  # one step's window: three planes x two h-parities

    def _base(n_i, od):
        return (n_i * (2 * do + 2) + 2 * od) * 2 * hq

    # tap kh -> (h parity, h shift): fine_h = 2*oh + kh = 2*s + p
    _KH = ((0, 0), (1, 0), (0, 1))

    def kernel(x_hbm, g_ref, o_ref, scratch, sems):
        n_i = pl.program_id(0)
        od = pl.program_id(1)
        step = n_i * pl.num_programs(1) + od
        n_steps = pl.num_programs(0) * pl.num_programs(1)
        slot = step % 2

        def _dma(s, sl, start):
            ni, odi = s // pl.num_programs(1), s % pl.num_programs(1)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(_base(ni, odi), n_rows)],
                scratch.at[pl.ds(sl * n_rows, n_rows)],
                sems.at[sl])
            if start:
                cp.start()
            else:
                cp.wait()

        @pl.when(step == 0)
        def _():
            _dma(step, 0, True)

        @pl.when(step + 1 < n_steps)
        def _():
            _dma(step + 1, (step + 1) % 2, True)

        _dma(step, slot, False)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # Four zero-padded cotangent variants (hq*wp2, co), one per
        # (h-shift, w-shift) alignment — built once per step from the small
        # g block; the big x operand is never copied or sliced in VMEM.
        g_t = g_ref[0]  # (ho, wo, co)
        gm = {}
        for sh in range(2):
            for sw in range(2):
                gm[(sh, sw)] = jnp.pad(
                    g_t, ((sh, hq - ho - sh), (sw, wp2 - wo - sw),
                          (0, 0))).reshape(hq * wp2, co)

        for kd in range(3):
            base = slot * n_rows + kd * 2 * hq
            # contiguous parity blocks -> layout-free 2D merge
            xm = [scratch[pl.ds(base + p * hq, hq)].reshape(hq * wp2, c2)
                  for p in range(2)]
            for kh, (p, sh) in enumerate(_KH):
                i = kd * 3 + kh
                for sw in range(2):
                    part = jax.lax.dot_general(
                        xm[p], gm[(sh, sw)], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o_ref[i, sw] += part

    return kernel


@partial(jax.jit, static_argnames=())
def s2_wgrad_pallas(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dw (3,3,3,C,Cout) f32 for the SAME k3s2 conv: x (N,D,H,W,C) NDHWC,
    g = output cotangent (N,D/2,H/2,W/2,Cout)."""
    n, d, h, w, c = x.shape
    co = g.shape[-1]
    do, ho, wo = d // 2, h // 2, w // 2
    c2 = 2 * c
    hq = ho + 1  # h-parity pair count per plane ((h+2)/2)
    # sublane count per scanline must be 8-aligned for the DMA window; pad the
    # W axis high side with zeros (the g variants are zero there, so the
    # extra columns contribute exact zeros to the dots)
    wp2 = ((wo + 1 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 2 * wp2 - w - 1), (0, 0)))
    # scanline stack with h-parity deinterleaved per plane:
    # (N*(D+2)*2*hq, wp2, 2C); the transpose fuses into the pad copy.
    x5 = xp.reshape(n * (d + 2), hq, 2, wp2, c2)
    x3 = jnp.transpose(x5, (0, 2, 1, 3, 4)).reshape(-1, wp2, c2)
    g4 = g.reshape(n * do, ho, wo, co)

    parts = pl.pallas_call(
        _wgrad_kernel(do, ho, wo, c2, co, hq, wp2),
        grid=(n, do),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, ho, wo, co),
                         lambda n_i, od: (n_i * do + od, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, 2, c2, co), lambda n_i, od: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, 2, c2, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * 3 * 2 * hq, wp2, c2), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x3, g4)

    # parts[(kd*3+kh), sw, (pw, ci), co]:
    #   kw=0 -> sw 0, pw 0; kw=1 -> sw 0, pw 1; kw=2 -> sw 1, pw 0
    p = parts.reshape(3, 3, 2, 2, c, co)
    dw = jnp.stack([p[:, :, 0, 0], p[:, :, 0, 1], p[:, :, 1, 0]], axis=2)
    return dw
