#!/usr/bin/env python
"""Round-4 op-level microbenches: stride-2 conv backward + subpixel interleave.

Timing methodology (axon tunnel): a bare jit call pays ~170 ms of tunnel
round-trip and syncing big outputs ships hundreds of MB at 35 MB/s, so every
variant is timed as a lax.scan of ITERS dependent iterations inside ONE jit
returning a scalar; the only host transfer is that scalar. Per-iteration
contamination (one elementwise scale of x + the f32 sum) is identical across
variants.

Targets from the round-4 step trace (PERF.md):
  * stride-2 conv weight grad: XLA's rhs-dilated lowering runs at 15.3 TF/s
    (5.58 ms at level 0) vs ~117 TF/s for the stride-1 wgrads.
  * subpixel transposed-conv interleave: ~7 ms fwd+bwd of pure data
    formatting at level 4 for a 0.7 ms roofline.

Run on TPU via nohup (one TPU process at a time; CLAUDE.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 8
PADS = ((1, 1), (1, 1), (1, 1))
DN = ("NDHWC", "DHWIO", "NDHWC")


def time_scalar_fn(jfn, *args, reps=3):
    """jfn(*args) -> scalar, already jitted. Returns best ms/iteration."""
    float(jfn(*args))  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def fwd_harness(conv):
    @jax.jit
    def run(x, w):
        def body(acc, i):
            y = conv(x * (1 + i * 1e-6).astype(x.dtype), w)
            return acc + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS, dtype=jnp.float32))
        return acc
    return run


def bwd_harness(conv):
    def loss(x, w):
        def body(acc, i):
            y = conv(x * (1 + i * 1e-6).astype(x.dtype), w)
            return acc + jnp.sum(jnp.square(y.astype(jnp.float32))), None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS, dtype=jnp.float32))
        return acc

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def run(x, w):
        gx, gw = g(x, w)
        return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))
    return run


# ---------------------------------------------------------------- s2 conv

def conv_xla(x, w):
    return lax.conv_general_dilated(x, w, (2, 2, 2), PADS,
                                    dimension_numbers=DN,
                                    preferred_element_type=x.dtype)


def _phase_sub(xp, do, ho, wo, pd, ph, pw):
    sub = xp[:, pd::2, ph::2, pw::2, :]
    return sub[:, :do + (pd == 0), :ho + (ph == 0), :wo + (pw == 0), :]


def s2_wgrad_phase(x, g, k=(3, 3, 3)):
    """Weight grad of the SAME k3s2 conv via parity-phase decomposition:
    tap k lives on parity phase (k mod 2) of pad(x, 1) at offset k//2, so each
    phase's taps form a stride-1 VALID wgrad-conv (no dilation)."""
    do, ho, wo, co = g.shape[1], g.shape[2], g.shape[3], g.shape[4]
    ci = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dw = jnp.zeros(k + (ci, co), jnp.float32)
    for pd in (0, 1):
        for ph in (0, 1):
            for pw in (0, 1):
                sub = _phase_sub(xp, do, ho, wo, pd, ph, pw)
                part = lax.conv_general_dilated(
                    sub, g, (1, 1, 1), "VALID",
                    dimension_numbers=("CDHWN", "IDHWO", "DHWNC"),
                    preferred_element_type=jnp.float32)
                dw = dw.at[pd::2, ph::2, pw::2].set(part.astype(jnp.float32))
    return dw


@jax.custom_vjp
def conv_phasew(x, w):
    return conv_xla(x, w)


def _phasew_fwd(x, w):
    return conv_xla(x, w), (x, w)


def _phasew_bwd(res, g):
    x, w = res
    dx = jax.vjp(lambda xx: conv_xla(xx, w), x)[1](g)[0]
    dw = s2_wgrad_phase(x, g).astype(w.dtype)
    return dx, dw


conv_phasew.defvjp(_phasew_fwd, _phasew_bwd)


def conv_phase(x, w):
    """Full phase-decomposed forward: 8 stride-1 VALID convs, summed."""
    n, D, H, W, ci = x.shape
    do, ho, wo = D // 2, H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for pd in (0, 1):
        for ph in (0, 1):
            for pw in (0, 1):
                sub = _phase_sub(xp, do, ho, wo, pd, ph, pw)
                y = lax.conv_general_dilated(
                    sub, w[pd::2, ph::2, pw::2], (1, 1, 1), "VALID",
                    dimension_numbers=DN, preferred_element_type=x.dtype)
                out = y if out is None else out + y
    return out


def bench_s2(name, D, ci, co, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, D, D, D, ci), dtype)
    w = jnp.asarray(rng.rand(3, 3, 3, ci, co) * 0.01, dtype)
    flops = 2 * 27 * ci * co * (D // 2) ** 3

    ref = None
    for label, fn in [("xla", conv_xla), ("phasew", conv_phasew),
                      ("phase", conv_phase)]:
        y = jax.jit(fn)(x, w)
        if ref is None:
            ref = np.asarray(y[0, D // 4], np.float32)
        else:
            got = np.asarray(y[0, D // 4], np.float32)
            err = np.max(np.abs(got - ref))
            assert err <= 0.02 * np.max(np.abs(ref)) + 1e-5, (label, err)
        t_f = time_scalar_fn(fwd_harness(fn), x, w)
        t_b = time_scalar_fn(bwd_harness(fn), x, w)
        print(f"{name} {label:7s} fwd {t_f:6.2f} ms ({flops/t_f/1e9:6.1f} TF/s)"
              f"  fwd+bwd {t_b:6.2f} ms ({3*flops/t_b/1e9:6.1f} TF/s)",
              flush=True)

    # gradient cross-check in f32 at a small shape-compatible slice
    xs = jnp.asarray(rng.rand(1, 16, 16, 16, ci), jnp.float32)
    ws = jnp.asarray(rng.rand(3, 3, 3, ci, co) * 0.01, jnp.float32)

    def gr(fn):
        return jax.jit(jax.grad(
            lambda xx, ww: jnp.sum(jnp.square(fn(xx, ww))), argnums=(0, 1)))

    gx0, gw0 = gr(conv_xla)(xs, ws)
    for label, fn in [("phasew", conv_phasew), ("phase", conv_phase)]:
        gx1, gw1 = gr(fn)(xs, ws)
        ew = float(jnp.max(jnp.abs(gw0 - gw1)) / jnp.max(jnp.abs(gw0)))
        ex = float(jnp.max(jnp.abs(gx0 - gx1)) / jnp.max(jnp.abs(gx0)))
        print(f"{name} {label} grad relerr: dw {ew:.2e} dx {ex:.2e}", flush=True)


# ------------------------------------------------- subpixel interleave (k=2)

def subpix_current(x, wm):
    """ops current form: einsum -> 8D reshape -> transpose -> reshape."""
    n, d, h, w, c = x.shape
    co = wm.shape[1] // 8
    y = jnp.einsum("ndhwc,ck->ndhwk", x, wm)
    y = y.reshape(n, d, h, w, 2, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(n, 2 * d, 2 * h, 2 * w, co)


def subpix_merged(x, wm):
    """(kw, co) pre-merged into one 128-lane block: the W-interleave becomes a
    free bitcast and the transpose only permutes outer (d,kd)/(h,kh) dims."""
    n, d, h, w, c = x.shape
    co = wm.shape[1] // 8
    y = jnp.einsum("ndhwc,ck->ndhwk", x, wm)
    y = y.reshape(n, d, h, w, 2, 2, 2 * co)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
    return y.reshape(n, 2 * d, 2 * h, 2 * w, co)


def subpix_dots8(x, wm):
    """8 separate (c, co) dots, interleaved via 2 nested stacks."""
    n, d, h, w, c = x.shape
    co = wm.shape[1] // 8
    wt = wm.reshape(c, 2, 2, 2, co)
    rows = []
    for a in range(2):
        cols = []
        for b in range(2):
            # merge (kw, co) minor: einsum to (n,d,h,w,2co) is bitcast-free
            wv = wt[:, a, b].reshape(c, 2 * co)
            cols.append(jnp.einsum("ndhwc,ck->ndhwk", x, wv))
        # (h, kh) interleave: stack on new axis after h then merge
        rows.append(jnp.stack(cols, axis=3).reshape(n, d, 2 * h, 2 * w * co))
    y = jnp.stack(rows, axis=2).reshape(n, 2 * d, 2 * h, 2 * w, co)
    return y


def bench_subpix(name, D, ci, co, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, D, D, D, ci), dtype)
    wm = jnp.asarray(rng.rand(ci, 8 * co) * 0.05, dtype)
    flops = 2 * ci * 8 * co * D ** 3

    ref = None
    for label, fn in [("current", subpix_current), ("merged", subpix_merged),
                      ("dots8", subpix_dots8)]:
        y = jax.jit(fn)(x, wm)
        got = np.asarray(y[0, D // 2], np.float32)
        if ref is None:
            ref = got
        else:
            assert np.max(np.abs(got - ref)) <= 1e-2 * np.max(np.abs(ref)) + 1e-6, label
        t_f = time_scalar_fn(fwd_harness(fn), x, wm)
        t_b = time_scalar_fn(bwd_harness(fn), x, wm)
        print(f"{name} {label:8s} fwd {t_f:6.2f} ms ({flops/t_f/1e9:5.1f} TF/s)"
              f"  fwd+bwd {t_b:6.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "s2"):
        bench_s2("L0 128^3 64->96 ", 128, 64, 96)
        bench_s2("L1  64^3 96->128", 64, 96, 128)
    if which in ("all", "subpix"):
        bench_subpix("U4 64^3 96->8*64", 64, 96, 64)
        bench_subpix("U3 32^3 128->8*96", 32, 128, 96)
