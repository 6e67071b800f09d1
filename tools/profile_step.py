#!/usr/bin/env python
"""Profile the BraTS DynUNet train step on TPU and dump a per-op breakdown.

Writes a jax.profiler trace, then parses the Chrome-JSON trace to aggregate
device time per HLO op (and per category), printing the top offenders. Run
via nohup (one TPU process at a time; see CLAUDE.md).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/step_trace_r2"


def run_step(trace: bool = True, n_warm: int = 2, n_prof: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

    size = int(os.environ.get("PROF_SIZE", "128"))
    batch = int(os.environ.get("PROF_BATCH", "1"))
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    model = create_model(
        "DynUNet", in_channels=4, out_channels=3, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    variables = init_params(model, (size, size, size, 4))
    tx = build_optimizer("Adam", lr=1e-3)
    criterion = DiceLoss(sigmoid=True, include_background=True)
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, amp=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 4, size, size, size), jnp.float32)
    labels = jnp.asarray((rng.rand(batch, 3, size, size, size) > 0.5).astype(np.float32))

    for _ in range(n_warm):
        state, loss = step(state, images, labels)
    print("warm loss", float(loss), flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step(state, images, labels)
    float(loss)
    dt = (time.perf_counter() - t0) / 5
    print(f"steady: {dt * 1e3:.1f} ms/step  "
          f"({batch / dt:.2f} patches/sec, batch={batch})", flush=True)

    if trace:
        import jax.profiler
        jax.profiler.start_trace(TRACE_DIR)
        for _ in range(n_prof):
            state, loss = step(state, images, labels)
        float(loss)
        jax.profiler.stop_trace()
        print("trace written", flush=True)


def categorize(name: str) -> str:
    n = name.lower()
    if ("convolution" in n or "conv" in n) and "fusion" not in n:
        return "conv"
    if n.startswith("copy") or "transpose" in n or "reshape" in n:
        return "copy/transpose"
    if "fusion" in n:
        return "fusion"
    if "reduce" in n:
        return "reduce"
    if "dot" in n:
        return "dot"
    return "other"


def parse_trace(n_prof: int = 3):
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", TRACE_DIR)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device op events live on TPU pid tracks; aggregate by name
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3 / n_prof  # us -> ms, per step
        per_op[name] += dur
        per_cat[categorize(name)] += dur
    total = sum(per_op.values())
    print(f"\ntotal device time: {total:.1f} ms/step over {len(per_op)} distinct ops")
    print("\n== by category ==")
    for cat, ms in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:16s} {ms:8.2f} ms  ({100 * ms / max(total, 1e-9):.0f}%)")
    print("\n== top 40 ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:8.2f} ms  {name[:140]}")


if __name__ == "__main__":
    if "--time-only" in sys.argv:
        run_step(trace=False)
    elif "--parse-only" in sys.argv:
        parse_trace()
    else:
        run_step()
        parse_trace()
