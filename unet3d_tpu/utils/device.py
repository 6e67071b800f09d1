"""Device-placement policy for the host-side data pipeline.

Per-sample preprocessing math is jitted JAX; *where* it runs is a policy
decision. On TPU VMs with fast PCIe, running it on the accelerator overlaps
with training. In tunneled/low-bandwidth environments (host<->device measured
at ~35 MB/s here), shipping full-resolution volumes to the chip per sample
dominates everything — so the pipeline defaults to the CPU backend and only
the final training batch crosses to the device.

Override with UNET3D_TPU_DATA_DEVICE=accelerator to run preprocessing on the
training device.
"""
from __future__ import annotations

import contextlib
import os


def data_device():
    """The device the per-sample data pipeline should compute on (None = default)."""
    import jax

    choice = os.environ.get("UNET3D_TPU_DATA_DEVICE", "cpu")
    if choice == "accelerator":
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


@contextlib.contextmanager
def data_device_scope():
    """Context manager placing jnp work on the data device."""
    import jax

    device = data_device()
    if device is None:
        yield
        return
    with jax.default_device(device):
        yield
