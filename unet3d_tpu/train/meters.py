"""Progress meters — wall-clock tracing of the training loop.

Parity: `unet3d/train/training_utils.py:156-227` (AverageMeter / ProgressMeter /
human_readable_size), the reference's only profiling subsystem. An optional
jax.profiler trace hook replaces `print_gpu_memory`.
"""
from __future__ import annotations

import contextlib


class AverageMeter:
    """Computes and stores the average and current value (`training_utils.py:156-178`)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    """Prints '[batch/total] meter meter ...' lines (`training_utils.py:181-195`)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(meter) for meter in self.meters]
        print("\t".join(entries), flush=True)

    @staticmethod
    def _get_batch_fmtstr(num_batches: int) -> str:
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"


def human_readable_size(size, decimal_places: int = 1) -> str:
    """Parity: `training_utils.py:222-227`."""
    for unit in ["B", "KiB", "MiB", "GiB", "TiB"]:
        if size < 1024.0:
            break
        size /= 1024.0
    return f"{size:.{decimal_places}f}{unit}"


def device_memory_stats() -> dict:
    """Per-device HBM usage, human-readable — the TPU analog of
    `print_gpu_memory` (`training_utils.py:48-57`). Empty dict when the backend
    doesn't expose stats."""
    import jax
    stats = {}
    for device in jax.local_devices():
        s = getattr(device, "memory_stats", lambda: None)()
        if s:
            stats[str(device)] = {
                "bytes_in_use": human_readable_size(s.get("bytes_in_use", 0)),
                "bytes_limit": human_readable_size(s.get("bytes_limit", 0)),
            }
    return stats


def print_device_memory() -> None:
    for device, s in device_memory_stats().items():
        print(f"{device}: {s['bytes_in_use']} / {s['bytes_limit']}", flush=True)


@contextlib.contextmanager
def profiler_trace(log_dir: str = None):
    """Optional jax.profiler trace around a block (the TPU answer to
    `print_gpu_memory`, `training_utils.py:48-57`)."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
