"""Metric tests (Dice parity measurement utilities)."""
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.train.meters import AverageMeter, device_memory_stats, human_readable_size
from unet3d_tpu.train.metrics import dice_score, mean_dice


def test_dice_perfect():
    t = jnp.asarray((np.random.RandomState(0).rand(4, 4, 4, 2) > 0.5).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dice_score(t, t)), 1.0, atol=1e-4)


def test_dice_disjoint():
    p = np.zeros((4, 4, 4, 1), np.float32); p[:2] = 1
    t = np.zeros((4, 4, 4, 1), np.float32); t[2:] = 1
    assert float(mean_dice(jnp.asarray(p), jnp.asarray(t))) < 1e-3


def test_dice_half_overlap():
    p = np.zeros((4, 4, 4, 1), np.float32); p[:2] = 1    # 32 voxels
    t = np.zeros((4, 4, 4, 1), np.float32); t[1:3] = 1   # 32 voxels, 16 shared
    np.testing.assert_allclose(float(mean_dice(jnp.asarray(p), jnp.asarray(t))),
                               0.5, atol=1e-3)


def test_dice_soft_mode():
    p = jnp.full((2, 2, 2, 1), 0.5)
    t = jnp.ones((2, 2, 2, 1))
    soft = float(mean_dice(p, t, threshold=None))
    np.testing.assert_allclose(soft, 2 * 4 / (4 + 8), atol=1e-3)


def test_average_meter():
    m = AverageMeter("x", ":.2f")
    m.update(1.0, n=2)
    m.update(3.0, n=2)
    assert m.avg == 2.0
    assert "x" in str(m)


def test_human_readable_size():
    assert human_readable_size(1024) == "1.0KiB"
    assert human_readable_size(3 * 1024 ** 3) == "3.0GiB"


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU backends
