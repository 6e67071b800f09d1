"""DevicePrefetcher: double-buffered host->device transfer (SURVEY §7 stage 5).

Ref analog: DataLoader pin_memory/prefetch_factor
(`unet3d/scripts/script_utils.py:124-129`).
"""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.data.prefetch import DevicePrefetcher, mesh_batch_sharding


class FakeLoader:
    def __init__(self, n=4, shape=(2, 1, 4, 4, 4), label_ndim=5, fail_at=None):
        self.n = n
        self.shape = shape
        self.label_ndim = label_ndim
        self.fail_at = fail_at
        self.epoch = None
        self.batch_size = shape[0]
        self.dataset = list(range(n))

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return self.n

    def __iter__(self):
        rng = np.random.RandomState(0)
        for i in range(self.n):
            if self.fail_at is not None and i == self.fail_at:
                raise RuntimeError("boom")
            label_shape = self.shape[: self.label_ndim]
            yield {"image": rng.rand(*self.shape).astype(np.float32),
                   "label": rng.rand(*label_shape).astype(np.float32),
                   "subject_id": [f"s{i}"]}


def _materialize(loader):
    return [{k: (np.asarray(v) if hasattr(v, "shape") else v)
             for k, v in b.items()} for b in loader]


def test_batches_arrive_device_resident_and_bit_identical():
    base = FakeLoader()
    expected = _materialize(base)
    got = list(DevicePrefetcher(FakeLoader()))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert isinstance(g["image"], jax.Array)
        assert isinstance(g["label"], jax.Array)
        assert g["subject_id"] == e["subject_id"]  # non-array keys untouched
        np.testing.assert_array_equal(np.asarray(g["image"]), e["image"])
        np.testing.assert_array_equal(np.asarray(g["label"]), e["label"])


def test_train_loop_bit_identical_through_prefetcher():
    """A jitted consumer sees identical numerics with and without prefetch."""
    @jax.jit
    def step(acc, image, label):
        return acc + jnp.sum(image * 2.0 + label)

    def run(loader):
        acc = jnp.zeros(())
        for batch in loader:
            acc = step(acc, jnp.asarray(batch["image"]),
                       jnp.asarray(batch["label"]))
        return float(acc)

    assert run(FakeLoader()) == run(DevicePrefetcher(FakeLoader()))


def test_proxies_len_epoch_dataset():
    base = FakeLoader(n=3)
    pf = DevicePrefetcher(base)
    assert len(pf) == 3
    pf.set_epoch(7)
    assert base.epoch == 7
    assert pf.dataset is base.dataset
    assert pf.batch_size == base.batch_size


def test_error_propagates():
    pf = DevicePrefetcher(FakeLoader(fail_at=1))
    it = iter(pf)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_consumer_break_does_not_hang():
    before = threading.active_count()
    pf = DevicePrefetcher(FakeLoader(n=50), depth=1)
    for i, _ in enumerate(pf):
        if i == 1:
            break
    deadline = time.time() + 15
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_mesh_sharding_applies_batch_spec():
    from jax.sharding import NamedSharding

    from unet3d_tpu.parallel.mesh import (batch_spec, label_spec, make_mesh)

    mesh = make_mesh({"data": 2, "space": 4})
    pf = DevicePrefetcher(FakeLoader(n=2, shape=(2, 1, 8, 4, 4)),
                          sharding=mesh_batch_sharding(mesh))
    batches = list(pf)
    for b in batches:
        assert b["image"].sharding == NamedSharding(mesh, batch_spec(mesh))
        assert b["label"].sharding == NamedSharding(mesh, label_spec(mesh, 5))


def test_mesh_sharding_rank2_labels_and_ragged_fallback():
    from jax.sharding import NamedSharding

    from unet3d_tpu.parallel.mesh import label_spec, make_mesh

    mesh = make_mesh({"data": 2})
    # rank-2 labels shard batch-only
    pf = DevicePrefetcher(FakeLoader(n=1, shape=(2, 3, 8, 4, 4), label_ndim=2),
                          sharding=mesh_batch_sharding(mesh))
    (b,) = list(pf)
    assert b["label"].sharding == NamedSharding(mesh, label_spec(mesh, 2))
    # ragged batch (3 % 2 != 0) falls back to the default device, unsharded
    pf = DevicePrefetcher(FakeLoader(n=1, shape=(3, 1, 8, 4, 4)),
                          sharding=mesh_batch_sharding(mesh))
    (b,) = list(pf)
    assert isinstance(b["image"], jax.Array)
    assert len(b["image"].devices()) == 1
