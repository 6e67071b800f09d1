"""Multi-host launch wiring tests (mocked jax.distributed.initialize)."""
import pytest

import unet3d_tpu.parallel.distributed as dist


@pytest.fixture(autouse=True)
def _reset_initialized(monkeypatch):
    monkeypatch.setattr(dist, "_INITIALIZED", False)


def _mock_initialize(monkeypatch):
    calls = []

    def fake(**kwargs):
        calls.append(kwargs)

    monkeypatch.setattr(dist.jax.distributed, "initialize", fake)
    return calls


def test_single_host_is_noop(monkeypatch):
    calls = _mock_initialize(monkeypatch)
    assert dist.maybe_initialize_distributed(None) is False
    assert dist.maybe_initialize_distributed({}) is False
    assert dist.maybe_initialize_distributed({"n_gpus": 8, "n_workers": 4}) is False
    assert calls == []


def test_full_spec_initializes(monkeypatch):
    calls = _mock_initialize(monkeypatch)
    cfg = {"coordinator_address": "10.0.0.1:8476", "n_nodes": 4, "node_rank": 2}
    assert dist.maybe_initialize_distributed(cfg) is True
    assert calls == [{"coordinator_address": "10.0.0.1:8476",
                      "num_processes": 4, "process_id": 2}]


def test_address_only_lets_runtime_infer(monkeypatch):
    calls = _mock_initialize(monkeypatch)
    assert dist.maybe_initialize_distributed(
        {"coordinator_address": "host0:1234"}) is True
    assert calls == [{"coordinator_address": "host0:1234"}]


def test_second_call_is_noop(monkeypatch):
    calls = _mock_initialize(monkeypatch)
    cfg = {"coordinator_address": "h:1", "n_nodes": 2, "node_rank": 0}
    assert dist.maybe_initialize_distributed(cfg) is True
    assert dist.maybe_initialize_distributed(cfg) is True
    assert len(calls) == 1


def test_n_nodes_without_address_raises(monkeypatch):
    _mock_initialize(monkeypatch)
    with pytest.raises(ValueError, match="coordinator_address"):
        dist.maybe_initialize_distributed({"n_nodes": 4})


def test_primary_host_single_process():
    assert dist.process_index() == 0
    assert dist.is_primary_host()
