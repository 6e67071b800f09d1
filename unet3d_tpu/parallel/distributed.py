"""Multi-host (DCN) launch wiring: ``jax.distributed.initialize`` from the
machine config.

SURVEY.md §2.2 names the TPU-native multi-node story: "multi-host JAX runtime
over DCN; same pjit program". The pjit programs in `parallel/mesh.py` already
scale to any global device count — what a real pod launch needs is runtime
initialization on every host before the first jax call. The reference has no
multi-node path at all (single-process DataParallel,
`unet3d/models/build.py:18-20`), so the config surface here is additive:

machine-config keys (all optional; absent -> single-host no-op):

    {
      "coordinator_address": "10.0.0.1:8476",   # host 0 of the pod
      "n_nodes": 4,                              # number of processes
      "node_rank": 2                             # this process (omit to let
    }                                            # the TPU runtime infer it)

Launch recipe: run the SAME train/predict command on every host with the same
coordinator_address and per-host node_rank (doc/MultiHost.md). On a Cloud TPU
pod slice, n_nodes/node_rank may be omitted entirely — jax infers both from
the TPU metadata; coordinator_address alone triggers initialization.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax

_INITIALIZED = False


def maybe_initialize_distributed(system_config: Optional[dict]) -> bool:
    """Initialize the multi-host runtime if the machine config asks for it.

    Returns True when ``jax.distributed.initialize`` was called. Safe to call
    more than once (second call is a no-op) and a no-op for single-host
    configs, so both CLIs call it unconditionally right after loading the
    machine config.
    """
    global _INITIALIZED
    if not system_config:
        return False
    address = system_config.get("coordinator_address")
    n_nodes = system_config.get("n_nodes")
    node_rank = system_config.get("node_rank")
    if address is None and not n_nodes:
        return False
    if _INITIALIZED:
        return True
    if address is None:
        raise ValueError(
            "machine config sets n_nodes but no coordinator_address; "
            "multi-host launch needs the address of node 0 (host:port)")
    kwargs = {"coordinator_address": str(address)}
    if n_nodes is not None:
        kwargs["num_processes"] = int(n_nodes)
    if node_rank is not None:
        kwargs["process_id"] = int(node_rank)
    logging.info("Initializing multi-host JAX runtime: %s", kwargs)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def process_index() -> int:
    """This host's rank (0 on single host) — used to restrict file writes
    (checkpoints, CSV logs) to one writer per pod."""
    return jax.process_index()


def is_primary_host() -> bool:
    return process_index() == 0
