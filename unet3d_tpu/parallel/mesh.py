"""Device-mesh parallelism: data-parallel + spatial-parallel sharded train steps.

This module IS the framework's distributed backend — the TPU-native replacement
for the reference's entire parallelism story, which is single-process
``torch.nn.DataParallel`` (`unet3d/models/build.py:18-20`) with no NCCL/MPI
anywhere (SURVEY.md §2.2). Instead of replica scatter/gather, we lay out a
``jax.sharding.Mesh`` and annotate shardings; XLA SPMD inserts the collectives
(gradient all-reduce over ICI for data-parallel; halo exchanges /
collective-permutes for spatially partitioned convolutions).

Axes:
* ``data``  — batch dimension (DP). Gradient all-reduce rides ICI.
* ``space`` — the D spatial axis (SP): the volumetric analog of sequence/context
  parallelism. Convs on a space-sharded volume get halo exchanges from SPMD,
  letting whole volumes larger than one chip's HBM train across chips.

Model/tensor parallelism for conv channels is intentionally not wired by
default — for 3D CNNs at BraTS scale DP+SP covers the memory and throughput
envelope; the mesh builder accepts a ``model`` axis for experiments.
"""
from __future__ import annotations

import re
import threading
from contextlib import contextmanager
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unet3d_tpu.train.step import (TrainState, tpu_compiler_options,
                                   train_step_body)

_ACTIVE = threading.local()  # mesh in scope while tracing a sharded step


@contextmanager
def activation_sharding(mesh: Mesh):
    """Make ``constrain_activation`` active while tracing a sharded program.

    The sharded step/forward builders wrap their bodies in this context so
    models that call :func:`constrain_activation` at level boundaries get
    explicit activation shardings; outside the context (single-device jit)
    the calls are no-ops.
    """
    prev = getattr(_ACTIVE, "mesh", None)
    _ACTIVE.mesh = mesh
    try:
        yield
    finally:
        _ACTIVE.mesh = prev


def activation_spec(mesh: Mesh, shape) -> P:
    """(data, space) spec for an NDHWC activation, degrading to replicated on
    any axis the shape can't shard: deep U-Net levels where D has shrunk below
    the ``space`` axis would otherwise make SPMD invent a reshard — the
    involuntary-full-rematerialization warning in the r3 dryrun
    (MULTICHIP_r03) came from a bf16[1,1,1,1,C] bottleneck gradient being
    resharded from data-sharded to space-sharded layout in the backward."""
    axes = mesh.shape
    data = ("data" if "data" in axes and axes["data"] > 1
            and shape[0] % axes["data"] == 0 else None)
    space = ("space" if "space" in axes and axes["space"] > 1
             and shape[1] % axes["space"] == 0 else None)
    return P(data, space, None, None, None)


def constrain_activation(x):
    """Pin an NDHWC activation (and, through the transpose rule, its cotangent)
    to the consistent (data, space) layout. No-op outside
    :func:`activation_sharding` scope or for non-5D values."""
    mesh = getattr(_ACTIVE, "mesh", None)
    if mesh is None or getattr(x, "ndim", 0) != 5:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, activation_spec(mesh, x.shape)))


_MESH_AXES = ("data", "space", "model")


def parse_mesh_spec(spec) -> Dict[str, int]:
    """Normalize a user-facing mesh spec into ``{axis: size}``.

    Accepted forms (the machine-config ``"mesh"`` key and the ``--mesh`` CLI
    flag, doc/Configuration.md):

    * dict:   ``{"data": 2, "space": 4}``
    * string: ``"data2,space4"`` / ``"data=2,space=4"`` / ``"data:2"``

    Axes must come from ``data`` (batch DP), ``space`` (D-axis spatial
    partitioning) or ``model`` (experimental channel sharding); sizes must be
    positive ints. Axis order is preserved — it defines the device-grid
    layout, so put the fastest-varying (ICI-nearest) axis last.
    """
    if isinstance(spec, str):
        parsed = {}
        for part in spec.replace(";", ",").split(","):
            part = part.strip()
            if not part:
                continue
            m = re.fullmatch(r"([a-zA-Z_]+)\s*[:=]?\s*(\d+)", part)
            if not m:
                raise ValueError(
                    f"Unparseable mesh axis {part!r} in mesh spec {spec!r}; "
                    "expected e.g. 'data2,space4'")
            parsed[m.group(1)] = int(m.group(2))
        spec = parsed
    if not isinstance(spec, dict) or not spec:
        raise ValueError(f"Mesh spec must be a non-empty dict or string, got {spec!r}")
    out = {}
    for axis, size in spec.items():
        if axis not in _MESH_AXES:
            raise ValueError(f"Unknown mesh axis {axis!r}; supported: {_MESH_AXES}")
        size = int(size)
        if size < 1:
            raise ValueError(f"Mesh axis {axis!r} needs a positive size, got {size}")
        out[str(axis)] = size
    return out


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over the available devices.

    Default: all devices on the ``data`` axis (pure DP). Pass e.g.
    ``{"data": 2, "space": 4}`` for a DP x SP grid.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"Mesh needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, names)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for a (B, C, D, H, W) host batch on this mesh."""
    data = "data" if "data" in mesh.axis_names else None
    space = "space" if "space" in mesh.axis_names else None
    return P(data, None, space, None, None)


def label_spec(mesh: Mesh, ndim: int):
    """Batch sharding for labels of any rank: rank-5 volumes shard like
    images; lower ranks (class indices/targets) shard the batch axis only.
    A fixed rank-5 spec would make jit reject rank-2/4 labels outright."""
    if ndim == 5:
        return batch_spec(mesh)
    data = "data" if "data" in mesh.axis_names else None
    return P(*((data,) + (None,) * (ndim - 1)))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the mesh's batch sharding."""
    sharding = NamedSharding(mesh, batch_spec(mesh))
    return jax.device_put(batch, sharding)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate parameters/optimizer state across the mesh (DP layout)."""
    replicated = NamedSharding(mesh, P())
    return jax.device_put(state, replicated)


def make_sharded_train_step(model, criterion: Callable, tx, mesh: Mesh,
                            amp: bool = False, grad_accum: int = 1) -> Callable:
    """Jit the train step with mesh shardings.

    Parameters are replicated; the batch is sharded over (data, space). Under
    pjit semantics the mean-reduced loss makes XLA emit the gradient all-reduce
    (`psum` over ICI) — no hand-written communication, matching the
    scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
    collectives.
    """
    jitted = {}  # keyed by label rank: the label sharding depends on it

    def step(state, images, labels):
        ndim = labels.ndim
        if ndim not in jitted:
            jitted[ndim] = _sharded_train_jit(model, criterion, tx, mesh,
                                              amp=amp, label_ndim=ndim,
                                              grad_accum=grad_accum)
        return jitted[ndim](state, images, labels)

    return step


def _sharded_train_jit(model, criterion: Callable, tx, mesh: Mesh,
                       amp: bool, label_ndim: int, grad_accum: int = 1):
    """The jitted sharded train step for one label rank (see
    make_sharded_train_step); activation constraints are live during trace."""
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, batch_spec(mesh))
    y_sharded = NamedSharding(mesh, label_spec(mesh, label_ndim))
    body = train_step_body(model, criterion, tx, amp=amp,
                           grad_accum=grad_accum)

    def traced_body(state, images, labels):
        with activation_sharding(mesh):
            return body(state, images, labels)

    return jax.jit(traced_body,
                   in_shardings=(replicated, data_sharded, y_sharded),
                   out_shardings=(replicated, replicated),
                   donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())


def lower_sharded_train_step(model, criterion: Callable, tx, mesh: Mesh,
                             state, images, labels, amp: bool = False,
                             grad_accum: int = 1):
    """Lower (trace + SPMD-partition, no execution) the sharded train step.

    ``images``/``labels`` may be concrete arrays or ``jax.ShapeDtypeStruct``s
    — the latter costs no memory, which is how the train CLI's ``--dry_run``
    compiles configs too large to execute on the validating host (e.g. the
    SPPIN 192^3 workload on a CPU simulation). Returns a ``Lowered``; call
    ``.compile()`` for the executable / ``memory_analysis()``."""
    jitted = _sharded_train_jit(model, criterion, tx, mesh, amp=amp,
                                label_ndim=labels.ndim,
                                grad_accum=grad_accum)
    return jitted.lower(state, images, labels)


def sharded_train_step_hlo(model, criterion: Callable, tx, mesh: Mesh,
                           state, images, labels, amp: bool = False) -> str:
    """Post-SPMD compiled HLO of the sharded train step — the collective
    inventory. Used by tests to assert the communication pattern is the
    intended one (gradient all-reduce + halo collective-permutes, no
    full-activation all-gathers); see PERF.md "Mesh collective inventory"."""
    return lower_sharded_train_step(model, criterion, tx, mesh, state,
                                    images, labels,
                                    amp=amp).compile().as_text()


def make_sharded_eval_step(model, criterion: Callable, mesh: Mesh,
                           inferer: Optional[Callable] = None,
                           amp: bool = False) -> Callable:
    """Jit the validation step with mesh shardings (no grad).

    Mirrors `train.step.make_eval_step` (including its ``amp`` bfloat16
    forward) but shards the batch over the mesh's (data, space) axes, so
    validation with ``n_gpus > 1`` uses every device the way training does.
    """
    import jax.numpy as jnp

    from unet3d_tpu.train.step import amp_cast, compute_criterion, to_ndhwc

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, batch_spec(mesh))

    def forward(state: TrainState, x):
        variables = {"params": state.params, **state.extra_variables}
        if amp:
            variables, x = amp_cast(variables, x)
        return model.apply(variables, x, False)

    def eval_step(state: TrainState, images, labels):
        import jax.numpy as jnp

        x = to_ndhwc(images)
        y = to_ndhwc(labels) if labels.ndim == 5 else labels
        if inferer is not None:
            out = inferer(x, lambda z: forward(state, z))
        else:
            out = forward(state, x)
        out = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), out)
        return compute_criterion(criterion, out, y.astype(jnp.float32))

    jitted = {}  # keyed by label rank, as in make_sharded_train_step

    def traced_eval(state, images, labels):
        with activation_sharding(mesh):
            return eval_step(state, images, labels)

    def step(state, images, labels):
        ndim = labels.ndim
        if ndim not in jitted:
            y_sharded = NamedSharding(mesh, label_spec(mesh, ndim))
            jitted[ndim] = jax.jit(
                traced_eval,
                in_shardings=(replicated, data_sharded, y_sharded),
                out_shardings=replicated,
                compiler_options=tpu_compiler_options())
        return jitted[ndim](state, images, labels)

    return step


def ndhwc_batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for an on-device (B, D, H, W, C) batch on this mesh."""
    data = "data" if "data" in mesh.axis_names else None
    space = "space" if "space" in mesh.axis_names else None
    return P(data, space, None, None, None)


def make_sharded_forward(model, mesh: Mesh) -> Callable:
    """Jitted inference forward with the volume depth sharded over ``space``.

    The volumetric analog of context-parallel inference: a whole case larger
    than one chip's HBM spreads its D axis across the mesh; XLA SPMD inserts
    the conv halo exchanges. ``fn(state, x_ndhwc) -> y_ndhwc``.
    """
    replicated = NamedSharding(mesh, P())
    x_sharded = NamedSharding(mesh, ndhwc_batch_spec(mesh))

    def forward(state: TrainState, x):
        variables = {"params": state.params, **state.extra_variables}
        with activation_sharding(mesh):
            out = model.apply(variables, x, False)
        if isinstance(out, tuple):
            out = out[0]
        return out

    return jax.jit(forward, in_shardings=(replicated, x_sharded),
                   out_shardings=x_sharded,
                   compiler_options=tpu_compiler_options())
