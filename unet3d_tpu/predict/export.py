"""Ahead-of-time model export for serving (framework extension).

Serializes a trained model's inference forward as a self-contained
StableHLO artifact (`jax.export`) that a serving process can load and run
WITHOUT the model code, the config, or the checkpoint — only jax and the
artifact file. The reference has no serving story beyond re-running its
predict script against the python checkpoint; this gives the TPU rebuild a
deployable unit:

- one file: versioned container = JSON metadata header + the serialized
  StableHLO module (in/out layout, activation, platforms recorded in the
  header);
- dynamic batch by default (symbolic leading dimension), so a server can
  batch requests without re-exporting;
- cross-platform: export once with ``platforms=("cpu", "tpu")`` and the same
  artifact runs on a CPU canary and the TPU fleet (XLA retargets at load).

The exported signature is the serving boundary: channel-first ``(B, C, D, H,
W)`` float32 in, ``(B, C', D, H, W)`` float32 out — the host layout every
loader in this package produces; the NDHWC device transpose happens inside
the program (free: XLA folds it into the first conv's layout assignment,
PERF.md round 4). ``amp`` runs the graph in bfloat16 exactly like the predict
CLI's AMP path.
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"U3DEXP01"


def _resolve_activation(name: Optional[str]) -> Optional[Callable]:
    """Same activation-name contract as the predict CLI
    (`predict/volumetric.py`): any jnp / jax.nn name, or None."""
    if not name:
        return None
    import jax
    import jax.numpy as jnp

    if hasattr(jax.nn, name):
        return getattr(jax.nn, name)
    if hasattr(jnp, name):
        return getattr(jnp, name)
    raise ValueError(f"Unknown activation {name!r} (not a jax.nn or jnp name)")


def _entry_spec(mesh, entry_layout: str):
    """PartitionSpec for the serving batch in the artifact's entry layout:
    channel-first (B, C, D, H, W) or device-native (B, D, H, W, C)."""
    from jax.sharding import PartitionSpec as P

    data = "data" if "data" in mesh.axis_names else None
    space = "space" if "space" in mesh.axis_names else None
    if entry_layout == "ndhwc":
        return P(data, space, None, None, None)
    return P(data, None, space, None, None)


def export_forward(model, variables, input_shape: Sequence[int], *,
                   amp: bool = False, activation: Optional[str] = None,
                   batch_size: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None,
                   mesh=None, entry_layout: str = "ncdhw"):
    """Export the inference forward as a ``jax.export.Exported``.

    ``input_shape`` is spatial+channel ``(D, H, W, C_in)`` (the init_params
    convention); the exported callable takes channel-first ``(B, C_in, D, H,
    W)`` float32. ``batch_size=None`` exports a symbolic batch dimension.
    ``platforms=None`` targets the current default backend.

    ``entry_layout="ndhwc"`` exports a device-native-layout boundary instead:
    ``(B, D, H, W, C)`` in and out, no transposes inside the program — for
    serving pipelines that already hold channel-last tensors (VERDICT r4
    item 4: bisecting the exported calling convention's layout tax).

    ``mesh`` exports a MULTI-DEVICE artifact: the batch is sharded over the
    mesh's ``data`` axis and the volume depth over ``space`` (conv halo
    exchanges inserted by XLA SPMD, exactly the predict CLI's mesh path) and
    the serialized module embeds the shardings — the serving process replays
    it over any same-shape mesh (``ExportedModel`` rebuilds the mesh and
    shards inputs automatically). Requires a concrete ``batch_size``
    (default: the mesh's data-axis size) and single-platform lowering.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from unet3d_tpu.train.step import amp_cast, from_ndhwc, to_ndhwc

    d, h, w, c_in = (int(s) for s in input_shape)
    if entry_layout not in ("ncdhw", "ndhwc"):
        raise ValueError(f"entry_layout must be 'ncdhw' or 'ndhwc', "
                         f"got {entry_layout!r}")
    act = _resolve_activation(activation)
    base_variables = amp_cast(variables) if amp else variables

    def forward(x):
        y = x if entry_layout == "ndhwc" else to_ndhwc(x)
        y = y.astype(jnp.bfloat16 if amp else jnp.float32)
        out = model.apply(base_variables, y, False)  # train positional (remat compat)
        if isinstance(out, tuple):  # VAE-style (out, mu, logvar, ...)
            out = out[0]
        # f32 BEFORE the activation: the predict path applies activations in
        # f32 after the AMP cast-back (volumetric.py:149); a bf16 sigmoid
        # here measured 6.5e-3 off the served-vs-direct comparison
        out = out.astype(jnp.float32)
        if act is not None:
            out = act(out)
        return out if entry_layout == "ndhwc" else from_ndhwc(out)

    if mesh is not None and batch_size is None:
        batch_size = int(mesh.shape.get("data", 1))
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = [str(p) for p in platforms]
    in_shape = ((b, d, h, w, c_in) if entry_layout == "ndhwc"
                else (b, c_in, d, h, w))
    if mesh is None:
        spec = jax.ShapeDtypeStruct(in_shape, jnp.float32)
        return _stamp_layout(jax_export.export(jax.jit(forward), **kwargs)(spec),
                             entry_layout)

    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, _entry_spec(mesh, entry_layout))
    spec = jax.ShapeDtypeStruct(in_shape, jnp.float32, sharding=sharding)
    jitted = jax.jit(forward, in_shardings=(sharding,), out_shardings=sharding)
    return _stamp_layout(jax_export.export(jitted, **kwargs)(spec), entry_layout)


def _stamp_layout(exported, entry_layout: str):
    """Record the entry layout ON the Exported so :func:`save_exported` writes
    it into the header without every caller having to re-remember it —
    ``load_exported(...).ndhwc_forward()`` picks the wrong adapter otherwise."""
    object.__setattr__(exported, "_u3d_entry_layout", entry_layout)
    return exported


def save_exported(exported, path: str,
                  metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Write the single-file container: magic | u64 header-length | JSON
    header | serialized StableHLO payload. Returns the header written."""
    payload = bytes(exported.serialize())
    header = {"format": "unet3d_tpu.export", "version": 1,
              "in_avals": [str(a) for a in exported.in_avals],
              "out_avals": [str(a) for a in exported.out_avals],
              "platforms": list(exported.platforms),
              "nr_devices": int(exported.nr_devices),
              # stamped by export_forward; caller metadata may override
              "entry_layout": getattr(exported, "_u3d_entry_layout", "ncdhw"),
              **(metadata or {})}
    blob = json.dumps(header, sort_keys=True).encode()
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        f.write(payload)
    os.replace(tmp, path)
    return header


class ExportedModel:
    """A loaded serving artifact: ``__call__`` on numpy/jax arrays."""

    def __init__(self, exported, metadata: Dict[str, Any]):
        self.exported = exported
        self.metadata = metadata
        # jit the calling convention once: eager `Exported.call` re-traces on
        # every invocation (pure host overhead per serving request); under
        # jit the trace is cached per concrete input shape
        self._jitted_call = None

    def _mesh(self):
        """Rebuild a same-shape mesh over this process's devices for a
        multi-device artifact (the `mesh` axes/sizes travel in the header)."""
        import jax
        from jax.sharding import Mesh

        meta = self.metadata.get("mesh")
        n = int(self.exported.nr_devices)
        if meta is None:  # pre-mesh artifact: linear device order
            axes, shape = ("data",), (n,)
        else:
            axes, shape = tuple(meta["axes"]), tuple(meta["shape"])
        devices = jax.devices()
        if len(devices) < n:
            raise RuntimeError(
                f"Artifact was exported for {n} devices; this process has "
                f"{len(devices)}")
        return Mesh(np.asarray(devices[:n]).reshape(shape), axes)

    def __call__(self, x) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(x, jnp.float32)
        if int(self.exported.nr_devices) > 1:
            (in_sharding,) = self.exported.in_shardings_jax(self._mesh())
            x = jax.device_put(x, in_sharding)
        if self._jitted_call is None:
            self._jitted_call = jax.jit(self.exported.call)
        return self._jitted_call(x)

    def ndhwc_forward(self) -> Callable:
        """Adapter with the `make_forward` calling convention (NDHWC in/out)
        so the artifact drops into `volumetric_predictions`/inferers.

        NDHWC-entry artifacts (``entry_layout: "ndhwc"`` in the header) are
        already in this convention — returned as-is, zero boundary
        transposes. For channel-first artifacts the extra transposes at the
        boundary are layout assignments XLA folds into the adjacent convs
        (PERF.md round 4)."""
        if self.metadata.get("entry_layout") == "ndhwc":
            return self
        from unet3d_tpu.train.step import from_ndhwc, to_ndhwc

        def forward(x_ndhwc):
            return to_ndhwc(self(from_ndhwc(x_ndhwc)))

        return forward


def load_exported(path: str) -> ExportedModel:
    """Load a container written by :func:`save_exported`."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a unet3d_tpu export artifact "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack("<Q", f.read(8))
        metadata = json.loads(f.read(hlen).decode())
        payload = f.read()
    return ExportedModel(jax_export.deserialize(bytearray(payload)), metadata)
