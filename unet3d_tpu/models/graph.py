"""GraphCMR: mesh-regression net (3D ResNet image encoder + graph conv blocks).

Parity: `unet3d/models/pytorch/graph/` — GraphLinear / GraphConvolution /
GraphResBlock over a surface adjacency matrix, with a ResNet-18 image encoder;
plus the GIFTI surface loader and faces->adjacency construction
(`graph/utils.py:7-27`).

TPU note: the reference multiplies a *sparse* adjacency with a custom autograd
op (`SparseMM`, `graph_cmr_layers.py:109-129`) because torch's sparse matmul
lacked a backward. On TPU the adjacency (~2k vertices) is kept dense: a
(V, V) @ (V, C) matmul rides the MXU and autodiff works natively — the sparse
workaround is exactly the kind of host-era machinery a TPU design drops.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.resnet import resnet_18


def faces_to_adjacency_matrix(n_vertices: int, faces: np.ndarray) -> np.ndarray:
    """Row-normalized vertex adjacency (with self-loops) from triangle faces.

    Fixed-on-purpose vs `graph/utils.py:15-27`: the reference builds its
    sparse adjacency with ZERO values (its GCN output degenerates to the
    bias — a reference bug); here edges are 1 with self-loops and row
    normalization, the standard GCN adjacency.
    """
    adj = np.zeros((n_vertices, n_vertices), dtype=np.float32)
    for a, b, c in np.asarray(faces, dtype=np.int64):
        adj[a, b] = adj[b, a] = 1.0
        adj[b, c] = adj[c, b] = 1.0
        adj[a, c] = adj[c, a] = 1.0
    np.fill_diagonal(adj, 1.0)
    row_sum = adj.sum(axis=1, keepdims=True)
    return adj / np.maximum(row_sum, 1.0)


def load_surface(surface_filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load (vertices, adjacency) from a GIFTI surface file.

    Parity: `graph/utils.py:7-13`. Minimal GIFTI (XML) reader: the two data
    arrays are the pointset (V, 3) and the triangles (F, 3).
    """
    import base64
    import gzip
    import xml.etree.ElementTree as ET

    tree = ET.parse(surface_filename)
    arrays = {}
    for darray in tree.iter("DataArray"):
        intent = darray.get("Intent")
        dims = [int(darray.get(f"Dim{i}"))
                for i in range(int(darray.get("Dimensionality")))]
        dtype = np.float32 if darray.get("DataType") == "NIFTI_TYPE_FLOAT32" \
            else np.int32
        encoding = darray.get("Encoding")
        if encoding not in ("Base64Binary", "GZipBase64Binary"):
            # e.g. ExternalFileBinary / ASCII — name the encoding instead of
            # failing on a None/garbled <Data> payload downstream.
            raise ValueError(
                f"GIFTI DataArray encoding {encoding!r} in {surface_filename} is "
                "not supported; re-encode the surface as Base64Binary or "
                "GZipBase64Binary (e.g. nibabel save with default encoding)")
        data_el = darray.find("Data")
        raw = base64.b64decode(data_el.text)
        if encoding == "GZipBase64Binary":
            raw = gzip.decompress(raw)
        arrays[intent] = np.frombuffer(raw, dtype=dtype).reshape(dims)
    vertices = arrays["NIFTI_INTENT_POINTSET"].astype(np.float32)
    faces = arrays["NIFTI_INTENT_TRIANGLE"]
    adjacency = faces_to_adjacency_matrix(len(vertices), faces)
    return vertices.T, adjacency  # (3, V) like the reference's ref_vertices


def _centered_uniform(stdv: float):
    """uniform(-stdv, stdv) initializer (torch nn.init.uniform_ parity)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-stdv, maxval=stdv)
    return init


class GraphLinear(nn.Module):
    """1x1 'convolution' on graphs: x is (B, C, V) (`graph_cmr_layers.py:57-75`)."""
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[1]
        stdv = 1.0 / (in_channels * self.out_channels)
        # store params centered in [-stdv, stdv) (a shifted store + call-time
        # recenter would make weight decay pull toward -stdv, not 0)
        init = _centered_uniform(stdv)
        w = self.param("W", init, (self.out_channels, in_channels))
        b = self.param("b", init, (self.out_channels,))
        return jnp.einsum("oc,bcv->bov", w, x) + b[None, :, None]


class GraphConvolution(nn.Module):
    """Kipf-style GCN layer: A @ (X @ W) + b (`graph_cmr_layers.py:12-54`).

    ``x`` is (B, V, C_in); the adjacency is a dense (V, V) constant.
    """
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adjacency: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        stdv = 6.0 / np.sqrt(in_features + self.out_features)
        init = _centered_uniform(stdv)
        w = self.param("weight", init, (in_features, self.out_features))
        b = self.param("bias", init, (self.out_features,))
        support = jnp.einsum("bvc,co->bvo", x, w)
        return jnp.einsum("uv,bvo->buo", adjacency, support) + b


class GraphResBlock(nn.Module):
    """Bottleneck-style graph residual block (`graph_cmr_layers.py:78-106`)."""
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adjacency: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[1]
        half = self.out_channels // 2
        y = nn.relu(nn.GroupNorm(num_groups=max(in_channels // 8, 1), epsilon=1e-5, name="pre_norm")
                    (x.swapaxes(1, 2)).swapaxes(1, 2))
        y = GraphLinear(half, name="lin1")(y)
        y = nn.relu(nn.GroupNorm(num_groups=max(half // 8, 1), epsilon=1e-5, name="norm1")
                    (y.swapaxes(1, 2)).swapaxes(1, 2))
        y = GraphConvolution(half, name="conv")(y.swapaxes(1, 2), adjacency) \
            .swapaxes(1, 2)
        y = nn.relu(nn.GroupNorm(num_groups=max(half // 8, 1), epsilon=1e-5, name="norm2")
                    (y.swapaxes(1, 2)).swapaxes(1, 2))
        y = GraphLinear(self.out_channels, name="lin2")(y)
        if in_channels != self.out_channels:
            x = GraphLinear(self.out_channels, name="skip_conv")(x)
        return x + y


class GraphCMR(nn.Module):
    """3D image -> per-vertex coordinates (`graph_cmr_net.py:17-59`).

    ``ref_vertices`` (3, V) and ``adjacency_matrix`` (V, V) are static numpy
    constants baked at construction (or loaded via ``reference_filename``).
    """
    ref_vertices: Any = None
    adjacency_matrix: Any = None
    reference_filename: Optional[str] = None
    n_layers: int = 5
    n_channels: int = 256
    output_features: int = 3
    encoder_outputs: int = 512
    n_outputs: Optional[int] = None  # API parity (unused)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ref_vertices, adjacency = self.ref_vertices, self.adjacency_matrix
        if self.reference_filename is not None and (ref_vertices is None
                                                    or adjacency is None):
            ref_vertices, adjacency = load_surface(self.reference_filename)
        ref = jnp.asarray(np.asarray(ref_vertices), jnp.float32)       # (3, V)
        adj = jnp.asarray(np.asarray(adjacency), jnp.float32)          # (V, V)
        batch = x.shape[0]
        n_vertices = ref.shape[-1]

        feats = resnet_18(n_outputs=self.encoder_outputs, name="encoder")(
            x, train=train)                                            # (B, E)
        feats = jnp.broadcast_to(feats[:, :, None],
                                 (batch, self.encoder_outputs, n_vertices))
        y = jnp.concatenate([jnp.broadcast_to(ref[None], (batch,) + ref.shape),
                             feats], axis=1)                            # (B, 3+E, V)

        y = GraphLinear(2 * self.n_channels, name="gc_lin")(y)
        y = GraphResBlock(self.n_channels, name="gc_block0")(y, adj)
        for i in range(self.n_layers):
            y = GraphResBlock(self.n_channels, name=f"gc_block{i + 1}")(y, adj)
        y = GraphResBlock(64, name="shape_block0")(y, adj)
        y = GraphResBlock(32, name="shape_block1")(y, adj)
        y = nn.relu(nn.GroupNorm(num_groups=32 // 8, epsilon=1e-5, name="shape_norm")
                    (y.swapaxes(1, 2)).swapaxes(1, 2))
        return GraphLinear(self.output_features, name="shape_out")(y)
