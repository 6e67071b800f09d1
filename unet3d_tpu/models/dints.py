"""DiNTS — He et al. 2021 differentiable NAS topology, instance (retrain) mode.

Parity: the reference resolves any ``monai.networks.nets`` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); ``DiNTS`` (and its
``TopologyInstance`` search space) are namespace names. MONAI's ``DiNTS``
cannot be instantiated from a JSON config alone — it requires a
``dints_space`` object — so the reference's config path could never build one
either; here ``dints_space=None`` constructs a default full-topology
``TopologyInstance`` so the name is usable end-to-end.

Native Flax/NDHWC implementation of the *retrain* path (TopologyInstance →
DiNTS). The *search* machinery (TopologySearch: Gumbel-softmax op weights,
topology decoding via dynamic programming) is out of scope — searching is a
one-off GPU workflow; what a trained config needs is the instance network.

Search-space structure (He et al. 2021 §3, MONAI ``monai/networks/nets/dints.py``):

- A grid of ``num_blocks`` layers x ``num_depths`` resolutions (depth ``d``
  runs at 1/2**(d+1) of input resolution when ``use_downsample``, with
  ``channel_mul``-scaled widths 16,32,64,... doubling per depth).
- Each layer has ``3*num_depths - 2`` candidate edges connecting depth ``d``
  to ``d-1``/``d``/``d+1`` of the previous layer; ``arch_code`` =
  ``(arch_code_a, arch_code_c)`` selects which edges are active and which op
  each runs. Default: every edge active running ``conv_3x3x3``.
- Cell ops (the paper's 3D op set): ``skip_connect``, ``conv_3x3x3``, and the
  three pseudo-3D factorizations ``conv_3x3x1 + 1x1x3`` / ``conv_3x1x3 +
  1x3x1`` / ``conv_1x3x3 + 3x1x1`` — each conv as pre-activation
  ReLU→conv→InstanceNorm. Resolution changes ride the edge: stride-2 conv
  down, trilinear x2 + pointwise up.
- Stem: per-depth downsampling conv chains feeding every resolution's first
  layer; decoder: per-depth heads upsampled to full resolution and summed
  (the paper's multi-resolution feature aggregation), then the class conv.

Input spatial dims must be divisible by 2**(num_depths + use_downsample).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# op index -> (kernel factorization list); each entry is one ReLU-conv-IN stage
_OPS: Tuple[Tuple[Tuple[int, int, int], ...], ...] = (
    (),                                    # 0: skip_connect
    (((3, 3, 3)),),                        # 1: conv_3x3x3
    ((3, 3, 1), (1, 1, 3)),                # 2: P3D A
    ((3, 1, 3), (1, 3, 1)),                # 3: P3D B
    ((1, 3, 3), (3, 1, 1)),                # 4: P3D C
)
_OP_NAMES = ("skip_connect", "conv_3x3x3", "conv_3x3x1", "conv_3x1x3",
             "conv_1x3x3")


def _edges(num_depths: int) -> List[Tuple[int, int]]:
    """Edge list (src_depth, dst_depth) in MONAI's enumeration order."""
    out = []
    for dst in range(num_depths):
        for src in (dst - 1, dst, dst + 1):
            if 0 <= src < num_depths:
                out.append((src, dst))
    return out


@dataclass
class TopologyInstance:
    """Decoded topology: which edges exist and which op each runs.

    ``arch_code``: optional ``(arch_code_a, arch_code_c)`` —
    ``arch_code_a[block][edge]`` in {0,1} activation,
    ``arch_code_c[block][edge]`` op index into the 3D op set. ``None`` =
    full topology, all edges ``conv_3x3x3``.
    """
    arch_code: Optional[Any] = None
    channel_mul: float = 1.0
    num_blocks: int = 6
    num_depths: int = 3
    use_downsample: bool = True
    spatial_dims: int = 3
    edges: List[Tuple[int, int]] = field(init=False)
    code_a: List[List[int]] = field(init=False)
    code_c: List[List[int]] = field(init=False)

    def __post_init__(self):
        if self.spatial_dims != 3:
            raise NotImplementedError("TopologyInstance: 3D only on TPU")
        self.edges = _edges(self.num_depths)
        n_e = len(self.edges)
        if self.arch_code is None:
            self.code_a = [[1] * n_e for _ in range(self.num_blocks)]
            self.code_c = [[1] * n_e for _ in range(self.num_blocks)]
        else:
            code_a, code_c = self.arch_code
            self.code_a = [[int(v) for v in row] for row in code_a]
            self.code_c = [[int(v) for v in row] for row in code_c]
            if len(self.code_a) != self.num_blocks or any(
                    len(r) != n_e for r in self.code_a):
                raise ValueError(
                    f"arch_code_a must be [{self.num_blocks} x {n_e}]")
        # every depth must receive at least one active input edge per block
        for b, row in enumerate(self.code_a):
            live = {self.edges[i][1] for i, a in enumerate(row) if a}
            if live != set(range(self.num_depths)):
                missing = sorted(set(range(self.num_depths)) - live)
                raise ValueError(f"arch_code block {b}: depths {missing} have "
                                 "no active input edge")

    @property
    def filter_nums(self) -> List[int]:
        return [int(16 * self.channel_mul * 2 ** d)
                for d in range(self.num_depths)]


class _CellOp(nn.Module):
    """One edge: resolution adapter + the selected op stack."""
    features: int
    op_index: int
    resize: int  # -1 = upsample into shallower depth, +1 = downsample, 0 = flat

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.resize == 1:
            x = nn.relu(x)
            x = nn.Conv(self.features, (3, 3, 3), strides=(2, 2, 2),
                        padding="SAME", use_bias=False, name="down")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, name="down_norm")(x)
        elif self.resize == -1:
            shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:4]) + (
                x.shape[4],)
            x = jax.image.resize(x, shape, method="trilinear")
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="up")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, name="up_norm")(x)
        elif x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="adapt")(x)
        for i, k in enumerate(_OPS[self.op_index]):
            k3 = (k, k, k) if isinstance(k, int) else tuple(k)
            x = nn.relu(x)
            x = nn.Conv(self.features, k3, padding="SAME", use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, name=f"norm{i}")(x)
        return x


class DiNTS(nn.Module):
    """MONAI ``DiNTS`` retrain-mode network over a ``TopologyInstance``.

    ``dints_space=None`` builds the default full topology (all edges,
    conv_3x3x3) so the net is constructible straight from a JSON config.
    """
    dints_space: Optional[TopologyInstance] = None
    in_channels: int = 1
    num_classes: int = 1
    act_name: str = "RELU"
    norm_name: str = "INSTANCE"
    spatial_dims: int = 3
    use_downsample: bool = True
    node_a: Optional[Any] = None

    def _space(self) -> TopologyInstance:
        if self.dints_space is None:
            return TopologyInstance(use_downsample=self.use_downsample)
        if isinstance(self.dints_space, dict):
            return TopologyInstance(**self.dints_space)
        return self.dints_space

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("DiNTS here is the 3D TPU path")
        space = self._space()
        filters = space.filter_nums
        need = 2 ** (space.num_depths - 1 + int(space.use_downsample))
        for d in x.shape[1:4]:
            if d % need:
                raise ValueError(f"DiNTS: spatial dims {x.shape[1:4]} must be "
                                 f"divisible by {need}")

        # Stems: input -> each depth's resolution/width via stride-2 convs.
        states: List[jnp.ndarray] = []
        h0 = x
        if space.use_downsample:
            h0 = nn.Conv(filters[0], (3, 3, 3), strides=(2, 2, 2),
                         padding="SAME", use_bias=False, name="stem")(h0)
            h0 = nn.GroupNorm(num_groups=None, group_size=1,
                              name="stem_norm")(h0)
        h = h0
        for d in range(space.num_depths):
            if d > 0:
                h = nn.relu(h)
                h = nn.Conv(filters[d], (3, 3, 3), strides=(2, 2, 2),
                            padding="SAME", use_bias=False,
                            name=f"stem_down{d}")(h)
                h = nn.GroupNorm(num_groups=None, group_size=1,
                                 name=f"stem_norm{d}")(h)
            states.append(h)

        # The topology grid.
        for b in range(space.num_blocks):
            incoming: List[List[jnp.ndarray]] = [[] for _ in
                                                 range(space.num_depths)]
            for e, (src, dst) in enumerate(space.edges):
                if not space.code_a[b][e]:
                    continue
                y = _CellOp(filters[dst], space.code_c[b][e], dst - src,
                            name=f"b{b}_e{e}")(states[src], train)
                incoming[dst].append(y)
            states = [sum(vs) for vs in incoming]

        # Decoder: bring every depth to depth-0 resolution, aggregate, head.
        outs = []
        for d, s in enumerate(states):
            y = nn.relu(s)
            y = nn.Conv(filters[0], (1, 1, 1), use_bias=False,
                        name=f"head_proj{d}")(y)
            if d > 0:
                shape = (y.shape[0],) + tuple(
                    v * 2 ** d for v in y.shape[1:4]) + (y.shape[4],)
                y = jax.image.resize(y, shape, method="trilinear")
            outs.append(y)
        y = sum(outs)
        y = nn.GroupNorm(num_groups=None, group_size=1, name="head_norm")(y)
        y = nn.relu(y)
        if space.use_downsample:
            y = nn.ConvTranspose(filters[0], (2, 2, 2), strides=(2, 2, 2),
                                 name="head_up")(y)
            y = nn.GroupNorm(num_groups=None, group_size=1,
                             name="head_up_norm")(y)
            y = nn.relu(y)
        return nn.Conv(self.num_classes, (1, 1, 1), name="output")(y)
