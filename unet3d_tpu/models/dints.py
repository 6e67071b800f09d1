"""DiNTS — He et al. 2021 differentiable NAS topology, instance (retrain) mode.

Parity: the reference resolves any ``monai.networks.nets`` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); ``DiNTS`` (and its
``TopologyInstance`` search space) are namespace names. MONAI's ``DiNTS``
cannot be instantiated from a JSON config alone — it requires a
``dints_space`` object — so the reference's config path could never build one
either; here ``dints_space=None`` constructs a default full-topology
``TopologyInstance`` so the name is usable end-to-end.

Native Flax/NDHWC implementation of BOTH paths:

- *retrain*: ``TopologyInstance`` → ``DiNTS`` (decoded, sparse network).
- *search*: ``TopologySearch`` → ``DiNTS`` — every edge carries all five
  candidate ops, weighted by ``softmax(log_alpha_c)`` op logits and
  ``sigmoid(log_alpha_a)`` edge-activation logits (He et al. 2021 §3.2).
  The arch logits live in the regular ``params`` collection under
  ``log_alpha_a`` / ``log_alpha_c`` so the standard train step optimizes
  them (single-level relaxation); a bi-level search script can partition
  the param tree on those names. ``TopologySearch.decode`` then extracts
  the max-probability *feasible* topology by Viterbi DP over
  node-activation states (the paper's topology-decoding step) and returns
  an ``arch_code`` that constructs a ``TopologyInstance`` for retraining.

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
        # Reachability semantics (DiNTS §3.3): a node is active after block b
        # iff it received >=1 active input edge in block b; an active edge may
        # only source from an active node; each block needs >=1 active edge.
        # (Nodes may go dark — the decoder aggregation skips them.)
        active = set(range(self.num_depths))
        self.node_active: List[List[bool]] = [
            [True] * self.num_depths]
        for b, row in enumerate(self.code_a):
            nxt = set()
            for e, a in enumerate(row):
                if not a:
                    continue
                src, dst = self.edges[e]
                if src not in active:
                    raise ValueError(
                        f"arch_code block {b}: edge {e} ({src}->{dst}) sources "
                        f"from depth {src}, which has no active input path")
                nxt.add(dst)
            if not nxt:
                raise ValueError(f"arch_code block {b}: no active edges")
            active = nxt
            self.node_active.append(
                [d in active for d in range(self.num_depths)])

    @property
    def filter_nums(self) -> List[int]:
        return [int(16 * self.channel_mul * 2 ** d)
                for d in range(self.num_depths)]


@dataclass
class TopologySearch:
    """Differentiable DiNTS search space (MONAI ``TopologySearch`` analog).

    Construct ``DiNTS(dints_space=TopologySearch(...))`` (or via config with
    ``dints_space={"search": True, ...}``): the network then carries
    ``log_alpha_a`` (num_blocks, n_edges) edge-activation logits and
    ``log_alpha_c`` (num_blocks, n_edges, n_ops) op logits as parameters and
    computes the fully-weighted supernet forward. The post-search methods
    below are host-side numpy (they take the trained logit arrays extracted
    from ``variables["params"]``).
    """
    channel_mul: float = 1.0
    num_blocks: int = 6
    num_depths: int = 3
    use_downsample: bool = True
    spatial_dims: int = 3
    edges: List[Tuple[int, int]] = field(init=False)

    def __post_init__(self):
        if self.spatial_dims != 3:
            raise NotImplementedError("TopologySearch: 3D only on TPU")
        self.edges = _edges(self.num_depths)

    @property
    def filter_nums(self) -> List[int]:
        return [int(16 * self.channel_mul * 2 ** d)
                for d in range(self.num_depths)]

    # ---- host-side numpy analysis / decode -------------------------------

    def get_prob_a(self, log_alpha_a) -> "np.ndarray":
        """Edge-activation probabilities: sigmoid(log_alpha_a)."""
        import numpy as np
        a = np.asarray(log_alpha_a, dtype=np.float64)
        return 1.0 / (1.0 + np.exp(-a))

    def _node_io_probs(self, probs_a):
        """P(node d receives input at block b) and P(node d emits at block b)."""
        import numpy as np
        p = np.asarray(probs_a, dtype=np.float64)
        n_d = self.num_depths
        p_in = np.zeros((self.num_blocks, n_d))
        p_out = np.zeros((self.num_blocks, n_d))
        for b in range(self.num_blocks):
            for e, (src, dst) in enumerate(self.edges):
                p_in[b, dst] = 1 - (1 - p_in[b, dst]) * (1 - p[b, e])
                p_out[b, src] = 1 - (1 - p_out[b, src]) * (1 - p[b, e])
        return p_in, p_out

    def get_topology_entropy(self, log_alpha_a) -> float:
        """Topology consistency regularizer (He et al. 2021 Eq. 5): the
        cross-entropy between "node d is written at block b" and "node d is
        read at block b+1" — low when activation flows are consistent."""
        import numpy as np
        probs_a = self.get_prob_a(log_alpha_a)
        p_in, p_out = self._node_io_probs(probs_a)
        eps = 1e-5
        ent = 0.0
        for b in range(self.num_blocks - 1):
            w = np.clip(p_in[b], eps, 1 - eps)        # written at block b
            r = np.clip(p_out[b + 1], eps, 1 - eps)   # read at block b+1
            ent += float(np.sum(-(w * np.log(r) + (1 - w) * np.log(1 - r))))
        return ent

    def get_ram_cost_usage(self, in_size, log_alpha_a,
                           full: bool = False) -> float:
        """Expected activation memory of the decoded net in GB.

        ``in_size``: (batch, in_channels, D, H, W). Per edge: output voxels x
        channels x (number of materialized tensors for the op mix) x 4 bytes,
        weighted by the edge's activation probability (or 1 when ``full``)."""
        import numpy as np
        probs_a = self.get_prob_a(log_alpha_a)
        if full:
            probs_a = np.ones_like(probs_a)
        batch = int(in_size[0])
        spatial = [int(s) for s in in_size[2:5]]
        stem = 2 if self.use_downsample else 1
        # materialized tensors per op (adapter out + each conv stage out)
        op_tensors = np.array([1.0 + len(ops) for ops in _OPS])
        mean_tensors = float(op_tensors.mean())
        total = 0.0
        for b in range(self.num_blocks):
            for e, (src, dst) in enumerate(self.edges):
                scale = stem * 2 ** dst
                voxels = batch * np.prod([s // scale for s in spatial])
                total += (probs_a[b, e] * voxels * self.filter_nums[dst]
                          * mean_tensors * 4)
        return float(total / 2 ** 30)

    def decode(self, log_alpha_a, log_alpha_c):
        """Extract the max-probability feasible topology (Viterbi DP over
        node-activation states, the paper's topology decoding).

        Returns ``(arch_code_a, arch_code_c, node_a)``: 0/1 edge activations
        (num_blocks, n_edges), per-edge op indices (argmax of the op logits),
        and the (num_blocks+1, num_depths) node-activation mask. The codes
        construct a valid ``TopologyInstance``.
        """
        import numpy as np
        probs_a = self.get_prob_a(log_alpha_a)
        w_c = np.asarray(log_alpha_c, dtype=np.float64)
        w_c = np.exp(w_c - w_c.max(-1, keepdims=True))
        w_c = w_c / w_c.sum(-1, keepdims=True)
        op_idx = w_c.argmax(-1)                       # (blocks, edges)
        # edge score couples activation prob with op confidence
        p_e = np.clip(probs_a * w_c.max(-1), 1e-5, 1 - 1e-5)

        n_d = self.num_depths
        states = [frozenset(s for s in range(n_d) if (m >> s) & 1)
                  for m in range(1, 2 ** n_d)]

        def transition(b, s_prev, s_next):
            """Best edge subset for block b given boundary states; returns
            (score, active_edge_list) or None if infeasible."""
            active, score = [], 0.0
            covered = {d: [] for d in s_next}
            for e, (src, dst) in enumerate(self.edges):
                valid = src in s_prev and dst in s_next
                if valid and p_e[b, e] > 0.5:
                    active.append(e)
                    covered[dst].append(e)
                    score += np.log(p_e[b, e])
                else:
                    score += np.log(1 - p_e[b, e])
                    if valid:
                        covered[dst].append(-e - 1)   # candidate, inactive
            for dst, cands in covered.items():
                if any(c >= 0 for c in cands):
                    continue
                if not cands:
                    return None                       # dst unreachable
                # force the best candidate on (flip its contribution)
                best = max((-c - 1 for c in cands), key=lambda e: p_e[b, e])
                active.append(best)
                score += np.log(p_e[b, best]) - np.log(1 - p_e[b, best])
            return score, sorted(active)

        full = frozenset(range(n_d))
        # Viterbi: dp[state] = (score, path, edge_sets)
        dp = {full: (0.0, [full], [])}
        for b in range(self.num_blocks):
            nxt = {}
            for s_prev, (sc, path, sets) in dp.items():
                for s_next in states:
                    tr = transition(b, s_prev, s_next)
                    if tr is None:
                        continue
                    cand = (sc + tr[0], path + [s_next], sets + [tr[1]])
                    if s_next not in nxt or cand[0] > nxt[s_next][0]:
                        nxt[s_next] = cand
            dp = nxt
        _, path, edge_sets = max(dp.values(), key=lambda v: v[0])

        n_e = len(self.edges)
        arch_code_a = [[1 if e in es else 0 for e in range(n_e)]
                       for es in edge_sets]
        arch_code_c = [[int(op_idx[b, e]) for e in range(n_e)]
                       for b in range(self.num_blocks)]
        node_a = [[1 if d in s else 0 for d in range(n_d)] for s in path]
        return arch_code_a, arch_code_c, node_a


def _in_norm(name: str) -> nn.GroupNorm:
    """Per-channel GroupNorm == InstanceNorm3d(affine=True), MONAI eps=1e-5
    (flax's default eps is 1e-6 — pinned by the DiNTS transplant test)."""
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, name=name)


class _EdgeAdapter(nn.Module):
    """Search-mode edge preprocessing: the resolution/width adapter shared by
    all candidate ops on the edge (same structure as _CellOp's adapter)."""
    features: int
    resize: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.resize == 1:
            x = nn.relu(x)
            x = nn.Conv(self.features, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1),) * 3, use_bias=False,
                        name="down")(x)
            x = _in_norm("down_norm")(x)
        elif self.resize == -1:
            shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:4]) + (
                x.shape[4],)
            x = jax.image.resize(x, shape, method="trilinear")
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="up")(x)
            x = _in_norm("up_norm")(x)
        elif x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="adapt")(x)
        return x


class _OpStack(nn.Module):
    """One candidate op's conv stack (post-adapter)."""
    features: int
    op_index: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, k in enumerate(_OPS[self.op_index]):
            k3 = (k, k, k) if isinstance(k, int) else tuple(k)
            x = nn.relu(x)
            x = nn.Conv(self.features, k3, padding="SAME", use_bias=False,
                        name=f"conv{i}")(x)
            x = _in_norm(f"norm{i}")(x)
        return x


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
                        padding=((1, 1),) * 3, use_bias=False,
                        name="down")(x)
            x = _in_norm("down_norm")(x)
        elif self.resize == -1:
            shape = (x.shape[0],) + tuple(2 * s for s in x.shape[1:4]) + (
                x.shape[4],)
            x = jax.image.resize(x, shape, method="trilinear")
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="up")(x)
            x = _in_norm("up_norm")(x)
        elif x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False, name="adapt")(x)
        for i, k in enumerate(_OPS[self.op_index]):
            k3 = (k, k, k) if isinstance(k, int) else tuple(k)
            x = nn.relu(x)
            x = nn.Conv(self.features, k3, padding="SAME", use_bias=False,
                        name=f"conv{i}")(x)
            x = _in_norm(f"norm{i}")(x)
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

    def _space(self):
        if self.dints_space is None:
            return TopologyInstance(use_downsample=self.use_downsample)
        import collections.abc
        if isinstance(self.dints_space, collections.abc.Mapping):
            # (flax stores dict fields as FrozenDict)
            kwargs = {k: v for k, v in self.dints_space.items()}
            if kwargs.pop("search", False):
                return TopologySearch(**kwargs)
            return TopologyInstance(**kwargs)
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
                         padding=((1, 1),) * 3, use_bias=False,
                         name="stem")(h0)
            h0 = _in_norm("stem_norm")(h0)
        h = h0
        for d in range(space.num_depths):
            if d > 0:
                h = nn.relu(h)
                h = nn.Conv(filters[d], (3, 3, 3), strides=(2, 2, 2),
                            padding=((1, 1),) * 3, use_bias=False,
                            name=f"stem_down{d}")(h)
                h = _in_norm(f"stem_norm{d}")(h)
            states.append(h)

        # The topology grid.
        if isinstance(space, TopologySearch):
            # supernet: every edge, all ops, weighted by the arch logits
            n_e, n_ops = len(space.edges), len(_OPS)
            log_a = self.param("log_alpha_a", nn.initializers.zeros,
                               (space.num_blocks, n_e))
            log_c = self.param("log_alpha_c", nn.initializers.normal(1e-3),
                               (space.num_blocks, n_e, n_ops))
            p_a = jax.nn.sigmoid(log_a)
            w_c = jax.nn.softmax(log_c, axis=-1)
            for b in range(space.num_blocks):
                incoming = [[] for _ in range(space.num_depths)]
                for e, (src, dst) in enumerate(space.edges):
                    y0 = _EdgeAdapter(filters[dst], dst - src,
                                      name=f"b{b}_e{e}_adapt")(states[src])
                    acc = w_c[b, e, 0] * y0  # op 0: skip_connect
                    for op in range(1, n_ops):
                        acc = acc + w_c[b, e, op] * _OpStack(
                            filters[dst], op, name=f"b{b}_e{e}_op{op}")(y0)
                    incoming[dst].append(p_a[b, e] * acc)
                states = [sum(vs) for vs in incoming]
        else:
            for b in range(space.num_blocks):
                incoming: List[List[jnp.ndarray]] = [[] for _ in
                                                     range(space.num_depths)]
                for e, (src, dst) in enumerate(space.edges):
                    if not space.code_a[b][e]:
                        continue
                    y = _CellOp(filters[dst], space.code_c[b][e], dst - src,
                                name=f"b{b}_e{e}")(states[src], train)
                    incoming[dst].append(y)
                # depths with no active input go dark (skipped downstream)
                states = [sum(vs) if vs else None for vs in incoming]

        # Decoder: bring every live depth to depth-0 resolution, aggregate.
        outs = []
        for d, s in enumerate(states):
            if s is None:
                continue
            y = nn.relu(s)
            y = nn.Conv(filters[0], (1, 1, 1), use_bias=False,
                        name=f"head_proj{d}")(y)
            if d > 0:
                shape = (y.shape[0],) + tuple(
                    v * 2 ** d for v in y.shape[1:4]) + (y.shape[4],)
                y = jax.image.resize(y, shape, method="trilinear")
            outs.append(y)
        y = sum(outs)
        y = _in_norm("head_norm")(y)
        y = nn.relu(y)
        if space.use_downsample:
            y = nn.ConvTranspose(filters[0], (2, 2, 2), strides=(2, 2, 2),
                                 name="head_up")(y)
            y = _in_norm("head_up_norm")(y)
            y = nn.relu(y)
        return nn.Conv(self.num_classes, (1, 1, 1), name="output")(y)
