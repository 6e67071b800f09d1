"""DiNTS (retrain mode) weight-transplant parity vs an independent torch build.

Pins the NAS-grid conventions: stem downsample chain, per-edge resolution
adapters (stride-2 conv down / trilinear-x2 + pointwise up), the P3D
factorized op stacks (anisotropic kernels with per-axis padding), skip_connect
(adapter only), pre-activation ReLU->conv->InstanceNorm(affine, eps 1e-5)
staging, and the multi-resolution head aggregation with its transposed-conv
full-resolution restore.

monai is not installed in this image; the torch network below is an
independent re-implementation of the ``monai.networks.nets.DiNTS`` retrain
forward semantics built from torch primitives only.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet3d_tpu.models.dints import _OPS

MUL = 0.25          # filters [4, 8]
BLOCKS = 2
DEPTHS = 2
# all four edges active; ops cover conv_3x3x3, all three P3D, and skip
CODE_A = [[1, 1, 1, 1], [1, 1, 1, 1]]
CODE_C = [[1, 2, 3, 4], [2, 0, 1, 3]]


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _in(ch):
    return torch.nn.InstanceNorm3d(ch, eps=1e-5, affine=True)


def _load_in(norm, p):
    norm.weight.data = _t(p["scale"])
    norm.bias.data = _t(p["bias"])


class TorchCellOp(torch.nn.Module):
    def __init__(self, in_ch, features, op_index, resize):
        super().__init__()
        self.resize = resize
        self.adapt = None
        if resize == 1:
            self.down = torch.nn.Conv3d(in_ch, features, 3, stride=2,
                                        padding=1, bias=False)
            self.down_norm = _in(features)
        elif resize == -1:
            self.up = torch.nn.Conv3d(in_ch, features, 1, bias=False)
            self.up_norm = _in(features)
        elif in_ch != features:
            self.adapt = torch.nn.Conv3d(in_ch, features, 1, bias=False)
        self.stages = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        for k in _OPS[op_index]:
            k3 = (k, k, k) if isinstance(k, int) else tuple(k)
            self.stages.append(torch.nn.Conv3d(
                features, features, k3, padding=tuple(ki // 2 for ki in k3),
                bias=False))
            self.norms.append(_in(features))

    def forward(self, x):
        if self.resize == 1:
            x = self.down_norm(self.down(torch.relu(x)))
        elif self.resize == -1:
            x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode="trilinear",
                                                align_corners=False)
            x = self.up_norm(self.up(x))
        elif self.adapt is not None:
            x = self.adapt(x)
        for conv, norm in zip(self.stages, self.norms):
            x = norm(conv(torch.relu(x)))
        return x

    def load(self, p):
        if self.resize == 1:
            self.down.weight.data = _conv_w(p["down"]["kernel"])
            _load_in(self.down_norm, p["down_norm"])
        elif self.resize == -1:
            self.up.weight.data = _conv_w(p["up"]["kernel"])
            _load_in(self.up_norm, p["up_norm"])
        elif self.adapt is not None:
            self.adapt.weight.data = _conv_w(p["adapt"]["kernel"])
        for i, (conv, norm) in enumerate(zip(self.stages, self.norms)):
            conv.weight.data = _conv_w(p[f"conv{i}"]["kernel"])
            _load_in(norm, p[f"norm{i}"])


def _randomize(tree, rng):
    out = {}
    for k, v in tree.items():
        out[k] = (_randomize(v, rng) if isinstance(v, dict)
                  else rng.randn(*v.shape).astype(np.float32) * 0.3)
    return out


def test_dints_retrain_forward_matches_torch_transplant():
    from unet3d_tpu.models.dints import DiNTS, TopologyInstance

    space = TopologyInstance(arch_code=(CODE_A, CODE_C), channel_mul=MUL,
                             num_blocks=BLOCKS, num_depths=DEPTHS)
    model = DiNTS(dints_space=space, in_channels=1, num_classes=2)
    rng = np.random.RandomState(12)
    x = rng.randn(1, 16, 16, 16, 1).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                           False)
    params = _randomize(jax.device_get(variables["params"]), rng)
    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x), False))

    f = space.filter_nums  # [4, 8]
    edges = space.edges    # [(0,0), (1,0), (0,1), (1,1)]

    stem = torch.nn.Conv3d(1, f[0], 3, stride=2, padding=1, bias=False)
    stem_norm = _in(f[0])
    stem.weight.data = _conv_w(params["stem"]["kernel"])
    _load_in(stem_norm, params["stem_norm"])
    stem_down1 = torch.nn.Conv3d(f[0], f[1], 3, stride=2, padding=1,
                                 bias=False)
    stem_norm1 = _in(f[1])
    stem_down1.weight.data = _conv_w(params["stem_down1"]["kernel"])
    _load_in(stem_norm1, params["stem_norm1"])

    cells = {}
    for b in range(BLOCKS):
        for e, (src, dst) in enumerate(edges):
            cell = TorchCellOp(f[src], f[dst], CODE_C[b][e], dst - src).eval()
            cell.load(params[f"b{b}_e{e}"])
            cells[(b, e)] = cell

    proj = {}
    for d in range(DEPTHS):
        pr = torch.nn.Conv3d(f[d], f[0], 1, bias=False)
        pr.weight.data = _conv_w(params[f"head_proj{d}"]["kernel"])
        proj[d] = pr
    head_norm = _in(f[0])
    _load_in(head_norm, params["head_norm"])
    head_up = torch.nn.ConvTranspose3d(f[0], f[0], 2, stride=2)
    head_up.weight.data = _transp_w(params["head_up"]["kernel"])
    head_up.bias.data = _t(params["head_up"]["bias"])
    head_up_norm = _in(f[0])
    _load_in(head_up_norm, params["head_up_norm"])
    out_conv = torch.nn.Conv3d(f[0], 2, 1)
    out_conv.weight.data = _conv_w(params["output"]["kernel"])
    out_conv.bias.data = _t(params["output"]["bias"])

    interp = torch.nn.functional.interpolate
    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        s0 = stem_norm(stem(xt))
        s1 = stem_norm1(stem_down1(torch.relu(s0)))
        states = [s0, s1]
        for b in range(BLOCKS):
            incoming = [[] for _ in range(DEPTHS)]
            for e, (src, dst) in enumerate(edges):
                incoming[dst].append(cells[(b, e)](states[src]))
            states = [sum(vs) for vs in incoming]
        outs = []
        for d in range(DEPTHS):
            h = proj[d](torch.relu(states[d]))
            if d > 0:
                h = interp(h, scale_factor=2 ** d, mode="trilinear",
                           align_corners=False)
            outs.append(h)
        y = torch.relu(head_norm(sum(outs)))
        y = torch.relu(head_up_norm(head_up(y)))
        y_t = out_conv(y)

    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=5e-4, atol=5e-4)
