"""HighResNet weight-transplant parity vs an independent torch build.

Pins conventions the other transplants don't reach: dilated (d=2/4) 3-cubed
SAME convs (torch padding=dilation symmetric), pre-activation BN->ReLU->conv
residual pairs, symmetric zero ChannelPad on channel growth, and the
pointwise BN'd head stack.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.HighResNet`` forward
semantics (default 3D layer plan) built from torch primitives only. Eval
mode: BatchNorm running stats are randomized and transplanted.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _load_bn(bn, params, stats):
    bn.weight.data = _t(params["scale"])
    bn.bias.data = _t(params["bias"])
    bn.running_mean.data = _t(stats["mean"])
    bn.running_var.data = _t(stats["var"])


class TorchHighResBlock(torch.nn.Module):
    def __init__(self, in_ch, out_ch, dilation):
        super().__init__()
        self.out_ch = out_ch
        self.bn0 = torch.nn.BatchNorm3d(in_ch)
        self.conv0 = torch.nn.Conv3d(in_ch, out_ch, 3, padding=dilation,
                                     dilation=dilation, bias=False)
        self.bn1 = torch.nn.BatchNorm3d(out_ch)
        self.conv1 = torch.nn.Conv3d(out_ch, out_ch, 3, padding=dilation,
                                     dilation=dilation, bias=False)

    def forward(self, x):
        y = self.conv0(torch.relu(self.bn0(x)))
        y = self.conv1(torch.relu(self.bn1(y)))
        identity = x
        if x.shape[1] != self.out_ch:
            total = self.out_ch - x.shape[1]
            identity = torch.nn.functional.pad(
                x, (0, 0, 0, 0, 0, 0, total // 2, total - total // 2))
        return y + identity

    def load(self, p, s):
        _load_bn(self.bn0, p["bn0"], s["bn0"])
        self.conv0.weight.data = _conv_w(p["conv0"]["kernel"])
        _load_bn(self.bn1, p["bn1"], s["bn1"])
        self.conv1.weight.data = _conv_w(p["conv1"]["kernel"])


class TorchHighResNet(torch.nn.Module):
    def __init__(self, in_ch=1, out_ch=2):
        super().__init__()
        self.conv_0 = torch.nn.Conv3d(in_ch, 16, 3, padding=1, bias=False)
        self.bn_0 = torch.nn.BatchNorm3d(16)
        blocks = []
        ch = 16
        for features, dilation in [(16, 1), (32, 2), (64, 4)]:
            for _ in range(3):
                blocks.append(TorchHighResBlock(ch, features, dilation))
                ch = features
        self.blocks = torch.nn.ModuleList(blocks)
        self.conv_1 = torch.nn.Conv3d(64, 80, 1, bias=False)
        self.bn_1 = torch.nn.BatchNorm3d(80)
        self.conv_2 = torch.nn.Conv3d(80, out_ch, 1, bias=True)

    def forward(self, x):
        x = torch.relu(self.bn_0(self.conv_0(x)))
        for b in self.blocks:
            x = b(x)
        x = torch.relu(self.bn_1(self.conv_1(x)))
        return self.conv_2(x)

    def load(self, params, stats):
        self.conv_0.weight.data = _conv_w(params["conv_0"]["kernel"])
        _load_bn(self.bn_0, params["bn_0"], stats["bn_0"])
        i = 0
        for li in range(1, 4):
            for r in range(3):
                name = f"res_{li}_{r}"
                self.blocks[i].load(params[name], stats[name])
                i += 1
        self.conv_1.weight.data = _conv_w(params["conv_1"]["kernel"])
        _load_bn(self.bn_1, params["bn_1"], stats["bn_1"])
        self.conv_2.weight.data = _conv_w(params["conv_2"]["kernel"])
        self.conv_2.bias.data = _t(params["conv_2"]["bias"])


def test_highresnet_forward_matches_torch_transplant():
    from unet3d_tpu.models.highresnet import HighResNet

    model = HighResNet(in_channels=1, out_channels=2)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 8, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    # randomize BN running stats so eval-mode normalization is non-trivial
    def _randomize(tree):
        flat = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                flat[k] = _randomize(v)
            elif k == "mean":
                flat[k] = rng.randn(*v.shape).astype(np.float32) * 0.3
            elif k == "var":
                flat[k] = (0.5 + rng.rand(*v.shape).astype(np.float32))
            else:
                flat[k] = v
        return flat

    stats = _randomize(stats)
    # randomize conv weights/BN affine too (init may be zeros for scale-free
    # layers; we want a non-degenerate comparison)
    def _randw(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = _randw(v)
            else:
                out[k] = rng.randn(*v.shape).astype(np.float32) * 0.2
        return out

    params = _randw(params)
    variables = {"params": params, "batch_stats": stats}

    y_jax = model.apply(variables, jnp.asarray(x), train=False)
    y_jax = np.asarray(y_jax)  # NDHWC

    tnet = TorchHighResNet(in_ch=1, out_ch=2).eval()
    tnet.load(params, stats)
    with torch.no_grad():
        y_t = tnet(_t(x.transpose(0, 4, 1, 2, 3)))
    y_t = y_t.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)
