"""VNet weight-transplant parity vs an independent torch build.

Fifth zoo model with transplant parity (after DynUNet, SegResNet, UNETR,
AttentionUnet). VNet pins conventions none of the others reach: 5-cubed
stride-1 convs through the decomp2d path, k=2/s=2 down convs (VALID), the
k=s subpixel transposed-conv formulation at four widths, ELU, and the
broadcast-repeat input residual of Milletari's InputTransition.

monai is not installed in this image, so the torch network below is an
independent re-implementation of `monai.networks.nets.VNet` forward
semantics built from torch primitives only. Eval mode: BatchNorm running
stats are randomized and transplanted; dropout layers are inert.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _load_bn(bn, params, stats):
    bn.weight.data = _t(params["scale"])
    bn.bias.data = _t(params["bias"])
    bn.running_mean.data = _t(stats["mean"])
    bn.running_var.data = _t(stats["var"])


class TorchLUConv(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = torch.nn.Conv3d(ch, ch, 5, padding=2, bias=False)
        self.bn = torch.nn.BatchNorm3d(ch)

    def forward(self, x):
        return torch.nn.functional.elu(self.bn(self.conv(x)))

    def load(self, params, stats):
        self.conv.weight.data = _conv_w(params["conv"]["kernel"])
        _load_bn(self.bn, params["bn"], stats["bn"])


class TorchInputTransition(torch.nn.Module):
    def __init__(self, in_ch, out_ch=16):
        super().__init__()
        self.in_ch = in_ch
        self.out_ch = out_ch
        self.conv = torch.nn.Conv3d(in_ch, out_ch, 5, padding=2, bias=False)
        self.bn = torch.nn.BatchNorm3d(out_ch)

    def forward(self, x):
        y = self.bn(self.conv(x))
        x16 = x.repeat(1, self.out_ch // self.in_ch, 1, 1, 1)
        return torch.nn.functional.elu(y + x16)

    def load(self, params, stats):
        self.conv.weight.data = _conv_w(params["conv"]["kernel"])
        _load_bn(self.bn, params["bn"], stats["bn"])


class TorchDownTransition(torch.nn.Module):
    def __init__(self, in_ch, n_convs):
        super().__init__()
        out_ch = 2 * in_ch
        self.down_conv = torch.nn.Conv3d(in_ch, out_ch, 2, stride=2, bias=False)
        self.bn = torch.nn.BatchNorm3d(out_ch)
        self.convs = torch.nn.ModuleList(TorchLUConv(out_ch)
                                         for _ in range(n_convs))

    def forward(self, x):
        f = torch.nn.functional
        down = f.elu(self.bn(self.down_conv(x)))
        y = down
        for conv in self.convs:
            y = conv(y)
        return f.elu(y + down)

    def load(self, params, stats):
        self.down_conv.weight.data = _conv_w(params["down_conv"]["kernel"])
        _load_bn(self.bn, params["bn"], stats["bn"])
        for i, conv in enumerate(self.convs):
            conv.load(params[f"conv{i}"], stats[f"conv{i}"])


class TorchUpTransition(torch.nn.Module):
    def __init__(self, in_ch, out_ch, n_convs):
        super().__init__()
        self.up_conv = torch.nn.ConvTranspose3d(in_ch, out_ch // 2, 2,
                                                stride=2, bias=False)
        self.bn = torch.nn.BatchNorm3d(out_ch // 2)
        self.convs = torch.nn.ModuleList(TorchLUConv(out_ch)
                                         for _ in range(n_convs))

    def forward(self, x, skip):
        f = torch.nn.functional
        up = f.elu(self.bn(self.up_conv(x)))
        xcat = torch.cat([up, skip], dim=1)
        y = xcat
        for conv in self.convs:
            y = conv(y)
        return f.elu(y + xcat)

    def load(self, params, stats):
        self.up_conv.weight.data = _transp_w(params["up_conv"]["kernel"])
        _load_bn(self.bn, params["bn"], stats["bn"])
        for i, conv in enumerate(self.convs):
            conv.load(params[f"conv{i}"], stats[f"conv{i}"])


class TorchOutputTransition(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = torch.nn.Conv3d(in_ch, out_ch, 5, padding=2, bias=False)
        self.bn = torch.nn.BatchNorm3d(out_ch)
        self.conv2 = torch.nn.Conv3d(out_ch, out_ch, 1)

    def forward(self, x):
        return self.conv2(torch.nn.functional.elu(self.bn(self.conv(x))))

    def load(self, params, stats):
        self.conv.weight.data = _conv_w(params["conv"]["kernel"])
        _load_bn(self.bn, params["bn"], stats["bn"])
        self.conv2.weight.data = _conv_w(params["conv2"]["kernel"])
        self.conv2.bias.data = _t(params["conv2"]["bias"])


class TorchVNet(torch.nn.Module):
    def __init__(self, in_ch=1, out_ch=2):
        super().__init__()
        self.in_tr = TorchInputTransition(in_ch, 16)
        self.down_tr32 = TorchDownTransition(16, 1)
        self.down_tr64 = TorchDownTransition(32, 2)
        self.down_tr128 = TorchDownTransition(64, 3)
        self.down_tr256 = TorchDownTransition(128, 2)
        self.up_tr256 = TorchUpTransition(256, 256, 2)
        self.up_tr128 = TorchUpTransition(256, 128, 2)
        self.up_tr64 = TorchUpTransition(128, 64, 1)
        self.up_tr32 = TorchUpTransition(64, 32, 1)
        self.out_tr = TorchOutputTransition(32, out_ch)

    def forward(self, x):
        x16 = self.in_tr(x)
        d32 = self.down_tr32(x16)
        d64 = self.down_tr64(d32)
        d128 = self.down_tr128(d64)
        d256 = self.down_tr256(d128)
        u256 = self.up_tr256(d256, d128)
        u128 = self.up_tr128(u256, d64)
        u64 = self.up_tr64(u128, d32)
        u32 = self.up_tr32(u64, x16)
        return self.out_tr(u32)

    def load(self, params, stats):
        for name in ("in_tr", "down_tr32", "down_tr64", "down_tr128",
                     "down_tr256", "up_tr256", "up_tr128", "up_tr64",
                     "up_tr32", "out_tr"):
            getattr(self, name).load(params[name], stats[name])


def test_vnet_forward_matches_torch_transplant():
    from unet3d_tpu.models.vnet import VNet

    rng = np.random.RandomState(11)
    x = rng.randn(1, 16, 16, 16, 1).astype(np.float32)

    model = VNet(in_channels=1, out_channels=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    stats = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.asarray(
            np.abs(rng.randn(*leaf.shape)).astype(np.float32) + 0.5
            if path[-1].key == "var"
            else rng.randn(*leaf.shape).astype(np.float32) * 0.3),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    y_jax = np.asarray(model.apply(variables, jnp.asarray(x), False))

    tnet = TorchVNet()
    tnet.load(jax.tree_util.tree_map(np.asarray, variables["params"]),
              jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
    tnet.eval()
    with torch.no_grad():
        y_torch = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3).copy()))
    y_torch = y_torch.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_jax, y_torch, atol=3e-4, rtol=3e-4)
