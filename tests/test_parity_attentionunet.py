"""AttentionUnet weight-transplant parity vs an independent torch build.

VERDICT r2 item 2 follow-up: fourth zoo model with transplant parity (after
DynUNet, SegResNet, UNETR). AttentionUnet earned the slot because round 2's
advisor found a real divergence here (the decoder merge was a ConvBlock where
MONAI AttentionLayer.merge is a single default Convolution) — this test locks
the fixed topology against torch primitives.

monai is not installed in this image, so the torch network below is an
independent re-implementation of `monai.networks.nets.AttentionUnet` forward
semantics (Oktay-style additive attention gates over a strided-ConvBlock
encoder) built from torch primitives only. BatchNorm running statistics are
randomized and transplanted so eval-mode BN semantics are pinned too.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    # flax ConvTranspose kernels are tap-reversed relative to torch
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _load_bn(bn: torch.nn.BatchNorm3d, params, stats):
    bn.weight.data = _t(params["scale"])
    bn.bias.data = _t(params["bias"])
    bn.running_mean.data = _t(stats["mean"])
    bn.running_var.data = _t(stats["var"])


class TorchConvBlock(torch.nn.Module):
    """MONAI attentionunet.ConvBlock: 2x (conv3 -> BatchNorm -> ReLU)."""

    def __init__(self, in_ch, out_ch, strides=1):
        super().__init__()
        self.conv0 = torch.nn.Conv3d(in_ch, out_ch, 3, stride=strides, padding=1)
        self.bn0 = torch.nn.BatchNorm3d(out_ch)
        self.conv1 = torch.nn.Conv3d(out_ch, out_ch, 3, padding=1)
        self.bn1 = torch.nn.BatchNorm3d(out_ch)

    def forward(self, x):
        f = torch.nn.functional
        x = f.relu(self.bn0(self.conv0(x)))
        return f.relu(self.bn1(self.conv1(x)))

    def load(self, params, stats):
        self.conv0.weight.data = _conv_w(params["conv0"]["kernel"])
        self.conv0.bias.data = _t(params["conv0"]["bias"])
        _load_bn(self.bn0, params["bn0"], stats["bn0"])
        self.conv1.weight.data = _conv_w(params["conv1"]["kernel"])
        self.conv1.bias.data = _t(params["conv1"]["bias"])
        _load_bn(self.bn1, params["bn1"], stats["bn1"])


class TorchAttentionBlock(torch.nn.Module):
    """x * sigmoid(BN(conv1(relu(BN(W_g g) + BN(W_x x)))))."""

    def __init__(self, f_ch, f_int):
        super().__init__()
        self.W_g = torch.nn.Conv3d(f_ch, f_int, 1)
        self.bn_g = torch.nn.BatchNorm3d(f_int)
        self.W_x = torch.nn.Conv3d(f_ch, f_int, 1)
        self.bn_x = torch.nn.BatchNorm3d(f_int)
        self.psi = torch.nn.Conv3d(f_int, 1, 1)
        self.bn_psi = torch.nn.BatchNorm3d(1)

    def forward(self, g, x):
        f = torch.nn.functional
        a = f.relu(self.bn_g(self.W_g(g)) + self.bn_x(self.W_x(x)))
        return x * torch.sigmoid(self.bn_psi(self.psi(a)))

    def load(self, params, stats):
        for name in ("W_g", "W_x", "psi"):
            conv = getattr(self, name)
            conv.weight.data = _conv_w(params[name]["kernel"])
            conv.bias.data = _t(params[name]["bias"])
        for name in ("bn_g", "bn_x", "bn_psi"):
            _load_bn(getattr(self, name), params[name], stats[name])


class TorchUpConv(torch.nn.Module):
    """transposed conv (k=3, s=2, p=1, op=1) -> BatchNorm -> ReLU."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.up = torch.nn.ConvTranspose3d(in_ch, out_ch, 3, stride=2,
                                           padding=1, output_padding=1)
        self.bn = torch.nn.BatchNorm3d(out_ch)

    def forward(self, x):
        return torch.nn.functional.relu(self.bn(self.up(x)))

    def load(self, params, stats):
        self.up.weight.data = _transp_w(params["up"]["kernel"])
        self.up.bias.data = _t(params["up"]["bias"])
        _load_bn(self.bn, params["bn"], stats["bn"])


class TorchMerge(torch.nn.Module):
    """MONAI AttentionLayer.merge: default Convolution =
    conv3 -> InstanceNorm(affine=False) -> PReLU(single param)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = torch.nn.Conv3d(in_ch, out_ch, 3, padding=1)
        self.norm = torch.nn.InstanceNorm3d(out_ch, eps=1e-5)
        self.act = torch.nn.PReLU()

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))

    def load(self, params):
        self.conv.weight.data = _conv_w(params["conv"]["kernel"])
        self.conv.bias.data = _t(params["conv"]["bias"])
        self.act.weight.data = _t(params["act0"]["alpha"])


class TorchAttentionUnet(torch.nn.Module):
    def __init__(self, in_ch=2, out_ch=2, channels=(4, 8, 16), strides=(2, 2)):
        super().__init__()
        self.channels = channels
        self.conv0 = TorchConvBlock(in_ch, channels[0])
        self.down = torch.nn.ModuleList(
            TorchConvBlock(channels[i - 1], channels[i], strides[i - 1])
            for i in range(1, len(channels)))
        self.upconv = torch.nn.ModuleList(
            TorchUpConv(channels[i + 1], channels[i])
            for i in range(len(channels) - 1))
        self.att = torch.nn.ModuleList(
            TorchAttentionBlock(channels[i], max(channels[i] // 2, 1))
            for i in range(len(channels) - 1))
        self.merge = torch.nn.ModuleList(
            TorchMerge(2 * channels[i], channels[i])
            for i in range(len(channels) - 1))
        self.head = torch.nn.Conv3d(channels[0], out_ch, 1)

    def forward(self, x):
        feats = [self.conv0(x)]
        for down in self.down:
            feats.append(down(feats[-1]))
        y = feats[-1]
        for i in range(len(self.channels) - 2, -1, -1):
            up = self.upconv[i](y)
            att = self.att[i](up, feats[i])
            y = self.merge[i](torch.cat([att, up], dim=1))
        return self.head(y)

    def load(self, params, stats):
        self.conv0.load(params["conv0"], stats["conv0"])
        for i, down in enumerate(self.down, start=1):
            down.load(params[f"down{i}"], stats[f"down{i}"])
        for i in range(len(self.channels) - 1):
            self.upconv[i].load(params[f"upconv{i}"], stats[f"upconv{i}"])
            self.att[i].load(params[f"att{i}"], stats[f"att{i}"])
            self.merge[i].load(params[f"merge{i}"])
        self.head.weight.data = _conv_w(params["head"]["kernel"])
        self.head.bias.data = _t(params["head"]["bias"])


def test_attentionunet_forward_matches_torch_transplant():
    from unet3d_tpu.models.attentionunet import AttentionUnet

    rng = np.random.RandomState(7)
    x = rng.randn(1, 12, 12, 12, 2).astype(np.float32)

    model = AttentionUnet(in_channels=2, out_channels=2,
                          channels=(4, 8, 16), strides=(2, 2))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    # randomize BN running stats so eval-mode BN is pinned, not trivially 0/1
    stats = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.asarray(
            np.abs(rng.randn(*leaf.shape)).astype(np.float32) + 0.5
            if path[-1].key == "var"
            else rng.randn(*leaf.shape).astype(np.float32) * 0.3),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    y_jax = np.asarray(model.apply(variables, jnp.asarray(x), False))

    tnet = TorchAttentionUnet()
    tnet.load(jax.tree_util.tree_map(np.asarray, variables["params"]),
              jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))
    tnet.eval()
    with torch.no_grad():
        y_torch = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3).copy()))
    y_torch = y_torch.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_jax, y_torch, atol=2e-4, rtol=2e-4)
