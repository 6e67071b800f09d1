"""Quicknat weight-transplant parity vs an independent torch build.

Pins the TPU-native max-unpooling formulation (masked block-repeat,
models/quicknat.py) against torch's MaxPool2d(return_indices=True) +
MaxUnpool2d, plus the dense-block concat order, PReLU (single slope), and
instance norm.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.Quicknat`` forward
semantics (se_block="None", dropout 0) built from torch primitives only.
Random float inputs make within-window max ties measure-zero, so the
first-max tiebreak never fires.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _conv_w(kernel):  # flax (H,W,I,O) -> torch (O,I,H,W)
    return torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


class TorchDenseBlock(torch.nn.Module):
    def __init__(self, in_ch, nf=8, k=5):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(in_ch, nf, k, padding=k // 2)
        self.conv1 = torch.nn.Conv2d(in_ch + nf, nf, k, padding=k // 2)
        self.conv2 = torch.nn.Conv2d(in_ch + 2 * nf, nf, 1)
        self.norms = torch.nn.ModuleList(
            [torch.nn.InstanceNorm2d(nf, affine=True) for _ in range(3)])
        self.acts = torch.nn.ModuleList(
            [torch.nn.PReLU(num_parameters=1) for _ in range(3)])

    def forward(self, x):
        o1 = self.acts[0](self.norms[0](self.conv0(x)))
        o2 = self.acts[1](self.norms[1](self.conv1(torch.cat([x, o1], 1))))
        return self.acts[2](self.norms[2](
            self.conv2(torch.cat([x, o1, o2], 1))))

    def load(self, p):
        for i, conv in enumerate((self.conv0, self.conv1, self.conv2)):
            conv.weight.data = _conv_w(p[f"conv{i}"]["kernel"])
            conv.bias.data = _t(p[f"conv{i}"]["bias"])
            self.norms[i].weight.data = _t(p[f"norm{i}"]["scale"])
            self.norms[i].bias.data = _t(p[f"norm{i}"]["bias"])
            self.acts[i].weight.data = _t(p[f"act{i}"]["alpha"])


class TorchQuicknat(torch.nn.Module):
    def __init__(self, in_ch=1, nf=8, classes=3):
        super().__init__()
        chans = [in_ch] + [nf] * 4
        self.enc = torch.nn.ModuleList(
            [TorchDenseBlock(c, nf) for c in chans[:4]])
        self.bottleneck = TorchDenseBlock(nf, nf)
        self.dec = torch.nn.ModuleList(
            [TorchDenseBlock(2 * nf, nf) for _ in range(4)])
        self.classifier = torch.nn.Conv2d(nf, classes, 1)

    def forward(self, x):
        pool = torch.nn.functional.max_pool2d
        unpool = torch.nn.functional.max_unpool2d
        skips, idxs = [], []
        for blk in self.enc:
            x = blk(x)
            skips.append(x)
            x, idx = pool(x, 2, return_indices=True)
            idxs.append(idx)
        x = self.bottleneck(x)
        for i in reversed(range(4)):
            x = unpool(x, idxs[i], 2)
            x = self.dec[3 - i](torch.cat([x, skips[i]], 1))
        return self.classifier(x)

    def load(self, params):
        for i in range(4):
            self.enc[i].load(params[f"enc{i}"])
            self.dec[3 - i].load(params[f"dec{i}"])
        self.bottleneck.load(params["bottleneck"])
        self.classifier.weight.data = _conv_w(params["classifier"]["kernel"])
        self.classifier.bias.data = _t(params["classifier"]["bias"])


def test_quicknat_transplant_forward_parity():
    from unet3d_tpu.models.registry import create_model
    net = create_model("Quicknat", num_classes=3, num_channels=1,
                       num_filters=8)
    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 32, 1).astype(np.float32)
    variables = net.init({"params": jax.random.PRNGKey(11)},
                         jnp.asarray(x), False)
    y_jax = np.asarray(net.apply(variables, jnp.asarray(x), False))

    tnet = TorchQuicknat()
    tnet.load(variables["params"])
    tnet.eval()
    with torch.no_grad():
        y_t = tnet(torch.tensor(x.transpose(0, 3, 1, 2).copy()))
    y_t = y_t.numpy().transpose(0, 2, 3, 1)

    assert y_jax.shape == y_t.shape
    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)
