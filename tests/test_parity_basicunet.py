"""BasicUNet weight-transplant parity vs an independent torch build.

Sixth zoo model with transplant parity (after DynUNet, SegResNet, UNETR,
AttentionUnet, VNet). BasicUNet pins the TwoConv/UpCat conventions the
UNet++ (BasicUNetPlusPlus) shares: conv3(SAME, bias) -> InstanceNorm(affine)
-> LeakyReLU(0.1), 2-cubed max-pool downs, k2/s2 transposed-conv ups with the
skip concatenated FIRST (MONAI ``torch.cat([x_e, x_0])``), pointwise head.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.BasicUNet`` forward
semantics built from torch primitives only (eval mode; dropout fields 0).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FEA = (4, 4, 8, 8, 8, 4)


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):  # flax ConvTranspose convention -> torch (I,O,D,H,W)
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


class TorchConvNormAct(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = torch.nn.Conv3d(in_ch, out_ch, 3, padding=1, bias=True)
        self.norm = torch.nn.InstanceNorm3d(out_ch, affine=True)

    def forward(self, x):
        return torch.nn.functional.leaky_relu(self.norm(self.conv(x)), 0.1)

    def load(self, p):
        self.conv.weight.data = _conv_w(p["conv"]["kernel"])
        self.conv.bias.data = _t(p["conv"]["bias"])
        self.norm.weight.data = _t(p["norm"]["scale"])
        self.norm.bias.data = _t(p["norm"]["bias"])


class TorchTwoConv(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.c0 = TorchConvNormAct(in_ch, out_ch)
        self.c1 = TorchConvNormAct(out_ch, out_ch)

    def forward(self, x):
        return self.c1(self.c0(x))

    def load(self, p):
        self.c0.load(p["conv_0"])
        self.c1.load(p["conv_1"])


class TorchUpCat(torch.nn.Module):
    def __init__(self, in_ch, up_ch, cat_ch, out_ch):
        super().__init__()
        self.up = torch.nn.ConvTranspose3d(in_ch, up_ch, 2, stride=2)
        self.convs = TorchTwoConv(up_ch + cat_ch, out_ch)

    def forward(self, x, skip):
        x = self.up(x)
        # MONAI UpCat: torch.cat([x_e (skip), x_0 (upsampled)], dim=1)
        return self.convs(torch.cat([skip, x], dim=1))

    def load(self, p):
        self.up.weight.data = _transp_w(p["upsample"]["kernel"])
        self.up.bias.data = _t(p["upsample"]["bias"])
        self.convs.load(p["convs"])


class TorchBasicUNet(torch.nn.Module):
    def __init__(self, in_ch=2, out_ch=3, fea=FEA):
        super().__init__()
        self.conv_0 = TorchTwoConv(in_ch, fea[0])
        self.down_1 = TorchTwoConv(fea[0], fea[1])
        self.down_2 = TorchTwoConv(fea[1], fea[2])
        self.down_3 = TorchTwoConv(fea[2], fea[3])
        self.down_4 = TorchTwoConv(fea[3], fea[4])
        self.upcat_4 = TorchUpCat(fea[4], fea[4] // 2, fea[3], fea[3])
        self.upcat_3 = TorchUpCat(fea[3], fea[3] // 2, fea[2], fea[2])
        self.upcat_2 = TorchUpCat(fea[2], fea[2] // 2, fea[1], fea[1])
        self.upcat_1 = TorchUpCat(fea[1], fea[1], fea[0], fea[5])
        self.final = torch.nn.Conv3d(fea[5], out_ch, 1)

    def forward(self, x):
        pool = torch.nn.functional.max_pool3d
        x0 = self.conv_0(x)
        x1 = self.down_1(pool(x0, 2))
        x2 = self.down_2(pool(x1, 2))
        x3 = self.down_3(pool(x2, 2))
        x4 = self.down_4(pool(x3, 2))
        u4 = self.upcat_4(x4, x3)
        u3 = self.upcat_3(u4, x2)
        u2 = self.upcat_2(u3, x1)
        u1 = self.upcat_1(u2, x0)
        return self.final(u1)

    def load(self, params):
        for name in ("conv_0", "down_1", "down_2", "down_3", "down_4",
                     "upcat_4", "upcat_3", "upcat_2", "upcat_1"):
            getattr(self, name).load(params[name])
        self.final.weight.data = _conv_w(params["final_conv"]["kernel"])
        self.final.bias.data = _t(params["final_conv"]["bias"])


def test_basicunet_transplant_forward_parity():
    from unet3d_tpu.models.registry import create_model
    net = create_model("BasicUNet", in_channels=2, out_channels=3,
                       features=FEA)
    rng = np.random.RandomState(0)
    # 32-cubed: the 4th down level is 2-cubed (torch InstanceNorm requires
    # more than one spatial element)
    x = rng.rand(1, 32, 32, 32, 2).astype(np.float32)
    variables = net.init({"params": jax.random.PRNGKey(7)},
                         jnp.asarray(x), False)
    y_jax = np.asarray(net.apply(variables, jnp.asarray(x), False))

    tnet = TorchBasicUNet()
    tnet.load(variables["params"])
    tnet.eval()
    with torch.no_grad():
        y_t = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3).copy()))
    y_t = y_t.numpy().transpose(0, 2, 3, 4, 1)

    assert y_jax.shape == y_t.shape
    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)
