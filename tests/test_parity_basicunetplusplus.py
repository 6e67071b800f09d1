"""BasicUNetPlusPlus (UNet++) weight-transplant parity vs a torch build.

Pins the nested-column topology on top of the TwoConv/UpCat conventions the
BasicUNet transplant (test_parity_basicunet.py) established: dense same-row
skip concatenation (skips first, upsampled last), halves=False on the top
row, and the deep-supervision heads.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.BasicUNetPlusPlus``
forward semantics built from torch primitives only (eval; dropout 0).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FEA = (4, 4, 8, 8, 8, 4)


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
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
        return self.convs(torch.cat([skip, x], dim=1))

    def load(self, p):
        self.up.weight.data = _transp_w(p["upsample"]["kernel"])
        self.up.bias.data = _t(p["upsample"]["bias"])
        self.convs.load(p["convs"])


def test_basicunetplusplus_transplant_forward_parity():
    from unet3d_tpu.models.basicunetplusplus import BasicUNetPlusPlus

    fea = FEA
    model = BasicUNetPlusPlus(in_channels=2, out_channels=3, features=fea,
                              deep_supervision=True)
    rng = np.random.RandomState(6)
    # 32-cubed: the 1/16 bottom row must be >1 voxel per axis for
    # torch InstanceNorm3d (functional.py _verify_spatial_size)
    x = rng.randn(1, 32, 32, 32, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def _randomize(tree):
        out = {}
        for k, v in tree.items():
            out[k] = (_randomize(v) if isinstance(v, dict)
                      else rng.randn(*v.shape).astype(np.float32) * 0.3)
        return out

    params = _randomize(jax.device_get(variables["params"]))
    y_eval = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                    train=False))
    y_train = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                     train=True))
    assert y_train.shape == (1, 4) + y_eval.shape[1:]

    # ---- torch replica ----
    two = {name: TorchTwoConv(i, o).eval() for name, i, o in [
        ("conv_0_0", 2, fea[0]), ("conv_1_0", fea[0], fea[1]),
        ("conv_2_0", fea[1], fea[2]), ("conv_3_0", fea[2], fea[3]),
        ("conv_4_0", fea[3], fea[4])]}
    ups = {name: TorchUpCat(i, u, c, o).eval() for name, i, u, c, o in [
        ("upcat_0_1", fea[1], fea[1], fea[0], fea[0]),
        ("upcat_1_1", fea[2], fea[2] // 2, fea[1], fea[1]),
        ("upcat_0_2", fea[1], fea[1], 2 * fea[0], fea[0]),
        ("upcat_2_1", fea[3], fea[3] // 2, fea[2], fea[2]),
        ("upcat_1_2", fea[2], fea[2] // 2, 2 * fea[1], fea[1]),
        ("upcat_0_3", fea[1], fea[1], 3 * fea[0], fea[0]),
        ("upcat_3_1", fea[4], fea[4] // 2, fea[3], fea[3]),
        ("upcat_2_2", fea[3], fea[3] // 2, 2 * fea[2], fea[2]),
        ("upcat_1_3", fea[2], fea[2] // 2, 3 * fea[1], fea[1]),
        ("upcat_0_4", fea[1], fea[1], 4 * fea[0], fea[5])]}
    heads = {}
    for j, cin in [(1, fea[0]), (2, fea[0]), (3, fea[0]), (4, fea[5])]:
        h = torch.nn.Conv3d(cin, 3, 1)
        p = params[f"final_conv_0_{j}"]
        h.weight.data = _conv_w(p["kernel"])
        h.bias.data = _t(p["bias"])
        heads[j] = h
    for name, mod in {**two, **ups}.items():
        mod.load(params[name])

    pool = torch.nn.functional.max_pool3d
    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        x00 = two["conv_0_0"](xt)
        x10 = two["conv_1_0"](pool(x00, 2))
        x01 = ups["upcat_0_1"](x10, x00)
        x20 = two["conv_2_0"](pool(x10, 2))
        x11 = ups["upcat_1_1"](x20, x10)
        x02 = ups["upcat_0_2"](x11, torch.cat([x00, x01], 1))
        x30 = two["conv_3_0"](pool(x20, 2))
        x21 = ups["upcat_2_1"](x30, x20)
        x12 = ups["upcat_1_2"](x21, torch.cat([x10, x11], 1))
        x03 = ups["upcat_0_3"](x12, torch.cat([x00, x01, x02], 1))
        x40 = two["conv_4_0"](pool(x30, 2))
        x31 = ups["upcat_3_1"](x40, x30)
        x22 = ups["upcat_2_2"](x31, torch.cat([x20, x21], 1))
        x13 = ups["upcat_1_3"](x22, torch.cat([x10, x11, x12], 1))
        x04 = ups["upcat_0_4"](x13, torch.cat([x00, x01, x02, x03], 1))
        outs = [heads[1](x01), heads[2](x02), heads[3](x03), heads[4](x04)]
    to_ndhwc = lambda t: t.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_eval, to_ndhwc(outs[-1]), rtol=2e-4,
                               atol=2e-4)
    y_t_stack = np.stack([to_ndhwc(o) for o in outs], axis=1)
    np.testing.assert_allclose(y_train, y_t_stack, rtol=2e-4, atol=2e-4)
