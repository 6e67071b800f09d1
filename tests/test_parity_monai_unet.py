"""MONAI generic ``UNet`` weight-transplant parity vs an independent torch build.

Pins the recursive-block topology (down -> recurse -> skip-concat -> up),
Convolution's conv->InstanceNorm->Dropout->PReLU ADN ordering, the
ResidualUnit with a strided 1x1 projection, the k=3/s=2/p=1/op=1 transposed
up-convolution, and the top-block conv_only / last_conv_only rules — for both
``num_res_units=0`` (plain Convolution blocks) and ``num_res_units=2``.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.UNet`` forward
semantics built from torch primitives only.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CHANNELS = (4, 8, 16)
STRIDES = (2, 2)


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):  # flax ConvTranspose (tap-reversed) -> torch (I,O,D,H,W)
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


class TorchConvolution(torch.nn.Module):
    """monai.networks.blocks.Convolution: conv -> IN -> (dropout) -> PReLU."""

    def __init__(self, in_ch, out_ch, strides=1, kernel_size=3,
                 is_transposed=False, conv_only=False):
        super().__init__()
        if is_transposed:
            self.conv = torch.nn.ConvTranspose3d(
                in_ch, out_ch, kernel_size, stride=strides,
                padding=(kernel_size - 1) // 2, output_padding=strides - 1)
        else:
            self.conv = torch.nn.Conv3d(in_ch, out_ch, kernel_size,
                                        stride=strides,
                                        padding=(kernel_size - 1) // 2)
        self.conv_only = conv_only
        if not conv_only:
            self.norm = torch.nn.InstanceNorm3d(out_ch, affine=False)
            self.act = torch.nn.PReLU(num_parameters=1)

    def forward(self, x):
        x = self.conv(x)
        if self.conv_only:
            return x
        return self.act(self.norm(x))

    def load(self, p):
        if isinstance(self.conv, torch.nn.ConvTranspose3d):
            self.conv.weight.data = _transp_w(p["conv"]["kernel"])
        else:
            self.conv.weight.data = _conv_w(p["conv"]["kernel"])
        self.conv.bias.data = _t(p["conv"]["bias"])
        if not self.conv_only:
            self.act.weight.data = _t(p["act0"]["alpha"])


class TorchResidualUnit(torch.nn.Module):
    def __init__(self, in_ch, out_ch, strides=1, subunits=2,
                 last_conv_only=False):
        super().__init__()
        self.convs = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        self.acts = torch.nn.ModuleList()
        self.with_adn = []
        ch = in_ch
        for i in range(max(1, subunits)):
            s = strides if i == 0 else 1
            self.convs.append(torch.nn.Conv3d(ch, out_ch, 3, stride=s,
                                              padding=1))
            adn = not (last_conv_only and i == subunits - 1)
            self.with_adn.append(adn)
            self.norms.append(torch.nn.InstanceNorm3d(out_ch, affine=False)
                              if adn else torch.nn.Identity())
            self.acts.append(torch.nn.PReLU(num_parameters=1)
                             if adn else torch.nn.Identity())
            ch = out_ch
        self.residual = None
        if strides != 1 or in_ch != out_ch:
            self.residual = torch.nn.Conv3d(in_ch, out_ch, 1, stride=strides)

    def forward(self, x):
        identity = x
        y = x
        for conv, norm, act in zip(self.convs, self.norms, self.acts):
            y = act(norm(conv(y)))
        if self.residual is not None:
            identity = self.residual(identity)
        return y + identity

    def load(self, p):
        for i, conv in enumerate(self.convs):
            conv.weight.data = _conv_w(p[f"conv{i}"]["kernel"])
            conv.bias.data = _t(p[f"conv{i}"]["bias"])
            if self.with_adn[i]:
                self.acts[i].weight.data = _t(p[f"act{i}"]["alpha"])
        if self.residual is not None:
            self.residual.weight.data = _conv_w(p["residual"]["kernel"])
            self.residual.bias.data = _t(p["residual"]["bias"])


class TorchMonaiUNet(torch.nn.Module):
    """channels=(4,8,16), strides=(2,2) instance of the recursive topology."""

    def __init__(self, in_ch, out_ch, num_res_units):
        super().__init__()
        nru = num_res_units
        c0, c1, c2 = CHANNELS
        if nru > 0:
            self.down_0 = TorchResidualUnit(in_ch, c0, 2, nru)
            self.down_1 = TorchResidualUnit(c0, c1, 2, nru)
            self.bottom_2 = TorchResidualUnit(c1, c2, 1, nru)
        else:
            self.down_0 = TorchConvolution(in_ch, c0, 2)
            self.down_1 = TorchConvolution(c0, c1, 2)
            self.bottom_2 = TorchConvolution(c1, c2, 1)
        self.up_1_t = TorchConvolution(c1 + c2, c0, 2, is_transposed=True,
                                       conv_only=False)
        self.up_0_t = TorchConvolution(c0 + c0, out_ch, 2, is_transposed=True,
                                       conv_only=(nru == 0))
        self.up_1_ru = self.up_0_ru = None
        if nru > 0:
            self.up_1_ru = TorchResidualUnit(c0, c0, 1, 1)
            self.up_0_ru = TorchResidualUnit(out_ch, out_ch, 1, 1,
                                             last_conv_only=True)

    def forward(self, x):
        h0 = self.down_0(x)
        h1 = self.down_1(h0)
        inner = self.bottom_2(h1)
        u1 = self.up_1_t(torch.cat([h1, inner], dim=1))
        if self.up_1_ru is not None:
            u1 = self.up_1_ru(u1)
        u0 = self.up_0_t(torch.cat([h0, u1], dim=1))
        if self.up_0_ru is not None:
            u0 = self.up_0_ru(u0)
        return u0

    def load(self, params):
        for name in ["down_0", "down_1", "bottom_2", "up_1_t", "up_0_t",
                     "up_1_ru", "up_0_ru"]:
            mod = getattr(self, name)
            if mod is not None and name in params:
                mod.load(params[name])


def _randomize(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize(v, rng)
        else:
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.3
    return out


@pytest.mark.parametrize("num_res_units", [0, 2])
def test_monai_unet_forward_matches_torch_transplant(num_res_units):
    from unet3d_tpu.models.monai_unet import UNet

    model = UNet(in_channels=2, out_channels=3, channels=CHANNELS,
                 strides=STRIDES, num_res_units=num_res_units)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 8, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)

    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                   train=False))

    tnet = TorchMonaiUNet(2, 3, num_res_units).eval()
    tnet.load(params)
    with torch.no_grad():
        y_t = tnet(_t(x.transpose(0, 4, 1, 2, 3)))
    y_t = y_t.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)
