"""MONAI AutoEncoder / VarAutoEncoder weight-transplant parity vs torch.

Extends the Convolution/ResidualUnit conventions pinned by
test_parity_monai_unet.py with what the autoencoder family adds: dilated
intermediate stages (torch padding = dilation), the reversed transposed-conv
decode stack with its last-stage conv_only/last_conv_only rules, and the
VarAutoEncoder latent path (flatten -> Dense mu/logvar -> decode Dense ->
relu -> reshape -> sigmoid). The flatten order is NDHWC (this framework's
device layout); the torch replica permutes to channels-last before
flattening to pin that convention explicitly.

monai is not installed in this image; the torch networks below are
independent re-implementations of the MONAI forward semantics.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _lin(linear, p):
    linear.weight.data = _t(p["kernel"]).T.contiguous()
    linear.bias.data = _t(p["bias"])


class TorchConvolution(torch.nn.Module):
    def __init__(self, in_ch, out_ch, strides=1, kernel_size=3, dilation=1,
                 is_transposed=False, conv_only=False):
        super().__init__()
        if is_transposed:
            self.conv = torch.nn.ConvTranspose3d(
                in_ch, out_ch, kernel_size, stride=strides,
                padding=(kernel_size - 1) // 2, output_padding=strides - 1)
        else:
            self.conv = torch.nn.Conv3d(
                in_ch, out_ch, kernel_size, stride=strides,
                padding=(kernel_size - 1) // 2 * dilation, dilation=dilation)
        self.conv_only = conv_only
        if not conv_only:
            self.norm = torch.nn.InstanceNorm3d(out_ch, affine=False)
            self.act = torch.nn.PReLU(num_parameters=1)

    def forward(self, x):
        x = self.conv(x)
        return x if self.conv_only else self.act(self.norm(x))

    def load(self, p):
        w = (_transp_w if isinstance(self.conv, torch.nn.ConvTranspose3d)
             else _conv_w)
        self.conv.weight.data = w(p["conv"]["kernel"])
        self.conv.bias.data = _t(p["conv"]["bias"])
        if not self.conv_only:
            self.act.weight.data = _t(p["act0"]["alpha"])


class TorchResidualUnit(torch.nn.Module):
    def __init__(self, in_ch, out_ch, strides=1, subunits=2, dilation=1,
                 last_conv_only=False):
        super().__init__()
        self.convs = torch.nn.ModuleList()
        self.acts = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        self.with_adn = []
        ch = in_ch
        for i in range(max(1, subunits)):
            s = strides if i == 0 else 1
            self.convs.append(torch.nn.Conv3d(
                ch, out_ch, 3, stride=s, padding=dilation, dilation=dilation))
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


def _randomize(tree, rng):
    out = {}
    for k, v in tree.items():
        out[k] = (_randomize(v, rng) if isinstance(v, dict)
                  else rng.randn(*v.shape).astype(np.float32) * 0.3)
    return out


def test_autoencoder_transplant_forward_parity():
    from unet3d_tpu.models.monai_autoencoder import AutoEncoder

    model = AutoEncoder(in_channels=2, out_channels=2, channels=(4, 8),
                        strides=(2, 2), num_res_units=2,
                        inter_channels=(8,), inter_dilations=(2,),
                        num_inter_units=2)
    rng = np.random.RandomState(7)
    x = rng.randn(1, 16, 16, 16, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)
    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                   train=False))

    enc0 = TorchResidualUnit(2, 4, strides=2).eval()
    enc1 = TorchResidualUnit(4, 8, strides=2).eval()
    inter = TorchResidualUnit(8, 8, strides=1, subunits=2, dilation=2).eval()
    dec0_t = TorchConvolution(8, 4, strides=2, is_transposed=True).eval()
    dec0_ru = TorchResidualUnit(4, 4, subunits=1).eval()
    dec1_t = TorchConvolution(4, 2, strides=2, is_transposed=True).eval()
    dec1_ru = TorchResidualUnit(2, 2, subunits=1, last_conv_only=True).eval()
    enc0.load(params["encode_0"])
    enc1.load(params["encode_1"])
    inter.load(params["inter_0"])
    dec0_t.load(params["decode_0"])
    dec0_ru.load(params["decode_0_ru"])
    dec1_t.load(params["decode_1"])
    dec1_ru.load(params["decode_1_ru"])
    with torch.no_grad():
        h = inter(enc1(enc0(_t(x.transpose(0, 4, 1, 2, 3)))))
        y_t = dec1_ru(dec1_t(dec0_ru(dec0_t(h))))
    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=2e-4, atol=2e-4)


def test_varautoencoder_transplant_forward_parity():
    from unet3d_tpu.models.monai_autoencoder import VarAutoEncoder

    model = VarAutoEncoder(in_shape=(1, 16, 16, 16), out_channels=1,
                           latent_size=8, channels=(4, 8), strides=(2, 2),
                           num_res_units=0)
    rng = np.random.RandomState(8)
    x = rng.randn(1, 16, 16, 16, 1).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)
    recon, mu, logvar, z = model.apply({"params": params}, jnp.asarray(x),
                                       train=False)
    assert np.allclose(np.asarray(z), np.asarray(mu))  # eval: z = mu

    enc0 = TorchConvolution(1, 4, strides=2).eval()
    enc1 = TorchConvolution(4, 8, strides=2).eval()
    dec0 = TorchConvolution(8, 4, strides=2, is_transposed=True).eval()
    dec1 = TorchConvolution(4, 1, strides=2, is_transposed=True,
                            conv_only=True).eval()
    enc0.load(params["encode_0"])
    enc1.load(params["encode_1"])
    dec0.load(params["decode_0"])
    dec1.load(params["decode_1"])
    mu_l = torch.nn.Linear(8 * 4 * 4 * 4, 8)
    logvar_l = torch.nn.Linear(8 * 4 * 4 * 4, 8)
    decode_l = torch.nn.Linear(8, 8 * 4 * 4 * 4)
    _lin(mu_l, params["mu"])
    _lin(logvar_l, params["logvar"])
    _lin(decode_l, params["decodeL"])
    with torch.no_grad():
        h = enc1(enc0(_t(x.transpose(0, 4, 1, 2, 3))))
        # NDHWC flatten convention: channels last before flattening
        flat = h.permute(0, 2, 3, 4, 1).reshape(1, -1)
        mu_t = mu_l(flat)
        y = torch.relu(decode_l(mu_t))
        y = y.reshape(1, 4, 4, 4, 8).permute(0, 4, 1, 2, 3)
        y_t = torch.sigmoid(dec1(dec0(y)))
        logvar_t = logvar_l(flat)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), logvar_t.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(recon),
                               y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=2e-4, atol=2e-4)
