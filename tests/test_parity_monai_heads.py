"""Regressor / Generator weight-transplant parity vs independent torch builds.

The heads family shares Convolution/ResidualUnit with the MONAI UNet
transplant (test_parity_monai_unet.py); this pins what the heads add: the
Regressor NDHWC flatten -> Dense(out_shape) contract (+ the last stage's
last_conv_only rule) and the Generator latent -> Dense -> channel-first
reshape -> transposed-conv stack decode (Classifier/Discriminator/Critic are
Regressor specializations).

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


class TorchResidualUnit(torch.nn.Module):
    def __init__(self, in_ch, out_ch, strides=1, subunits=2,
                 last_conv_only=False):
        super().__init__()
        self.convs = torch.nn.ModuleList()
        self.acts = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
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


class TorchTranspConvolution(torch.nn.Module):
    def __init__(self, in_ch, out_ch, strides):
        super().__init__()
        self.conv = torch.nn.ConvTranspose3d(in_ch, out_ch, 3, stride=strides,
                                             padding=1,
                                             output_padding=strides - 1)
        self.norm = torch.nn.InstanceNorm3d(out_ch, affine=False)
        self.act = torch.nn.PReLU(num_parameters=1)

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))

    def load(self, p):
        self.conv.weight.data = _transp_w(p["conv"]["kernel"])
        self.conv.bias.data = _t(p["conv"]["bias"])
        self.act.weight.data = _t(p["act0"]["alpha"])


def _rand(tree, rng):
    out = {}
    for k, v in tree.items():
        out[k] = (_rand(v, rng) if isinstance(v, dict)
                  else rng.randn(*v.shape).astype(np.float32) * 0.3)
    return out


def test_regressor_transplant_forward_parity():
    from unet3d_tpu.models.monai_heads import Regressor

    model = Regressor(in_shape=(1, 16, 16, 16), out_shape=(3,),
                      channels=(4, 8), strides=(2, 2), num_res_units=2)
    rng = np.random.RandomState(15)
    x = rng.randn(2, 16, 16, 16, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _rand(jax.device_get(variables["params"]), rng)
    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                   train=False))

    l0 = TorchResidualUnit(1, 4, strides=2).eval()
    l1 = TorchResidualUnit(4, 8, strides=2, last_conv_only=True).eval()
    l0.load(params["layer_0"])
    l1.load(params["layer_1"])
    final = torch.nn.Linear(8 * 4 * 4 * 4, 3)
    _lin(final, params["final"])
    with torch.no_grad():
        h = l1(l0(_t(x.transpose(0, 4, 1, 2, 3))))
        flat = h.permute(0, 2, 3, 4, 1).reshape(2, -1)  # NDHWC flatten
        y_t = final(flat)
    np.testing.assert_allclose(y_jax, y_t.numpy(), rtol=2e-4, atol=2e-4)


def test_generator_transplant_forward_parity():
    from unet3d_tpu.models.monai_heads import Generator

    model = Generator(latent_shape=(8,), start_shape=(4, 2, 2, 2),
                      channels=(4, 2), strides=(2, 2), num_res_units=1)
    rng = np.random.RandomState(16)
    z = rng.randn(2, 8).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(z))
    params = _rand(jax.device_get(variables["params"]), rng)
    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(z),
                                   train=False))

    linear = torch.nn.Linear(8, 4 * 2 * 2 * 2)
    _lin(linear, params["linear"])
    c0 = TorchTranspConvolution(4, 4, 2).eval()
    c0.load(params["conv_0"])
    r0 = TorchResidualUnit(4, 4, subunits=1).eval()
    r0.load(params["resunit_0"])
    c1 = TorchTranspConvolution(4, 2, 2).eval()
    c1.load(params["conv_1"])
    r1 = TorchResidualUnit(2, 2, subunits=1, last_conv_only=True).eval()
    r1.load(params["resunit_1"])
    with torch.no_grad():
        h = linear(_t(z)).reshape(2, 4, 2, 2, 2)  # channel-first reshape
        y_t = r1(c1(r0(c0(h))))
    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=2e-4, atol=2e-4)
