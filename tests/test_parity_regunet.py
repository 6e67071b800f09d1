"""RegUNet / GlobalNet weight-transplant parity vs independent torch builds.

Pins the DeepReg-derived registration-family conventions: conv+BN+ReLU encode
blocks with the 2-conv residual (activation AFTER the residual add), max-pool
downs, k3/s2/p1/op1 transposed-conv decoder with BN+ReLU before the additive
skip, the multi-level extraction heads (conv3 -> trilinear resize -> mean),
and GlobalNet's zero-kernel/identity-bias affine head with the
``theta @ grid - grid`` DDF (NDHWC flatten convention).

monai is not installed in this image; the torch networks below are
independent re-implementations of ``monai.networks.nets.RegUNet``/
``GlobalNet`` forward semantics. Eval mode: BN running stats randomized.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NCI = 2    # num_channel_initial
DEPTH = 2


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _load_bn(bn, p, s):
    bn.weight.data = _t(p["scale"])
    bn.bias.data = _t(p["bias"])
    bn.running_mean.data = _t(s["mean"])
    bn.running_var.data = _t(s["var"])


class TorchConvBNReLU(torch.nn.Module):
    def __init__(self, in_ch, out_ch, k=3):
        super().__init__()
        self.conv = torch.nn.Conv3d(in_ch, out_ch, k, padding=k // 2,
                                    bias=False)
        self.bn = torch.nn.BatchNorm3d(out_ch)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))

    def load(self, p, s):
        self.conv.weight.data = _conv_w(p["conv"]["kernel"])
        _load_bn(self.bn, p["bn"], s["bn"])


class TorchResidualConvBlock(torch.nn.Module):
    def __init__(self, ch, k=3):
        super().__init__()
        self.conv0 = torch.nn.Conv3d(ch, ch, k, padding=k // 2, bias=False)
        self.bn0 = torch.nn.BatchNorm3d(ch)
        self.conv1 = torch.nn.Conv3d(ch, ch, k, padding=k // 2, bias=False)
        self.bn1 = torch.nn.BatchNorm3d(ch)

    def forward(self, x):
        y = torch.relu(self.bn0(self.conv0(x)))
        y = self.bn1(self.conv1(y))
        return torch.relu(y + x)

    def load(self, p, s):
        self.conv0.weight.data = _conv_w(p["conv0"]["kernel"])
        _load_bn(self.bn0, p["bn0"], s["bn0"])
        self.conv1.weight.data = _conv_w(p["conv1"]["kernel"])
        _load_bn(self.bn1, p["bn1"], s["bn1"])


class TorchEncodeBlock(torch.nn.Module):
    def __init__(self, in_ch, out_ch, k=3):
        super().__init__()
        self.conv = TorchConvBNReLU(in_ch, out_ch, k)
        self.residual = TorchResidualConvBlock(out_ch, k)

    def forward(self, x):
        return self.residual(self.conv(x))

    def load(self, p, s):
        self.conv.load(p["conv"], s["conv"])
        self.residual.load(p["residual"], s["residual"])


def _randomize_params(tree, rng):
    out = {}
    for k, v in tree.items():
        out[k] = (_randomize_params(v, rng) if isinstance(v, dict)
                  else rng.randn(*v.shape).astype(np.float32) * 0.3)
    return out


def _randomize_stats(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize_stats(v, rng)
        elif k == "mean":
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.3
        else:
            out[k] = (0.5 + rng.rand(*v.shape)).astype(np.float32)
    return out


def test_regunet_forward_matches_torch_transplant():
    from unet3d_tpu.models.regunet import RegUNet

    model = RegUNet(in_channels=2, num_channel_initial=NCI, depth=DEPTH,
                    out_channels=3, extract_levels=(0, 1, 2))
    rng = np.random.RandomState(9)
    x = rng.randn(1, 16, 16, 16, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize_params(jax.device_get(variables["params"]), rng)
    stats = _randomize_stats(jax.device_get(variables["batch_stats"]), rng)
    y_jax = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))

    w = [NCI * 2 ** d for d in range(DEPTH + 1)]
    enc0 = TorchEncodeBlock(2, w[0]).eval()
    enc1 = TorchEncodeBlock(w[0], w[1]).eval()
    bottom = TorchEncodeBlock(w[1], w[2]).eval()
    dec1_t = torch.nn.ConvTranspose3d(w[2], w[1], 3, stride=2, padding=1,
                                      output_padding=1, bias=False)
    dec1_bn = torch.nn.BatchNorm3d(w[1]).eval()
    dec1 = TorchEncodeBlock(w[1], w[1]).eval()
    dec0_t = torch.nn.ConvTranspose3d(w[1], w[0], 3, stride=2, padding=1,
                                      output_padding=1, bias=False)
    dec0_bn = torch.nn.BatchNorm3d(w[0]).eval()
    dec0 = TorchEncodeBlock(w[0], w[0]).eval()
    heads = {}
    for level, cin in [(0, w[0]), (1, w[1]), (2, w[2])]:
        h = torch.nn.Conv3d(cin, 3, 3, padding=1)
        p = params[f"extract_{level}"]
        h.weight.data = _conv_w(p["kernel"])
        h.bias.data = _t(p["bias"])
        heads[level] = h
    enc0.load(params["encode_0"], stats["encode_0"])
    enc1.load(params["encode_1"], stats["encode_1"])
    bottom.load(params["bottom"], stats["bottom"])
    dec1_t.weight.data = _transp_w(params["deconv_1"]["kernel"])
    _load_bn(dec1_bn, params["deconv_bn_1"], stats["deconv_bn_1"])
    dec1.load(params["decode_1"], stats["decode_1"])
    dec0_t.weight.data = _transp_w(params["deconv_0"]["kernel"])
    _load_bn(dec0_bn, params["deconv_bn_0"], stats["deconv_bn_0"])
    dec0.load(params["decode_0"], stats["decode_0"])

    pool = torch.nn.functional.max_pool3d
    interp = torch.nn.functional.interpolate
    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        s0 = enc0(xt)
        s1 = enc1(pool(s0, 2))
        b = bottom(pool(s1, 2))
        d1 = dec1(torch.relu(dec1_bn(dec1_t(b))) + s1)
        d0 = dec0(torch.relu(dec0_bn(dec0_t(d1))) + s0)
        outs = {0: d0, 1: d1, 2: b}
        acc = []
        for level in (0, 1, 2):
            h = heads[level](outs[level])
            acc.append(interp(h, size=(16, 16, 16), mode="trilinear",
                              align_corners=False) if level else h)
        y_t = sum(acc) / 3
    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=5e-4, atol=5e-4)


def test_globalnet_ddf_matches_torch_transplant():
    from unet3d_tpu.models.regunet import GlobalNet

    model = GlobalNet(in_channels=2, num_channel_initial=NCI, depth=DEPTH)
    rng = np.random.RandomState(10)
    x = rng.randn(1, 8, 8, 8, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize_params(jax.device_get(variables["params"]), rng)
    stats = _randomize_stats(jax.device_get(variables["batch_stats"]), rng)

    # identity check first: fresh init -> zero DDF
    v0 = jax.device_get(variables)
    ddf0 = np.asarray(model.apply(v0, jnp.asarray(x), train=False))
    assert np.abs(ddf0).max() < 1e-4

    ddf = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(x), train=False))

    w = [NCI * 2 ** d for d in range(DEPTH + 1)]
    enc0 = TorchEncodeBlock(2, w[0]).eval()
    enc1 = TorchEncodeBlock(w[0], w[1]).eval()
    bottom = TorchEncodeBlock(w[1], w[2]).eval()
    enc0.load(params["encode_0"], stats["encode_0"])
    enc1.load(params["encode_1"], stats["encode_1"])
    bottom.load(params["bottom"], stats["bottom"])
    fc = torch.nn.Linear(w[2] * 2 * 2 * 2, 12)
    fc.weight.data = _t(params["affine_head"]["fc"]["kernel"]).T.contiguous()
    fc.bias.data = _t(params["affine_head"]["fc"]["bias"])

    pool = torch.nn.functional.max_pool3d
    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        b = bottom(pool(enc1(pool(enc0(xt), 2)), 2))
        flat = b.permute(0, 2, 3, 4, 1).reshape(1, -1)  # NDHWC flatten
        theta = fc(flat).reshape(1, 3, 4).numpy()
    grid = np.stack(np.meshgrid(*[np.arange(8, dtype=np.float32)] * 3,
                                indexing="ij"), axis=-1)
    gh = np.concatenate([grid, np.ones((8, 8, 8, 1), np.float32)], axis=-1)
    ddf_t = np.einsum("nij,dhwj->ndhwi", theta, gh) - grid[None]
    np.testing.assert_allclose(ddf, ddf_t, rtol=5e-4, atol=5e-4)


def test_localnet_forward_matches_torch_transplant():
    """LocalNet = RegUNet + kernel-7 first encode + all-level extraction."""
    from unet3d_tpu.models.regunet import LocalNet

    model = LocalNet(in_channels=2, num_channel_initial=NCI, depth=DEPTH,
                     out_channels=3)
    rng = np.random.RandomState(17)
    x = rng.randn(1, 16, 16, 16, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize_params(jax.device_get(variables["params"]), rng)
    stats = _randomize_stats(jax.device_get(variables["batch_stats"]), rng)
    y_jax = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))

    w = [NCI * 2 ** d for d in range(DEPTH + 1)]
    enc0 = TorchEncodeBlock(2, w[0], k=7).eval()       # kernel-7 first encode
    enc1 = TorchEncodeBlock(w[0], w[1]).eval()
    bottom = TorchEncodeBlock(w[1], w[2]).eval()
    dec1_t = torch.nn.ConvTranspose3d(w[2], w[1], 3, stride=2, padding=1,
                                      output_padding=1, bias=False)
    dec1_bn = torch.nn.BatchNorm3d(w[1]).eval()
    dec1 = TorchEncodeBlock(w[1], w[1]).eval()
    dec0_t = torch.nn.ConvTranspose3d(w[1], w[0], 3, stride=2, padding=1,
                                      output_padding=1, bias=False)
    dec0_bn = torch.nn.BatchNorm3d(w[0]).eval()
    dec0 = TorchEncodeBlock(w[0], w[0]).eval()
    heads = {}
    for level, cin in [(0, w[0]), (1, w[1]), (2, w[2])]:
        h = torch.nn.Conv3d(cin, 3, 3, padding=1)
        p = params[f"extract_{level}"]
        h.weight.data = _conv_w(p["kernel"])
        h.bias.data = _t(p["bias"])
        heads[level] = h
    enc0.load(params["encode_0"], stats["encode_0"])
    enc1.load(params["encode_1"], stats["encode_1"])
    bottom.load(params["bottom"], stats["bottom"])
    dec1_t.weight.data = _transp_w(params["deconv_1"]["kernel"])
    _load_bn(dec1_bn, params["deconv_bn_1"], stats["deconv_bn_1"])
    dec1.load(params["decode_1"], stats["decode_1"])
    dec0_t.weight.data = _transp_w(params["deconv_0"]["kernel"])
    _load_bn(dec0_bn, params["deconv_bn_0"], stats["deconv_bn_0"])
    dec0.load(params["decode_0"], stats["decode_0"])

    pool = torch.nn.functional.max_pool3d
    interp = torch.nn.functional.interpolate
    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        s0 = enc0(xt)
        s1 = enc1(pool(s0, 2))
        b = bottom(pool(s1, 2))
        d1 = dec1(torch.relu(dec1_bn(dec1_t(b))) + s1)
        d0 = dec0(torch.relu(dec0_bn(dec0_t(d1))) + s0)
        outs = {0: d0, 1: d1, 2: b}
        acc = []
        for level in (0, 1, 2):
            h = heads[level](outs[level])
            acc.append(interp(h, size=(16, 16, 16), mode="trilinear",
                              align_corners=False) if level else h)
        y_t = sum(acc) / 3
    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=5e-4, atol=5e-4)
