"""AHNet weight-transplant parity vs an independent torch build.

Pins the anisotropic-hybrid conventions: (7,7,3)/(2,2,1) stem with symmetric
torch pads, 3-cubed stride-2 stem pool, Bottleneck3x3x1 (in-plane-only
strides, parallel (1,1,3) max-pool branch), the FCN pyramid-sum decoder,
Pseudo3D dense layers (P3D-B residual of the (3,3,1)/(1,1,3) paths), the
anisotropic PSP head, and the k=s transposed-conv upsampling.

monai is not installed in this image, and models/ahnet.py documents
paper-faithful block-level divergences from MONAI internals; the torch
network below replicates THIS design with torch primitives, pinning every
torch-level convention (strided pads, BN eval stats, pool windows,
transposed-conv taps). Eval mode: BN running stats randomized.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LAYERS = (1, 1, 1, 1)
PLANES = (64, 128, 256, 512)


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


def _load_conv(conv, p, bias=True):
    conv.weight.data = _conv_w(p["kernel"])
    if bias:
        conv.bias.data = _t(p["bias"])


class TorchBottleneck(torch.nn.Module):
    def __init__(self, in_ch, planes, stride, downsample):
        super().__init__()
        s = (stride, stride, 1)
        self.conv1 = torch.nn.Conv3d(in_ch, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm3d(planes)
        self.conv2 = torch.nn.Conv3d(planes, planes, (3, 3, 1), stride=s,
                                     padding=(1, 1, 0), bias=False)
        self.bn2 = torch.nn.BatchNorm3d(planes)
        self.conv3 = torch.nn.Conv3d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm3d(planes * 4)
        self.down = None
        if downsample:
            self.down = torch.nn.Conv3d(in_ch, planes * 4, 1, stride=s,
                                        bias=False)
            self.down_bn = torch.nn.BatchNorm3d(planes * 4)

    def forward(self, x):
        f = torch.nn.functional
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        y = y + f.max_pool3d(y, (1, 1, 3), stride=1, padding=(0, 0, 1))
        y = torch.relu(self.bn2(y))
        y = self.bn3(self.conv3(y))
        res = x if self.down is None else self.down_bn(self.down(x))
        return torch.relu(y + res)

    def load(self, p, s):
        _load_conv(self.conv1, p["conv1"], bias=False)
        _load_bn(self.bn1, p["bn1"], s["bn1"])
        _load_conv(self.conv2, p["conv2"], bias=False)
        _load_bn(self.bn2, p["bn2"], s["bn2"])
        _load_conv(self.conv3, p["conv3"], bias=False)
        _load_bn(self.bn3, p["bn3"], s["bn3"])
        if self.down is not None:
            _load_conv(self.down, p["down_conv"], bias=False)
            _load_bn(self.down_bn, p["down_bn"], s["down_bn"])


class TorchPseudo3D(torch.nn.Module):
    def __init__(self, in_ch, growth=16, bn_size=4):
        super().__init__()
        inter = bn_size * growth
        self.bn1 = torch.nn.BatchNorm3d(in_ch)
        self.conv1 = torch.nn.Conv3d(in_ch, inter, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm3d(inter)
        self.conv2d = torch.nn.Conv3d(inter, inter, (3, 3, 1),
                                      padding=(1, 1, 0), bias=False)
        self.bn3 = torch.nn.BatchNorm3d(inter)
        self.conv1d = torch.nn.Conv3d(inter, inter, (1, 1, 3),
                                      padding=(0, 0, 1), bias=False)
        self.bn4 = torch.nn.BatchNorm3d(inter)
        self.conv_out = torch.nn.Conv3d(inter, growth, 1, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.bn1(x)))
        y2d = self.conv2d(torch.relu(self.bn2(y)))
        z1d = self.conv1d(torch.relu(self.bn3(y2d)))
        y = y2d + z1d
        y = self.conv_out(torch.relu(self.bn4(y)))
        return torch.cat([x, y], dim=1)

    def load(self, p, s):
        _load_bn(self.bn1, p["bn1"], s["bn1"])
        _load_conv(self.conv1, p["conv1"], bias=False)
        _load_bn(self.bn2, p["bn2"], s["bn2"])
        _load_conv(self.conv2d, p["conv2d"], bias=False)
        _load_bn(self.bn3, p["bn3"], s["bn3"])
        _load_conv(self.conv1d, p["conv1d"], bias=False)
        _load_bn(self.bn4, p["bn4"], s["bn4"])
        _load_conv(self.conv_out, p["conv_out"], bias=False)


def _rand_params(tree, rng):
    out = {}
    for k, v in tree.items():
        out[k] = (_rand_params(v, rng) if isinstance(v, dict)
                  else rng.randn(*v.shape).astype(np.float32) * 0.2)
    return out


def _rand_stats(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _rand_stats(v, rng)
        elif k == "mean":
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.3
        else:
            out[k] = (0.5 + rng.rand(*v.shape)).astype(np.float32)
    return out


def test_ahnet_forward_matches_torch_transplant():
    from unet3d_tpu.models.ahnet import AHNet

    model = AHNet(layers=LAYERS, in_channels=1, out_channels=2,
                  psp_block_num=2, upsample_mode="transpose")
    rng = np.random.RandomState(13)
    x = rng.randn(1, 32, 32, 4, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _rand_params(jax.device_get(variables["params"]), rng)
    stats = _rand_stats(jax.device_get(variables["batch_stats"]), rng)
    y_jax = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))

    # ---- torch replica ----
    conv1 = torch.nn.Conv3d(1, 64, (7, 7, 3), stride=(2, 2, 1),
                            padding=(3, 3, 1), bias=False)
    bn0 = torch.nn.BatchNorm3d(64)
    _load_conv(conv1, params["conv1"], bias=False)
    _load_bn(bn0, params["bn0"], stats["bn0"])

    blocks, in_ch = [], 64
    for li, (n, p) in enumerate(zip(LAYERS, PLANES)):
        stage = []
        for b in range(n):
            stride = 2 if (li > 0 and b == 0) else 1
            blk = TorchBottleneck(in_ch, p, stride, downsample=(b == 0)).eval()
            blk.load(params[f"layer{li + 1}_{b}"], stats[f"layer{li + 1}_{b}"])
            stage.append(blk)
            in_ch = p * 4
        blocks.append(stage)

    projs, ups = {}, {}
    for li, cin in [(1, 256), (2, 512), (3, 1024), (4, 2048)]:
        c = torch.nn.Conv3d(cin, 64, 1)
        _load_conv(c, params[f"proj{li}"])
        projs[li] = c
    for li in (1, 2, 3):  # decoder upsamples are named up3 (deepest) .. up1
        u = torch.nn.ConvTranspose3d(64, 64, (2, 2, 1), stride=(2, 2, 1))
        u.weight.data = _transp_w(params[f"up{li}"]["kernel"])
        u.bias.data = _t(params[f"up{li}"]["bias"])
        ups[li] = u

    dense, dch = [], 64
    for i in range(4):
        d = TorchPseudo3D(dch).eval()
        d.load(params[f"dense{i}"], stats[f"dense{i}"])
        dense.append(d)
        dch += 16

    psp_projs, psp_ups = [], []
    for i in range(2):
        k = 2 ** (i + 1)
        c = torch.nn.Conv3d(dch, 1, 1)
        _load_conv(c, params["psp"][f"proj{i}"])
        u = torch.nn.ConvTranspose3d(1, 1, (k, k, 1), stride=(k, k, 1))
        u.weight.data = _transp_w(params["psp"][f"up{i}"]["kernel"])
        u.bias.data = _t(params["psp"][f"up{i}"]["bias"])
        psp_projs.append(c)
        psp_ups.append(u)

    final = torch.nn.Conv3d(dch + 2, 2, 1)
    _load_conv(final, params["final_conv"])
    final_up = torch.nn.ConvTranspose3d(2, 2, (4, 4, 2), stride=(4, 4, 2))
    final_up.weight.data = _transp_w(params["final_up"]["kernel"])
    final_up.bias.data = _t(params["final_up"]["bias"])

    f = torch.nn.functional
    with torch.no_grad():
        h = torch.relu(bn0.eval()(conv1(_t(x.transpose(0, 4, 1, 2, 3)))))
        h = f.max_pool3d(h, 3, stride=2, padding=1)
        feats = []
        for stage in blocks:
            for blk in stage:
                h = blk(h)
            feats.append(h)
        y = projs[4](feats[3])
        for li in (3, 2, 1):
            y = ups[li](y) + projs[li](feats[li - 1])
        for d in dense:
            y = d(y)
        psp = []
        for i in range(2):
            k = 2 ** (i + 1)
            p = f.max_pool3d(y, (k, k, 1), stride=(k, k, 1))
            psp.append(psp_ups[i](psp_projs[i](p)))
        y = torch.cat(psp + [y], dim=1)
        y_t = final_up(final(y))

    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=1e-3, atol=1e-3)
