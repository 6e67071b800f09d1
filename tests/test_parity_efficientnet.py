"""EfficientNetBN (b0) weight-transplant parity vs an independent torch build.

Pins the MBConv conventions: 1x1 expand / depthwise-grouped kxk / SE gate on
pre-expand channel count / 1x1 project, BN eps=1e-3, SiLU (swish), identity
skip rules, head conv + GAP + Dense — including MONAI's TF-style "same"
padding (asymmetric lo=total//2 / hi=total-total//2, e.g. (0,1) for k3 s2 on
even sizes; `_get_same_padding_conv_nd`), which the stem and every
depthwise conv now follow exactly (models/efficientnet.py `_tf_same_pads` —
the r3 symmetric-pad divergence is resolved).

monai is not installed in this image; the torch network below is an
independent re-implementation built from torch primitives (eval mode, BN
running stats randomized, dropout/drop-connect inert).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet3d_tpu.models.efficientnet import (_B0_BLOCKS, _round_filters,
                                            _round_repeats)


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _load_bn(bn, p, s):
    bn.weight.data = _t(p["scale"])
    bn.bias.data = _t(p["bias"])
    bn.running_mean.data = _t(s["mean"])
    bn.running_var.data = _t(s["var"])


def _bn3(ch):
    return torch.nn.BatchNorm3d(ch, eps=1e-3)


def _tf_pad(x, kernel, stride):
    """MONAI/TF 'same' pad: F.pad order is last-dim-first (W,H,D)."""
    pads = []
    for n in reversed(x.shape[2:]):
        total = max((-(-int(n) // stride) - 1) * stride + kernel - int(n), 0)
        pads.extend([total // 2, total - total // 2])
    return torch.nn.functional.pad(x, pads)


class TorchMBConv(torch.nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride, expand, se_ratio):
        super().__init__()
        mid = in_ch * expand
        self.expand = expand
        self.stride, self.in_ch, self.out_ch = stride, in_ch, out_ch
        if expand != 1:
            self.expand_conv = torch.nn.Conv3d(in_ch, mid, 1, bias=False)
            self.bn0 = _bn3(mid)
        self.kernel = kernel
        self.depthwise = torch.nn.Conv3d(mid, mid, kernel, stride=stride,
                                         padding=0, groups=mid, bias=False)
        self.bn1 = _bn3(mid)
        se_ch = max(1, int(in_ch * se_ratio))
        self.se_reduce = torch.nn.Conv3d(mid, se_ch, 1)
        self.se_expand = torch.nn.Conv3d(se_ch, mid, 1)
        self.project = torch.nn.Conv3d(mid, out_ch, 1, bias=False)
        self.bn2 = _bn3(out_ch)

    def forward(self, x):
        silu = torch.nn.functional.silu
        y = x
        if self.expand != 1:
            y = silu(self.bn0(self.expand_conv(y)))
        y = silu(self.bn1(self.depthwise(_tf_pad(y, self.kernel, self.stride))))
        s = y.mean(dim=(2, 3, 4), keepdim=True)
        s = self.se_expand(silu(self.se_reduce(s)))
        y = y * torch.sigmoid(s)
        y = self.bn2(self.project(y))
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + x
        return y

    def load(self, p, s):
        if self.expand != 1:
            self.expand_conv.weight.data = _conv_w(p["expand_conv"]["kernel"])
            _load_bn(self.bn0, p["bn0"], s["bn0"])
        self.depthwise.weight.data = _conv_w(p["depthwise_conv"]["kernel"])
        _load_bn(self.bn1, p["bn1"], s["bn1"])
        self.se_reduce.weight.data = _conv_w(p["se_reduce"]["kernel"])
        self.se_reduce.bias.data = _t(p["se_reduce"]["bias"])
        self.se_expand.weight.data = _conv_w(p["se_expand"]["kernel"])
        self.se_expand.bias.data = _t(p["se_expand"]["bias"])
        self.project.weight.data = _conv_w(p["project_conv"]["kernel"])
        _load_bn(self.bn2, p["bn2"], s["bn2"])


def _randomize(tree, rng, stats=False):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize(v, rng, stats)
        elif stats and k == "var":
            out[k] = (0.5 + rng.rand(*v.shape)).astype(np.float32)
        else:
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.2
    return out


def test_efficientnet_b0_forward_matches_torch_transplant():
    from unet3d_tpu.models.efficientnet import EfficientNetBN

    model = EfficientNetBN(model_name="efficientnet-b0", in_channels=1,
                           num_classes=3)
    rng = np.random.RandomState(11)
    x = rng.randn(1, 32, 32, 32, 1).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)
    stats = _randomize(jax.device_get(variables["batch_stats"]), rng,
                       stats=True)
    y_jax = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))

    width, depth = 1.0, 1.0
    stem = torch.nn.Conv3d(1, _round_filters(32, width), 3, stride=2,
                           padding=0, bias=False)
    stem_bn = _bn3(_round_filters(32, width))
    stem.weight.data = _conv_w(params["stem_conv"]["kernel"])
    _load_bn(stem_bn, params["stem_bn"], stats["stem_bn"])

    blocks = []
    in_ch = _round_filters(32, width)
    for si, (r, k, s, e, ci, co, se) in enumerate(_B0_BLOCKS):
        out_ch = _round_filters(co, width)
        for j in range(_round_repeats(r, depth)):
            blk = TorchMBConv(in_ch, out_ch, k, s if j == 0 else 1, e, se)
            blk = blk.eval()
            blk.load(params[f"block{si}_{j}"], stats[f"block{si}_{j}"])
            blocks.append(blk)
            in_ch = out_ch

    head_ch = _round_filters(1280, width)
    head = torch.nn.Conv3d(in_ch, head_ch, 1, bias=False)
    head_bn = _bn3(head_ch)
    head.weight.data = _conv_w(params["head_conv"]["kernel"])
    _load_bn(head_bn, params["head_bn"], stats["head_bn"])
    fc = torch.nn.Linear(head_ch, 3)
    fc.weight.data = _t(params["fc"]["kernel"]).T.contiguous()
    fc.bias.data = _t(params["fc"]["bias"])

    silu = torch.nn.functional.silu
    with torch.no_grad():
        y = silu(stem_bn.eval()(stem(_tf_pad(_t(x.transpose(0, 4, 1, 2, 3)),
                                             3, 2))))
        for blk in blocks:
            y = blk(y)
        y = silu(head_bn.eval()(head(y)))
        y_t = fc(y.mean(dim=(2, 3, 4)))

    np.testing.assert_allclose(y_jax, y_t.numpy(), rtol=1e-3, atol=1e-3)
