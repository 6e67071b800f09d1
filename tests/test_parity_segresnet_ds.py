"""SegResNetDS weight-transplant parity vs an independent torch build.

Pins the Auto3DSeg-default topology: pre-activation BatchNorm->ReLU->conv3
SegResBlocks, downsample-AFTER-blocks stride-2 conv (unlike plain SegResNet),
k=2/s=2 transposed-conv "deconv" upsampling through the subpixel formulation,
additive skips, and the 1-cubed einsum head.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.SegResNetDS`` forward
semantics built from torch primitives only. Eval mode: BatchNorm running
stats are randomized and transplanted.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

INIT = 4
BLOCKS_DOWN = (1, 2, 2)


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
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


class TorchSegResBlock(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm1 = torch.nn.BatchNorm3d(ch)
        self.conv1 = torch.nn.Conv3d(ch, ch, 3, padding=1, bias=False)
        self.norm2 = torch.nn.BatchNorm3d(ch)
        self.conv2 = torch.nn.Conv3d(ch, ch, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return y + x

    def load(self, p, s):
        _load_bn(self.norm1, p["norm1"], s["norm1"])
        self.conv1.weight.data = _conv_w(p["conv1"]["kernel"])
        _load_bn(self.norm2, p["norm2"], s["norm2"])
        self.conv2.weight.data = _conv_w(p["conv2"]["kernel"])


class TorchSegResNetDS(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv_init = torch.nn.Conv3d(in_ch, INIT, 3, padding=1, bias=False)
        self.down_blocks = torch.nn.ModuleList()
        self.downsamples = torch.nn.ModuleList()
        f = INIT
        for i, n in enumerate(BLOCKS_DOWN):
            self.down_blocks.append(torch.nn.ModuleList(
                [TorchSegResBlock(f) for _ in range(n)]))
            if i < len(BLOCKS_DOWN) - 1:
                self.downsamples.append(
                    torch.nn.Conv3d(f, f * 2, 3, stride=2, padding=1,
                                    bias=False))
                f *= 2
        self.upsamples = torch.nn.ModuleList()
        self.up_blocks = torch.nn.ModuleList()
        for i in range(len(BLOCKS_DOWN) - 1):
            self.upsamples.append(
                torch.nn.ConvTranspose3d(f, f // 2, 2, stride=2))
            f //= 2
            self.up_blocks.append(torch.nn.ModuleList([TorchSegResBlock(f)]))
        self.head = torch.nn.Conv3d(f, out_ch, 1)

    def forward(self, x):
        x = self.conv_init(x)
        skips = []
        for i, blocks in enumerate(self.down_blocks):
            for b in blocks:
                x = b(x)
            skips.append(x)
            if i < len(self.downsamples):
                x = self.downsamples[i](x)
        up_skips = skips[:-1][::-1]
        for i, up in enumerate(self.upsamples):
            x = up(x) + up_skips[i]
            for b in self.up_blocks[i]:
                x = b(x)
        return self.head(x)

    def load(self, params, stats):
        self.conv_init.weight.data = _conv_w(params["conv_init"]["kernel"])
        for i, blocks in enumerate(self.down_blocks):
            for bi, b in enumerate(blocks):
                b.load(params[f"down{i}_block{bi}"],
                       stats[f"down{i}_block{bi}"])
            if i < len(self.downsamples):
                self.downsamples[i].weight.data = \
                    _conv_w(params[f"down{i}_downsample"]["kernel"])
        n_up = len(self.upsamples)
        for i in range(n_up):
            self.upsamples[i].weight.data = \
                _transp_w(params[f"up{i}_upsample"]["kernel"])
            self.upsamples[i].bias.data = _t(params[f"up{i}_upsample"]["bias"])
            self.up_blocks[i][0].load(params[f"up{i}_block0"],
                                      stats[f"up{i}_block0"])
        head = params[f"up{n_up - 1}_head"]
        self.head.weight.data = _conv_w(head["kernel"])
        self.head.bias.data = _t(head["bias"])


def _randomize_stats(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize_stats(v, rng)
        elif k == "mean":
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.3
        else:  # var
            out[k] = (0.5 + rng.rand(*v.shape)).astype(np.float32)
    return out


def _randomize_params(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize_params(v, rng)
        else:
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.3
    return out


def test_segresnet_ds_forward_matches_torch_transplant():
    from unet3d_tpu.models.segresnet_ds import SegResNetDS

    model = SegResNetDS(init_filters=INIT, in_channels=2, out_channels=3,
                        blocks_down=BLOCKS_DOWN)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 8, 2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize_params(jax.device_get(variables["params"]), rng)
    stats = _randomize_stats(jax.device_get(variables["batch_stats"]), rng)

    y_jax = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False))

    tnet = TorchSegResNetDS(2, 3).eval()
    tnet.load(params, stats)
    with torch.no_grad():
        y_t = tnet(_t(x.transpose(0, 4, 1, 2, 3)))
    y_t = y_t.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_jax, y_t, rtol=2e-4, atol=2e-4)
