"""DenseNet121-topology weight-transplant parity vs an independent torch build.

Pins the classification-family conventions: BN(eval running stats) -> ReLU
pre-activation dense layers, 1x1 bottlenecks, avg-pool transitions, stem
conv7/s2 + maxpool3/s2 SAME alignment, global average pool + Linear head.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.DenseNet`` forward
semantics built from torch primitives only (tiny block_config for CPU speed).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BLOCKS = (2, 3)
GROWTH = 4
INIT = 8
BN_SIZE = 2


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _load_bn(bn, p, s):
    bn.weight.data = _t(p["scale"])
    bn.bias.data = _t(p["bias"])
    bn.running_mean.data = _t(s["mean"])
    bn.running_var.data = _t(s["var"])


class TorchDenseLayer(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.norm1 = torch.nn.BatchNorm3d(in_ch)
        self.conv1 = torch.nn.Conv3d(in_ch, BN_SIZE * GROWTH, 1, bias=False)
        self.norm2 = torch.nn.BatchNorm3d(BN_SIZE * GROWTH)
        self.conv2 = torch.nn.Conv3d(BN_SIZE * GROWTH, GROWTH, 3, padding=1,
                                     bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)

    def load(self, p, s):
        _load_bn(self.norm1, p["norm1"], s["norm1"])
        self.conv1.weight.data = _conv_w(p["conv1"]["kernel"])
        _load_bn(self.norm2, p["norm2"], s["norm2"])
        self.conv2.weight.data = _conv_w(p["conv2"]["kernel"])


class TorchDenseNet(torch.nn.Module):
    def __init__(self, in_ch=2, out_ch=3):
        super().__init__()
        self.conv0 = torch.nn.Conv3d(in_ch, INIT, 7, stride=2, padding=3,
                                     bias=False)
        self.norm0 = torch.nn.BatchNorm3d(INIT)
        layers, ch = [], INIT
        self.blocks = torch.nn.ModuleList()
        self.transitions = torch.nn.ModuleList()
        for i, n in enumerate(BLOCKS):
            blk = torch.nn.ModuleList()
            for _ in range(n):
                blk.append(TorchDenseLayer(ch))
                ch += GROWTH
            self.blocks.append(blk)
            if i != len(BLOCKS) - 1:
                ch //= 2
                self.transitions.append(torch.nn.ModuleDict({
                    "norm": torch.nn.BatchNorm3d(ch * 2),
                    "conv": torch.nn.Conv3d(ch * 2, ch, 1, bias=False)}))
        self.norm5 = torch.nn.BatchNorm3d(ch)
        self.fc = torch.nn.Linear(ch, out_ch)

    def forward(self, x):
        x = self.conv0(x)
        x = torch.relu(self.norm0(x))
        x = torch.nn.functional.max_pool3d(x, 3, stride=2, padding=1)
        for i, blk in enumerate(self.blocks):
            for layer in blk:
                x = layer(x)
            if i != len(self.blocks) - 1:
                t = self.transitions[i]
                x = t["conv"](torch.relu(t["norm"](x)))
                x = torch.nn.functional.avg_pool3d(x, 2, stride=2)
        x = torch.relu(self.norm5(x))
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)

    def load(self, p, s):
        self.conv0.weight.data = _conv_w(p["conv0"]["kernel"])
        _load_bn(self.norm0, p["norm0"], s["norm0"])
        for i, blk in enumerate(self.blocks):
            for j, layer in enumerate(blk):
                layer.load(p[f"block{i}_layer{j}"], s[f"block{i}_layer{j}"])
            if i != len(self.blocks) - 1:
                t = self.transitions[i]
                _load_bn(t["norm"], p[f"transition{i}_norm"],
                         s[f"transition{i}_norm"])
                t["conv"].weight.data = _conv_w(p[f"transition{i}_conv"]["kernel"])
        _load_bn(self.norm5, p["norm5"], s["norm5"])
        self.fc.weight.data = _t(np.asarray(
            p["class_layers_out"]["kernel"]).T)
        self.fc.bias.data = _t(p["class_layers_out"]["bias"])


def test_densenet_transplant_forward_parity():
    from unet3d_tpu.models.registry import create_model
    net = create_model("DenseNet", in_channels=2, out_channels=3,
                       init_features=INIT, growth_rate=GROWTH,
                       block_config=BLOCKS, bn_size=BN_SIZE)
    rng = np.random.RandomState(5)
    x = rng.rand(2, 16, 16, 16, 2).astype(np.float32)
    variables = net.init({"params": jax.random.PRNGKey(13)},
                         jnp.asarray(x), False)
    # randomize BN running stats so eval-mode normalization is non-trivial
    stats = jax.tree_util.tree_map(lambda v: v, variables["batch_stats"])

    def randomize(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = randomize(v)
            elif k == "mean":
                out[k] = jnp.asarray(rng.randn(*v.shape).astype(np.float32)) * 0.2
            elif k == "var":
                out[k] = jnp.asarray(
                    rng.rand(*v.shape).astype(np.float32)) + 0.5
            else:
                out[k] = v
        return out

    import flax
    stats = randomize(flax.core.unfreeze(stats))
    variables = {"params": variables["params"], "batch_stats": stats}
    y_jax = np.asarray(net.apply(variables, jnp.asarray(x), False))

    tnet = TorchDenseNet()
    tnet.load(variables["params"], stats)
    tnet.eval()
    with torch.no_grad():
        y_t = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3).copy()))

    assert y_jax.shape == tuple(y_t.shape)
    np.testing.assert_allclose(y_jax, y_t.numpy(), rtol=2e-4, atol=2e-4)
