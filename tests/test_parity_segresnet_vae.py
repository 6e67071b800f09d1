"""SegResNetVAE weight-transplant parity vs an independent torch build.

The plain SegResNet transplant (test_parity_zoo.py) pins the Myronenko
encoder/decoder conventions; this adds the VAE regularization branch:
GN->ReLU->stride-2 conv squeeze to smallest_filters, NDHWC flatten ->
Dense latent, the weight-SHARED decoder replay without skips, the recon MSE
+ L2(mu) regularizer, and the (seg, vae_loss) train-mode contract. With
``vae_default_std=0`` the branch is deterministic (z == mu), so the torch
replica reproduces the full loss bit-for-bit.

monai is not installed in this image; the torch network below is an
independent re-implementation of ``monai.networks.nets.SegResNetVAE``
forward semantics built from torch primitives only.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

INIT = 4
BLOCKS_DOWN = (1, 1, 1)
BLOCKS_UP = (1, 1)
SMALLEST = 4
NZ = 8
IMG = 16


def _gn_groups(ch, groups=8):
    return ch if (ch < groups or ch % groups) else groups


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _lin(linear, p):
    linear.weight.data = _t(p["kernel"]).T.contiguous()
    linear.bias.data = _t(p["bias"])


def _load_gn(gn, p):
    gn.weight.data = _t(p["scale"])
    gn.bias.data = _t(p["bias"])


class TorchMyronenkoBlock(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(_gn_groups(ch), ch, eps=1e-5)
        self.conv1 = torch.nn.Conv3d(ch, ch, 3, padding=1, bias=False)
        self.norm2 = torch.nn.GroupNorm(_gn_groups(ch), ch, eps=1e-5)
        self.conv2 = torch.nn.Conv3d(ch, ch, 3, padding=1, bias=False)

    def forward(self, x):
        f = torch.nn.functional
        y = self.conv1(f.relu(self.norm1(x)))
        y = self.conv2(f.relu(self.norm2(y)))
        return y + x

    def load(self, p):
        _load_gn(self.norm1, p["conv1"]["norm"])
        self.conv1.weight.data = _conv_w(p["conv1"]["conv"]["kernel"])
        _load_gn(self.norm2, p["conv2"]["norm"])
        self.conv2.weight.data = _conv_w(p["conv2"]["conv"]["kernel"])


def _rand(tree, rng):
    out = {}
    for k, v in tree.items():
        out[k] = (_rand(v, rng) if isinstance(v, dict)
                  else rng.randn(*v.shape).astype(np.float32) * 0.3)
    return out


def test_segresnet_vae_train_contract_matches_torch_transplant():
    from unet3d_tpu.models.segresnet import SegResNetVAE

    model = SegResNetVAE(input_image_size=(IMG,) * 3, init_filters=INIT,
                         in_channels=1, out_channels=2,
                         blocks_down=BLOCKS_DOWN, blocks_up=BLOCKS_UP,
                         vae_default_std=0.0, vae_nz=NZ,
                         smallest_filters=SMALLEST)
    rng = np.random.RandomState(14)
    x = rng.randn(1, IMG, IMG, IMG, 1).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, jnp.asarray(x))
    params = _rand(jax.device_get(variables["params"]), rng)

    seg_eval = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                      train=False))
    seg, vae_loss = model.apply({"params": params}, jnp.asarray(x),
                                train=True,
                                rngs={"sample": jax.random.PRNGKey(2)})
    seg, vae_loss = np.asarray(seg), float(vae_loss)
    np.testing.assert_allclose(seg, seg_eval, rtol=1e-5, atol=1e-5)

    # ---- torch replica ----
    f = torch.nn.functional
    widths = [INIT * 2 ** i for i in range(len(BLOCKS_DOWN))]  # [4, 8, 16]
    conv_init = torch.nn.Conv3d(1, INIT, 3, padding=1, bias=False)
    conv_init.weight.data = _conv_w(params["convInit"]["kernel"])
    downs, enc_blocks = {}, {}
    for i, n in enumerate(BLOCKS_DOWN):
        if i > 0:
            d = torch.nn.Conv3d(widths[i - 1], widths[i], 3, stride=2,
                                padding=1, bias=False)
            d.weight.data = _conv_w(params[f"down{i}"]["kernel"])
            downs[i] = d
        blocks = []
        for b in range(n):
            blk = TorchMyronenkoBlock(widths[i])
            blk.load(params[f"layer{i}_block{b}"])
            blocks.append(blk)
        enc_blocks[i] = blocks

    bottom = widths[-1]
    up_convs, up_blocks = {}, {}
    for i, n in enumerate(BLOCKS_UP):
        w = bottom // 2 ** (i + 1)
        c = torch.nn.Conv3d(bottom // 2 ** i, w, 1, bias=False)
        c.weight.data = _conv_w(params[f"up{i}_conv"]["kernel"])
        up_convs[i] = c
        blocks = []
        for b in range(n):
            blk = TorchMyronenkoBlock(w)
            blk.load(params[f"up{i}_block{b}"])
            blocks.append(blk)
        up_blocks[i] = blocks
    final_norm = torch.nn.GroupNorm(_gn_groups(INIT), INIT, eps=1e-5)
    _load_gn(final_norm, params["final_norm"])
    conv_final = torch.nn.Conv3d(INIT, 2, 1)
    conv_final.weight.data = _conv_w(params["conv_final"]["kernel"])
    conv_final.bias.data = _t(params["conv_final"]["bias"])

    vae_norm = torch.nn.GroupNorm(_gn_groups(bottom), bottom, eps=1e-5)
    _load_gn(vae_norm, params["vae_down_norm"])
    vae_conv = torch.nn.Conv3d(bottom, SMALLEST, 3, stride=2, padding=1,
                               bias=False)
    vae_conv.weight.data = _conv_w(params["vae_down_conv"]["kernel"])
    zoom = 2 ** (len(BLOCKS_DOWN) - 1)
    fc_in = IMG // (2 * zoom)
    total = SMALLEST * fc_in ** 3
    fc1 = torch.nn.Linear(total, NZ)
    fc3 = torch.nn.Linear(NZ, total)
    _lin(fc1, params["vae_fc1"])
    _lin(fc3, params["vae_fc3"])
    vae_up_conv = torch.nn.Conv3d(SMALLEST, bottom, 1, bias=False)
    vae_up_conv.weight.data = _conv_w(params["vae_fc_up_conv"]["kernel"])
    vae_final = torch.nn.Conv3d(INIT, 1, 1)
    vae_final.weight.data = _conv_w(params["vae_conv_final"]["kernel"])
    vae_final.bias.data = _t(params["vae_conv_final"]["bias"])

    def up2(h):
        return f.interpolate(h, scale_factor=2, mode="trilinear",
                             align_corners=False)

    def run_decoder(h, skips):
        for i in range(len(BLOCKS_UP)):
            h = up2(up_convs[i](h))
            if skips is not None:
                h = h + skips[len(BLOCKS_DOWN) - 2 - i]
            for blk in up_blocks[i]:
                h = blk(h)
        return h

    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        h = conv_init(xt)
        skips = []
        for i in range(len(BLOCKS_DOWN)):
            if i > 0:
                h = downs[i](h)
            for blk in enc_blocks[i]:
                h = blk(h)
            skips.append(h)
        seg_t = conv_final(f.relu(final_norm(run_decoder(h, skips))))

        v = vae_conv(f.relu(vae_norm(h)))
        flat = v.permute(0, 2, 3, 4, 1).reshape(1, -1)  # NDHWC flatten
        mu = fc1(flat)
        reg = (mu ** 2).mean()
        r = f.relu(fc3(mu))
        r = r.reshape(1, fc_in, fc_in, fc_in, SMALLEST).permute(0, 4, 1, 2, 3)
        r = up2(vae_up_conv(r))
        recon = vae_final(run_decoder(r, None))
        mse = ((recon - xt) ** 2).mean()
        loss_t = float(mse + reg)

    np.testing.assert_allclose(seg, seg_t.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=5e-4, atol=5e-4)
    assert vae_loss == pytest.approx(loss_t, rel=1e-4)
