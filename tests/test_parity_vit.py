"""ViT / ViTAutoEnc weight-transplant parity vs independent torch builds.

UNETR's transplant (test_parity_zoo.py) already pins the transformer stack;
this adds the standalone-ViT contracts: cls-token prepend + Dense head +
Tanh post-activation (classification mode), and ViTAutoEnc's two-stage
kernel==stride transposed-conv decode (s1*s2 == patch).

monai is not installed in this image, so the torch networks below are
independent re-implementations of ``monai.networks.nets.ViT`` /
``ViTAutoEnc`` forward semantics built from torch primitives only.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HID, MLP, HEADS, LAYERS = 32, 64, 4, 2
IMG, PATCH = 16, 8


def _conv_w(kernel):
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


class TorchViTBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(HID, eps=1e-5)
        self.qkv = torch.nn.Linear(HID, 3 * HID, bias=False)
        self.out_proj = torch.nn.Linear(HID, HID, bias=True)
        self.norm2 = torch.nn.LayerNorm(HID, eps=1e-5)
        self.mlp1 = torch.nn.Linear(HID, MLP)
        self.mlp2 = torch.nn.Linear(MLP, HID)

    def forward(self, x):
        f = torch.nn.functional
        h = self.norm1(x)
        qkv = self.qkv(h)
        n, t, _ = qkv.shape
        hd = HID // HEADS
        qkv = qkv.reshape(n, t, 3, HEADS, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(hd)
        attn = attn.softmax(dim=-1)
        y = torch.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, HID)
        x = x + self.out_proj(y)
        h = self.norm2(x)
        return x + self.mlp2(f.gelu(self.mlp1(h)))

    def load(self, p):
        self.norm1.weight.data = _t(p["norm1"]["scale"])
        self.norm1.bias.data = _t(p["norm1"]["bias"])
        self.qkv.weight.data = _t(p["attn"]["qkv"]["kernel"]).T.contiguous()
        self.out_proj.weight.data = _t(
            p["attn"]["out_proj"]["kernel"]).T.contiguous()
        self.out_proj.bias.data = _t(p["attn"]["out_proj"]["bias"])
        self.norm2.weight.data = _t(p["norm2"]["scale"])
        self.norm2.bias.data = _t(p["norm2"]["bias"])
        self.mlp1.weight.data = _t(p["mlp1"]["kernel"]).T.contiguous()
        self.mlp1.bias.data = _t(p["mlp1"]["bias"])
        self.mlp2.weight.data = _t(p["mlp2"]["kernel"]).T.contiguous()
        self.mlp2.bias.data = _t(p["mlp2"]["bias"])


class TorchViTEncoder(torch.nn.Module):
    def __init__(self, in_ch, n_tokens, classification):
        super().__init__()
        self.patch_embed = torch.nn.Conv3d(in_ch, HID, PATCH, stride=PATCH)
        self.pos = torch.nn.Parameter(torch.zeros(1, n_tokens, HID))
        self.cls_token = (torch.nn.Parameter(torch.zeros(1, 1, HID))
                          if classification else None)
        self.blocks = torch.nn.ModuleList(
            [TorchViTBlock() for _ in range(LAYERS)])
        self.norm = torch.nn.LayerNorm(HID, eps=1e-5)

    def forward(self, x):
        z = self.patch_embed(x)
        n = z.shape[0]
        z = z.permute(0, 2, 3, 4, 1).reshape(n, -1, HID) + self.pos
        if self.cls_token is not None:
            z = torch.cat([self.cls_token.expand(n, -1, -1), z], dim=1)
        for blk in self.blocks:
            z = blk(z)
        return self.norm(z)

    def load(self, p):
        self.patch_embed.weight.data = _conv_w(p["patch_embedding"]["kernel"])
        self.patch_embed.bias.data = _t(p["patch_embedding"]["bias"])
        self.pos.data = _t(p["pos_embedding"])
        if self.cls_token is not None:
            self.cls_token.data = _t(p["cls_token"])
        for i, blk in enumerate(self.blocks):
            blk.load(p[f"block{i}"])
        self.norm.weight.data = _t(p["norm"]["scale"])
        self.norm.bias.data = _t(p["norm"]["bias"])


def _randomize(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize(v, rng)
        else:
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.2
    return out


def test_vit_classification_matches_torch_transplant():
    from unet3d_tpu.models.vit import ViT

    model = ViT(in_channels=1, img_size=(IMG,) * 3, patch_size=(PATCH,) * 3,
                hidden_size=HID, mlp_dim=MLP, num_layers=LAYERS,
                num_heads=HEADS, classification=True, num_classes=3)
    rng = np.random.RandomState(3)
    x = rng.randn(2, IMG, IMG, IMG, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)

    logits, states = model.apply({"params": params}, jnp.asarray(x),
                                 train=False)
    logits = np.asarray(logits)
    assert len(states) == LAYERS

    enc = TorchViTEncoder(1, (IMG // PATCH) ** 3, classification=True).eval()
    enc.load(params)
    head = torch.nn.Linear(HID, 3)
    head.weight.data = _t(params["classification_head"]["kernel"]).T.contiguous()
    head.bias.data = _t(params["classification_head"]["bias"])
    with torch.no_grad():
        seq = enc(_t(x.transpose(0, 4, 1, 2, 3)))
        y_t = torch.tanh(head(seq[:, 0]))

    np.testing.assert_allclose(logits, y_t.numpy(), rtol=2e-4, atol=2e-4)


def test_vitautoenc_matches_torch_transplant():
    from unet3d_tpu.models.vit import ViTAutoEnc

    model = ViTAutoEnc(in_channels=1, img_size=(IMG,) * 3,
                       patch_size=(PATCH,) * 3, out_channels=1,
                       deconv_chns=6, hidden_size=HID, mlp_dim=MLP,
                       num_layers=LAYERS, num_heads=HEADS)
    rng = np.random.RandomState(4)
    x = rng.randn(1, IMG, IMG, IMG, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)

    recon, _ = model.apply({"params": params}, jnp.asarray(x), train=False)
    recon = np.asarray(recon)
    assert recon.shape == x.shape

    enc = TorchViTEncoder(1, (IMG // PATCH) ** 3, classification=False).eval()
    enc.load(params)
    # patch 8 decomposes as s1=4, s2=2 (s1*s2 == patch)
    t0 = torch.nn.ConvTranspose3d(HID, 6, 4, stride=4)
    t0.weight.data = _transp_w(params["conv3d_transpose"]["kernel"])
    t0.bias.data = _t(params["conv3d_transpose"]["bias"])
    t1 = torch.nn.ConvTranspose3d(6, 1, 2, stride=2)
    t1.weight.data = _transp_w(params["conv3d_transpose_1"]["kernel"])
    t1.bias.data = _t(params["conv3d_transpose_1"]["bias"])
    g = IMG // PATCH
    with torch.no_grad():
        seq = enc(_t(x.transpose(0, 4, 1, 2, 3)))
        z = seq.reshape(1, g, g, g, HID).permute(0, 4, 1, 2, 3)
        y_t = t1(t0(z))
    y_t = y_t.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(recon, y_t, rtol=2e-4, atol=2e-4)
