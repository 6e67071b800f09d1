"""SegResNet + UNETR weight-transplant parity vs independent torch builds.

VERDICT r2 item 2: extend the `test_parity_dynunet.py` transplant pattern to
the two zoo models users most likely configure after DynUNet. monai is not
installed in this image, so each torch network below is an independent
re-implementation of the MONAI forward semantics built from torch primitives
only (same caveat as the DynUNet fixture: misreadings of MONAI would reproduce
on both sides, but every torch-level convention — conv padding, GroupNorm
eps/affine, trilinear align_corners, transposed-conv tap order, attention
head packing, LayerNorm eps — is pinned hard).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    # flax ConvTranspose kernels are tap-reversed relative to torch
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


# --------------------------------------------------------------- SegResNet


def _gn_groups(c, groups=8):
    return c if (c < groups or c % groups) else groups


class TorchMyronenkoBlock(torch.nn.Module):
    """Pre-activation residual block (GN -> ReLU -> conv3) x2 + identity."""

    def __init__(self, channels):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(_gn_groups(channels), channels, eps=1e-5)
        self.conv1 = torch.nn.Conv3d(channels, channels, 3, padding=1, bias=False)
        self.norm2 = torch.nn.GroupNorm(_gn_groups(channels), channels, eps=1e-5)
        self.conv2 = torch.nn.Conv3d(channels, channels, 3, padding=1, bias=False)

    def forward(self, x):
        f = torch.nn.functional
        y = self.conv1(f.relu(self.norm1(x)))
        y = self.conv2(f.relu(self.norm2(y)))
        return y + x

    def load(self, params):
        self.norm1.weight.data = _t(params["conv1"]["norm"]["scale"])
        self.norm1.bias.data = _t(params["conv1"]["norm"]["bias"])
        self.conv1.weight.data = _conv_w(params["conv1"]["conv"]["kernel"])
        self.norm2.weight.data = _t(params["conv2"]["norm"]["scale"])
        self.norm2.bias.data = _t(params["conv2"]["norm"]["bias"])
        self.conv2.weight.data = _conv_w(params["conv2"]["conv"]["kernel"])


class TorchSegResNet(torch.nn.Module):
    """MONAI SegResNet semantics: init conv, strided encoder levels,
    1x1x1-conv + trilinear-upsample + additive-skip decoder, GN-ReLU-conv head."""

    def __init__(self, in_ch=2, out_ch=3, init_filters=4, n_levels=3):
        super().__init__()
        f = init_filters
        self.conv_init = torch.nn.Conv3d(in_ch, f, 3, padding=1, bias=False)
        self.down = torch.nn.ModuleList()
        self.blocks = torch.nn.ModuleList()
        for i in range(n_levels):
            width = f * 2 ** i
            self.down.append(
                torch.nn.Conv3d(width // 2, width, 3, stride=2, padding=1,
                                bias=False) if i else torch.nn.Identity())
            self.blocks.append(TorchMyronenkoBlock(width))
        self.up_conv = torch.nn.ModuleList()
        self.up_blocks = torch.nn.ModuleList()
        for i in range(n_levels - 1):
            width = f * 2 ** (n_levels - 2 - i)
            self.up_conv.append(torch.nn.Conv3d(width * 2, width, 1, bias=False))
            self.up_blocks.append(TorchMyronenkoBlock(width))
        top = f
        self.final_norm = torch.nn.GroupNorm(_gn_groups(top), top, eps=1e-5)
        self.conv_final = torch.nn.Conv3d(top, out_ch, 1, bias=True)

    def forward(self, x):
        f = torch.nn.functional
        x = self.conv_init(x)
        skips = []
        for down, block in zip(self.down, self.blocks):
            x = block(down(x))
            skips.append(x)
        for i, (conv, block) in enumerate(zip(self.up_conv, self.up_blocks)):
            x = conv(x)
            x = f.interpolate(x, scale_factor=2, mode="trilinear",
                              align_corners=False)
            x = x + skips[len(skips) - 2 - i]
            x = block(x)
        return self.conv_final(f.relu(self.final_norm(x)))


def test_segresnet_forward_matches_torch_transplant():
    from unet3d_tpu.models.registry import create_model, init_params

    model = create_model("SegResNet", in_channels=2, out_channels=3,
                         init_filters=4, blocks_down=[1, 1, 1],
                         blocks_up=[1, 1], upsample_mode="nontrainable")
    variables = init_params(model, (16, 16, 16, 2))
    params = variables["params"]

    tnet = TorchSegResNet().eval()
    tnet.conv_init.weight.data = _conv_w(params["convInit"]["kernel"])
    tnet.blocks[0].load(params["layer0_block0"])
    for i in (1, 2):
        tnet.down[i].weight.data = _conv_w(params[f"down{i}"]["kernel"])
        tnet.blocks[i].load(params[f"layer{i}_block0"])
    for i in (0, 1):
        tnet.up_conv[i].weight.data = _conv_w(params[f"up{i}_conv"]["kernel"])
        tnet.up_blocks[i].load(params[f"up{i}_block0"])
    tnet.final_norm.weight.data = _t(params["final_norm"]["scale"])
    tnet.final_norm.bias.data = _t(params["final_norm"]["bias"])
    tnet.conv_final.weight.data = _conv_w(params["conv_final"]["kernel"])
    tnet.conv_final.bias.data = _t(params["conv_final"]["bias"])

    x = np.random.RandomState(0).rand(1, 2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x)).numpy()
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), False)
    out_nchw = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert ref.shape == out_nchw.shape == (1, 3, 16, 16, 16)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-4, rtol=1e-3)


# ------------------------------------------------------------------ UNETR


HID, MLP, HEADS, LAYERS, FS = 16, 32, 2, 4, 2
IMG, PATCH = 32, 16


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
        self.out_proj.weight.data = _t(p["attn"]["out_proj"]["kernel"]).T.contiguous()
        self.out_proj.bias.data = _t(p["attn"]["out_proj"]["bias"])
        self.norm2.weight.data = _t(p["norm2"]["scale"])
        self.norm2.bias.data = _t(p["norm2"]["bias"])
        self.mlp1.weight.data = _t(p["mlp1"]["kernel"]).T.contiguous()
        self.mlp1.bias.data = _t(p["mlp1"]["bias"])
        self.mlp2.weight.data = _t(p["mlp2"]["kernel"]).T.contiguous()
        self.mlp2.bias.data = _t(p["mlp2"]["bias"])


class TorchResBlock(torch.nn.Module):
    """DynUNet UnetResBlock: conv-IN-lrelu, conv-IN, projected identity, lrelu."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = torch.nn.Conv3d(in_ch, out_ch, 3, padding=1, bias=False)
        self.norm1 = torch.nn.InstanceNorm3d(out_ch, eps=1e-5, affine=True)
        self.conv2 = torch.nn.Conv3d(out_ch, out_ch, 3, padding=1, bias=False)
        self.norm2 = torch.nn.InstanceNorm3d(out_ch, eps=1e-5, affine=True)
        self.project = in_ch != out_ch
        if self.project:
            self.conv3 = torch.nn.Conv3d(in_ch, out_ch, 1, bias=False)
            self.norm3 = torch.nn.InstanceNorm3d(out_ch, eps=1e-5, affine=True)

    def forward(self, x):
        f = torch.nn.functional
        identity = x
        y = f.leaky_relu(self.norm1(self.conv1(x)), 0.01)
        y = self.norm2(self.conv2(y))
        if self.project:
            identity = self.norm3(self.conv3(identity))
        return f.leaky_relu(y + identity, 0.01)

    def load(self, p):
        self.conv1.weight.data = _conv_w(p["conv1"]["kernel"])
        self.norm1.weight.data = _t(p["norm1"]["scale"])
        self.norm1.bias.data = _t(p["norm1"]["bias"])
        self.conv2.weight.data = _conv_w(p["conv2"]["kernel"])
        self.norm2.weight.data = _t(p["norm2"]["scale"])
        self.norm2.bias.data = _t(p["norm2"]["bias"])
        if self.project:
            self.conv3.weight.data = _conv_w(p["conv3"]["kernel"])
            self.norm3.weight.data = _t(p["norm3"]["scale"])
            self.norm3.bias.data = _t(p["norm3"]["bias"])


class TorchUNETR(torch.nn.Module):
    def __init__(self, in_ch=1, out_ch=2):
        super().__init__()
        self.patch_embed = torch.nn.Conv3d(in_ch, HID, PATCH, stride=PATCH)
        self.pos = torch.nn.Parameter(torch.zeros(1, 8, HID))
        self.vit_blocks = torch.nn.ModuleList(
            [TorchViTBlock() for _ in range(LAYERS)])
        self.vit_norm = torch.nn.LayerNorm(HID, eps=1e-5)
        self.encoder1 = TorchResBlock(in_ch, FS)
        # encoder2: transp_init + 2x (transp + resblock); encoder3: 1x;
        # encoder4: transp_init only
        def transp(cin, cout):
            return torch.nn.ConvTranspose3d(cin, cout, 2, stride=2, bias=False)
        self.enc2_t0 = transp(HID, FS * 2)
        self.enc2_t1 = transp(FS * 2, FS * 2)
        self.enc2_b1 = TorchResBlock(FS * 2, FS * 2)
        self.enc2_t2 = transp(FS * 2, FS * 2)
        self.enc2_b2 = TorchResBlock(FS * 2, FS * 2)
        self.enc3_t0 = transp(HID, FS * 4)
        self.enc3_t1 = transp(FS * 4, FS * 4)
        self.enc3_b1 = TorchResBlock(FS * 4, FS * 4)
        self.enc4_t0 = transp(HID, FS * 8)
        self.dec5_t = transp(HID, FS * 8)
        self.dec5_b = TorchResBlock(FS * 16, FS * 8)
        self.dec4_t = transp(FS * 8, FS * 4)
        self.dec4_b = TorchResBlock(FS * 8, FS * 4)
        self.dec3_t = transp(FS * 4, FS * 2)
        self.dec3_b = TorchResBlock(FS * 4, FS * 2)
        self.dec2_t = transp(FS * 2, FS)
        self.dec2_b = TorchResBlock(FS * 2, FS)
        self.head = torch.nn.Conv3d(FS, out_ch, 1, bias=True)

    def forward(self, x_in):
        z = self.patch_embed(x_in)                       # (N, HID, 2, 2, 2)
        n = z.shape[0]
        # flax reshape (N, gd, gh, gw, C) -> (N, T, C): torch NCDHW needs the
        # channel moved last before flattening tokens
        z = z.permute(0, 2, 3, 4, 1).reshape(n, 8, HID) + self.pos
        states = []
        for blk in self.vit_blocks:
            z = blk(z)
            states.append(z)
        seq = self.vit_norm(z)

        def proj(s):
            return s.reshape(n, 2, 2, 2, HID).permute(0, 4, 1, 2, 3)

        enc1 = self.encoder1(x_in)
        e2 = self.enc2_t0(proj(states[1]))
        e2 = self.enc2_b1(self.enc2_t1(e2))
        enc2 = self.enc2_b2(self.enc2_t2(e2))
        e3 = self.enc3_t0(proj(states[2]))
        enc3 = self.enc3_b1(self.enc3_t1(e3))
        enc4 = self.enc4_t0(proj(states[3]))
        dec4 = proj(seq)
        y = self.dec5_b(torch.cat([self.dec5_t(dec4), enc4], dim=1))
        y = self.dec4_b(torch.cat([self.dec4_t(y), enc3], dim=1))
        y = self.dec3_b(torch.cat([self.dec3_t(y), enc2], dim=1))
        y = self.dec2_b(torch.cat([self.dec2_t(y), enc1], dim=1))
        return self.head(y)


def test_unetr_forward_matches_torch_transplant():
    from unet3d_tpu.models.registry import create_model, init_params

    model = create_model("UNETR", in_channels=1, out_channels=2, img_size=IMG,
                         hidden_size=HID, mlp_dim=MLP, num_heads=HEADS,
                         num_layers=LAYERS, feature_size=FS, res_block=True)
    variables = init_params(model, (IMG, IMG, IMG, 1))
    p = variables["params"]

    tnet = TorchUNETR().eval()
    vit = p["vit"]
    tnet.patch_embed.weight.data = _conv_w(vit["patch_embedding"]["kernel"])
    tnet.patch_embed.bias.data = _t(vit["patch_embedding"]["bias"])
    tnet.pos.data = _t(vit["pos_embedding"])
    for i in range(LAYERS):
        tnet.vit_blocks[i].load(vit[f"block{i}"])
    tnet.vit_norm.weight.data = _t(vit["norm"]["scale"])
    tnet.vit_norm.bias.data = _t(vit["norm"]["bias"])
    tnet.encoder1.load(p["encoder1"])
    e2 = p["encoder2"]
    tnet.enc2_t0.weight.data = _transp_w(e2["transp_conv_init"]["kernel"])
    tnet.enc2_t1.weight.data = _transp_w(e2["transp_0"]["kernel"])
    tnet.enc2_b1.load(e2["conv_0"])
    tnet.enc2_t2.weight.data = _transp_w(e2["transp_1"]["kernel"])
    tnet.enc2_b2.load(e2["conv_1"])
    e3 = p["encoder3"]
    tnet.enc3_t0.weight.data = _transp_w(e3["transp_conv_init"]["kernel"])
    tnet.enc3_t1.weight.data = _transp_w(e3["transp_0"]["kernel"])
    tnet.enc3_b1.load(e3["conv_0"])
    tnet.enc4_t0.weight.data = _transp_w(p["encoder4"]["transp_conv_init"]["kernel"])
    for name, tt, tb in (("decoder5", tnet.dec5_t, tnet.dec5_b),
                         ("decoder4", tnet.dec4_t, tnet.dec4_b),
                         ("decoder3", tnet.dec3_t, tnet.dec3_b),
                         ("decoder2", tnet.dec2_t, tnet.dec2_b)):
        tt.weight.data = _transp_w(p[name]["transp_conv"]["kernel"])
        tb.load(p[name]["conv_block"])
    tnet.head.weight.data = _conv_w(p["out"]["kernel"])
    tnet.head.bias.data = _t(p["out"]["bias"])

    x = np.random.RandomState(0).rand(1, 1, IMG, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x)).numpy()
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), False)
    out_nchw = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert ref.shape == out_nchw.shape == (1, 2, IMG, IMG, IMG)
    np.testing.assert_allclose(out_nchw, ref, atol=3e-4, rtol=1e-3)
