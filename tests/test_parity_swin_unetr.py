"""SwinUNETR weight-transplant parity vs an independent torch build.

The hardest zoo transplant: pins the 3D Swin encoder conventions — window
partition order, shifted-window roll + boundary attention mask, learned
relative-position bias gather, qkv/proj packing, erf GELU MLP, PatchMergingV2
octant order + LN + biasless reduction, the parameterless proj_out channel
layer-norm — plus the UNETR-style conv decoder (UnetResBlock / UnetrUpBlock)
and einsum head.

monai is not installed in this image, so the torch network below is an
independent re-implementation of ``monai.networks.nets.SwinUNETR`` forward
semantics (downsample="mergingv2") built from torch primitives only. The
swin half runs channels-last in torch to mirror LayerNorm-over-channels.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

F_SZ = 2
DEPTHS = (2, 1, 1, 1)
HEADS = (1, 1, 2, 2)
WS = 2
# /32 bottleneck must be >1 voxel per axis: torch InstanceNorm3d refuses
# single-spatial-element inputs (functional.py _verify_spatial_size)
IMG = 64


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _lin(linear, p):
    linear.weight.data = _t(p["kernel"]).T.contiguous()
    if "bias" in p:
        linear.bias.data = _t(p["bias"])


def _rel_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  np.arange(ws), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel += ws - 1
    rel[:, :, 0] *= (2 * ws - 1) ** 2
    rel[:, :, 1] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_mask(dims, ws, shift):
    img = np.zeros(dims, np.int32)
    cnt = 0
    for sd in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for sh in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for sw in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img[sd, sh, sw] = cnt
                cnt += 1
    d, h, w = dims
    win = img.reshape(d // ws, ws, h // ws, ws, w // ws, ws)
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, ws ** 3)
    diff = win[:, None, :] - win[:, :, None]
    return torch.tensor(np.where(diff != 0, -1e9, 0.0).astype(np.float32))


class TorchSwinBlock(torch.nn.Module):
    """Channels-last (n, d, h, w, c) swin block."""

    def __init__(self, dim, heads, shift):
        super().__init__()
        self.dim, self.heads, self.shift = dim, heads, shift
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.qkv = torch.nn.Linear(dim, 3 * dim, bias=True)
        self.proj = torch.nn.Linear(dim, dim)
        self.table = torch.nn.Parameter(
            torch.zeros((2 * WS - 1) ** 3, heads))
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.mlp1 = torch.nn.Linear(dim, 4 * dim)
        self.mlp2 = torch.nn.Linear(4 * dim, dim)

    def _attend(self, win, mask):
        bw, vol, c = win.shape
        hd = c // self.heads
        qkv = self.qkv(win).reshape(bw, vol, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        idx = torch.tensor(_rel_index(WS).reshape(-1))
        bias = self.table[idx].reshape(vol, vol, self.heads)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.heads, vol, vol)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bw, self.heads, vol, vol)
        attn = attn.softmax(dim=-1)
        y = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bw, vol, c)
        return self.proj(y)

    def forward(self, x):
        n, d, h, w, c = x.shape
        shift = WS // 2 if (self.shift and d > WS) else 0
        y = self.norm1(x)
        mask = None
        if shift:
            y = torch.roll(y, (-shift, -shift, -shift), dims=(1, 2, 3))
            mask = _shift_mask((d, h, w), WS, shift)
        win = y.reshape(n, d // WS, WS, h // WS, WS, w // WS, WS, c)
        win = win.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, WS ** 3, c)
        win = self._attend(win, mask)
        y = win.reshape(n, d // WS, h // WS, w // WS, WS, WS, WS, c)
        y = y.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(n, d, h, w, c)
        if shift:
            y = torch.roll(y, (shift, shift, shift), dims=(1, 2, 3))
        x = x + y
        y = self.norm2(x)
        y = self.mlp2(torch.nn.functional.gelu(self.mlp1(y)))
        return x + y

    def load(self, p):
        self.norm1.weight.data = _t(p["norm1"]["scale"])
        self.norm1.bias.data = _t(p["norm1"]["bias"])
        a = p["attn"]
        _lin(self.qkv, a["qkv"])
        _lin(self.proj, a["proj"])
        self.table.data = _t(a["relative_position_bias_table"])
        self.norm2.weight.data = _t(p["norm2"]["scale"])
        self.norm2.bias.data = _t(p["norm2"]["bias"])
        _lin(self.mlp1, p["mlp1"])
        _lin(self.mlp2, p["mlp2"])


class TorchPatchMerging(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = torch.nn.LayerNorm(8 * dim, eps=1e-5)
        self.reduction = torch.nn.Linear(8 * dim, 2 * dim, bias=False)

    def forward(self, x):
        octants = [x[:, dd::2, hh::2, ww::2, :]
                   for dd in (0, 1) for hh in (0, 1) for ww in (0, 1)]
        return self.reduction(self.norm(torch.cat(octants, dim=-1)))

    def load(self, p):
        self.norm.weight.data = _t(p["norm"]["scale"])
        self.norm.bias.data = _t(p["norm"]["bias"])
        _lin(self.reduction, p["reduction"])


class TorchResBlock(torch.nn.Module):
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


class TorchUpBlock(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.transp = torch.nn.ConvTranspose3d(in_ch, out_ch, 2, stride=2,
                                               bias=False)
        self.block = TorchResBlock(2 * out_ch, out_ch)

    def forward(self, x, skip):
        return self.block(torch.cat([self.transp(x), skip], dim=1))

    def load(self, p):
        self.transp.weight.data = _transp_w(p["transp_conv"]["kernel"])
        self.block.load(p["conv_block"])


def _randomize(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _randomize(v, rng)
        else:
            out[k] = rng.randn(*v.shape).astype(np.float32) * 0.2
    return out


def test_swin_unetr_forward_matches_torch_transplant():
    from unet3d_tpu.models.swin_unetr import SwinUNETR

    model = SwinUNETR(img_size=(IMG,) * 3, in_channels=1, out_channels=2,
                      feature_size=F_SZ, depths=DEPTHS, num_heads=HEADS,
                      window_size=WS)
    rng = np.random.RandomState(5)
    x = rng.randn(1, IMG, IMG, IMG, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _randomize(jax.device_get(variables["params"]), rng)

    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                   train=False))

    # ---- torch replica ----
    patch = torch.nn.Conv3d(1, F_SZ, 2, stride=2)
    patch.weight.data = _conv_w(params["patch_embed"]["kernel"])
    patch.bias.data = _t(params["patch_embed"]["bias"])
    stages, merges = [], []
    dim = F_SZ
    for s, depth in enumerate(DEPTHS):
        blocks = []
        for b in range(depth):
            blk = TorchSwinBlock(dim, HEADS[s], shift=(b % 2 == 1))
            blk.load(params[f"stage{s}_block{b}"])
            blocks.append(blk)
        stages.append(blocks)
        mg = TorchPatchMerging(dim)
        mg.load(params[f"merge{s}"])
        merges.append(mg)
        dim *= 2

    f = F_SZ
    enc_blocks = {}
    for name, in_ch, out_ch in [("encoder1", 1, f), ("encoder2", f, f),
                                ("encoder3", 2 * f, 2 * f),
                                ("encoder4", 4 * f, 4 * f),
                                ("encoder10", 16 * f, 16 * f)]:
        blk = TorchResBlock(in_ch, out_ch).eval()
        blk.load(params[name])
        enc_blocks[name] = blk
    dec_blocks = {}
    for name, in_ch, out_ch in [("decoder5", 16 * f, 8 * f),
                                ("decoder4", 8 * f, 4 * f),
                                ("decoder3", 4 * f, 2 * f),
                                ("decoder2", 2 * f, f),
                                ("decoder1", f, f)]:
        blk = TorchUpBlock(in_ch, out_ch).eval()
        blk.load(params[name])
        dec_blocks[name] = blk
    head = torch.nn.Conv3d(f, 2, 1)
    head.weight.data = _conv_w(params["out"]["kernel"])
    head.bias.data = _t(params["out"]["bias"])

    def proj_norm(h):  # parameterless channel layer-norm (proj_out)
        return torch.nn.functional.layer_norm(h, (h.shape[-1],), eps=1e-5)

    with torch.no_grad():
        xt = _t(x.transpose(0, 4, 1, 2, 3))
        h = patch(xt).permute(0, 2, 3, 4, 1)  # channels-last
        hidden = [h]
        for s in range(len(DEPTHS)):
            for blk in stages[s]:
                h = blk(h)
            h = merges[s](h)
            hidden.append(h)
        hidden = [proj_norm(hh).permute(0, 4, 1, 2, 3) for hh in hidden]
        enc0 = enc_blocks["encoder1"](xt)
        enc1 = enc_blocks["encoder2"](hidden[0])
        enc2 = enc_blocks["encoder3"](hidden[1])
        enc3 = enc_blocks["encoder4"](hidden[2])
        dec4 = enc_blocks["encoder10"](hidden[4])
        d3 = dec_blocks["decoder5"](dec4, hidden[3])
        d2 = dec_blocks["decoder4"](d3, enc3)
        d1 = dec_blocks["decoder3"](d2, enc2)
        d0 = dec_blocks["decoder2"](d1, enc1)
        out = dec_blocks["decoder1"](d0, enc0)
        y_t = head(out)
    y_t = y_t.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(y_jax, y_t, rtol=5e-4, atol=5e-4)
