"""DynUNet end-to-end numeric parity against an independent torch build.

VERDICT r1 asked for weight-transplant forward parity vs MONAI DynUNet
(`/root/reference/unet3d/scripts/train.py` resolves configs to monai.DynUNet).
monai is not installed in this image, so the torch network below is an
independent re-implementation of the MONAI DynUNet forward semantics
(conv(stride)-InstanceNorm-lrelu blocks, ConvTranspose upsample, skip concat,
1x1x1 output head) built from torch primitives only. Transplanting the flax
parameters into it and asserting forward agreement pins every convention the
pipeline depends on: conv SAME padding, transposed-conv tap order, instance
norm eps/affine, leaky-relu slope, concat order.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


FILTERS = (4, 8, 16)
STRIDES = ((1, 1, 1), (2, 2, 2), (2, 2, 2))
IN_CH, OUT_CH = 2, 3


def _torch_block(in_ch, out_ch, stride):
    import torch.nn as nn
    return nn.ModuleDict({
        "conv1": nn.Conv3d(in_ch, out_ch, 3, stride=stride, padding=1, bias=False),
        "norm1": nn.InstanceNorm3d(out_ch, eps=1e-5, affine=True),
        "conv2": nn.Conv3d(out_ch, out_ch, 3, stride=1, padding=1, bias=False),
        "norm2": nn.InstanceNorm3d(out_ch, eps=1e-5, affine=True),
    })


class TorchDynUNet(torch.nn.Module):
    """MONAI-semantics DynUNet (basic blocks, no deep supervision)."""

    def __init__(self):
        super().__init__()
        self.input_block = _torch_block(IN_CH, FILTERS[0], 1)
        self.downsample0 = _torch_block(FILTERS[0], FILTERS[1], 2)
        self.bottleneck = _torch_block(FILTERS[1], FILTERS[2], 2)
        self.up = torch.nn.ModuleList()
        ups = [(FILTERS[2], FILTERS[1]), (FILTERS[1], FILTERS[0])]
        for in_ch, out_ch in ups:
            self.up.append(torch.nn.ModuleDict({
                "transp_conv": torch.nn.ConvTranspose3d(in_ch, out_ch, 2,
                                                        stride=2, bias=False),
                "conv_block": _torch_block(2 * out_ch, out_ch, 1),
            }))
        self.output_block = torch.nn.Conv3d(FILTERS[0], OUT_CH, 1, bias=True)

    @staticmethod
    def _block(block, x):
        f = torch.nn.functional
        x = f.leaky_relu(block["norm1"](block["conv1"](x)), 0.01)
        return f.leaky_relu(block["norm2"](block["conv2"](x)), 0.01)

    def forward(self, x):
        s0 = self._block(self.input_block, x)
        s1 = self._block(self.downsample0, s0)
        y = self._block(self.bottleneck, s1)
        for blk, skip in zip(self.up, (s1, s0)):
            y = blk["transp_conv"](y)
            y = torch.cat([y, skip], dim=1)
            y = self._block(blk["conv_block"], y)
        return self.output_block(y)


def _flax_dynunet():
    from unet3d_tpu.models.registry import create_model, init_params
    model = create_model(
        "DynUNet", in_channels=IN_CH, out_channels=OUT_CH, spatial_dims=3,
        strides=[list(s) for s in STRIDES], filters=list(FILTERS),
        kernel_size=[[3, 3, 3]] * 3, upsample_kernel_size=[[2, 2, 2]] * 2,
        deep_supervision=False)
    variables = init_params(model, (16, 16, 16, IN_CH))
    return model, variables


def _conv_w(kernel):  # flax (D,H,W,I,O) -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):
    # flax ConvTranspose kernel is tap-reversed relative to torch
    # ConvTranspose3d (models/layers.py padding-parity note):
    # torch (I,O,k,k,k) = flip(flax (k,k,k,I,O)) permuted
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _load_block(tblock, params):
    tblock["conv1"].weight.data = _conv_w(params["conv1"]["kernel"])
    tblock["conv2"].weight.data = _conv_w(params["conv2"]["kernel"])
    for norm in ("norm1", "norm2"):
        tblock[norm].weight.data = torch.tensor(np.asarray(params[norm]["scale"]))
        tblock[norm].bias.data = torch.tensor(np.asarray(params[norm]["bias"]))


def test_dynunet_forward_matches_torch_transplant():
    model, variables = _flax_dynunet()
    params = variables["params"]

    tnet = TorchDynUNet().eval()
    _load_block(tnet.input_block, params["input_block"])
    _load_block(tnet.downsample0, params["downsample0"])
    _load_block(tnet.bottleneck, params["bottleneck"])
    for j in range(2):
        up = params[f"upsample{j}"]
        tnet.up[j]["transp_conv"].weight.data = _transp_w(up["transp_conv"]["kernel"])
        _load_block(tnet.up[j]["conv_block"], up["conv_block"])
    tnet.output_block.weight.data = _conv_w(params["output_block"]["kernel"])
    tnet.output_block.bias.data = torch.tensor(
        np.asarray(params["output_block"]["bias"]))

    x = np.random.RandomState(0).rand(1, IN_CH, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x)).numpy()

    x_ndhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    out = model.apply(variables, x_ndhwc, False)
    out_nchw = np.asarray(out).transpose(0, 4, 1, 2, 3)

    assert ref.shape == out_nchw.shape == (1, OUT_CH, 16, 16, 16)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-4, rtol=1e-3)
