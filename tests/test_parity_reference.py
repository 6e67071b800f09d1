"""Weight-transplant parity against the ACTUAL reference torch sources.

Unlike the other test_parity_* suites (which transplant into independent
torch replicas, since monai is not installed), these tests import the
reference's own model files from /root/reference by package path — with a
monai stub in sys.modules (only `unet3d/models/pytorch/__init__.py:1` needs
it) and an `np.int` alias (removed in numpy>=1.24; `variational.py:96-97`
uses it) — transplant this framework's Flax parameters into them, and
assert forward agreement.

The reference's own latent bugs are asserted as the ONLY divergences:
* `segmentation/unet.py:38` uses `F.pad` without importing F — UNetDecoder
  always raises NameError; parity is checked with F injected.
* `classification/decoder.py:39-63` MyronenkoDecoder's `kernal_size` typo
  makes every caller that passes `kernel_size=` (i.e. ConvolutionalAutoEncoder
  with default decoder, `variational.py:51-55`) raise TypeError; parity uses
  the `decoder_mirrors_encoder=True` MirroredDecoder path that works.
* `autoencoder/vqvae2.py:204` permutes a 5D tensor with 4 indices —
  VQVAE.encode always raises RuntimeError; components + decode are
  transplant-checked, encode parity is pinned by tests/test_model_zoo.py's
  semantics tests instead.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules from /root/reference."""
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001 — the reference uses the removed alias
    # monai gates the package __init__ chain; nibabel gates graph/utils.py
    # (only its module-level import — the surface loader is never called here)
    for name in ("monai", "monai.networks", "monai.networks.nets", "nibabel"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__all__ = []
            sys.modules[name] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import unet3d.models.pytorch.autoencoder.variational as ref_var
    import unet3d.models.pytorch.autoencoder.vqvae2 as ref_vq
    import unet3d.models.pytorch.classification.decoder as ref_dec
    import unet3d.models.pytorch.classification.myronenko as ref_myr
    import unet3d.models.pytorch.classification.resnet as ref_res
    import unet3d.models.pytorch.fcn.fcn as ref_fcn
    import unet3d.models.pytorch.graph.graph_cmr_layers as ref_graph
    import unet3d.models.pytorch.segmentation.unet as ref_unet
    return types.SimpleNamespace(var=ref_var, vq=ref_vq, dec=ref_dec,
                                 myr=ref_myr, res=ref_res, unet=ref_unet,
                                 fcn=ref_fcn, graph=ref_graph)


# ---- weight conversion: flax -> torch ----

def _t(x):
    return torch.tensor(np.asarray(x).copy())


def _conv_w(kernel):  # flax (D,H,W,I,O) [or (1,1,1,I,O)] -> torch (O,I,D,H,W)
    return torch.tensor(np.asarray(kernel).transpose(4, 3, 0, 1, 2).copy())


def _transp_w(kernel):  # flax ConvTranspose (D,H,W,I,O) -> torch (I,O,D,H,W)
    k = np.flip(np.asarray(kernel), axis=(0, 1, 2))
    return torch.tensor(k.transpose(3, 4, 0, 1, 2).copy())


def _nchw(x):  # NDHWC jax array -> NCDHW torch tensor
    return torch.tensor(np.asarray(x).transpose(0, 4, 1, 2, 3).copy())


def _from_torch(y):  # NCDHW torch -> NDHWC numpy
    return y.detach().numpy().transpose(0, 2, 3, 4, 1)


def _load_conv_block(t, p):  # MyronenkoConvolutionBlock
    t.norm1.weight.data = _t(p["norm"]["scale"])
    t.norm1.bias.data = _t(p["norm"]["bias"])
    t.conv.weight.data = _conv_w(p["conv"]["kernel"])


def _load_res_block(t, p):  # MyronenkoResidualBlock
    _load_conv_block(t.conv1, p["conv1"])
    _load_conv_block(t.conv2, p["conv2"])
    if t.sample is not None:
        t.sample.weight.data = _conv_w(p["sample"]["kernel"])


def _load_layer(t, p):  # MyronenkoLayer
    for j, blk in enumerate(t.blocks):
        _load_res_block(blk, p[f"block{j}"])


def _load_encoder(t, p):  # MyronenkoEncoder / UNetEncoder
    for i, layer in enumerate(t.layers):
        _load_layer(layer, p[f"layer{i}"])
    for i, down in enumerate(t.downsampling_convolutions):
        down.weight.data = _conv_w(p[f"down{i}"]["kernel"])


def _load_mirrored_decoder(t, p):  # MirroredDecoder / UNetDecoder
    for i, lay in enumerate(t.layers):
        _load_layer(lay, p[f"layer{i}"])
    for i in range(len(t.layers) - 1):
        if t.use_transposed_convolutions:
            t.upsampling_blocks[i].weight.data = _transp_w(p[f"up{i}"]["kernel"])
            t.upsampling_blocks[i].bias.data = _t(p[f"up{i}"]["bias"])
        else:
            t.pre_upsampling_blocks[i].weight.data = _conv_w(p[f"pre{i}"]["kernel"])


def _load_var_layer(t, p, reduced_shape, reduced_features):
    """MyronenkoVariationalLayer: the dense weights need an index permutation —
    torch flattens (C,D,H,W) (`variational.py:105`), flax flattens NDHWC."""
    _load_conv_block(t.in_conv, p["in_conv"])
    d, h, w = reduced_shape
    c = reduced_features
    k1 = np.asarray(p["var_block"]["dense1"]["kernel"])  # (in, 2F), in=(d,h,w,c)
    k1 = k1.reshape(d, h, w, c, -1).transpose(3, 0, 1, 2, 4).reshape(k1.shape)
    t.var_block.dense1.weight.data = torch.tensor(k1.T.copy())
    t.var_block.dense1.bias.data = _t(p["var_block"]["dense1"]["bias"])
    k2 = np.asarray(p["var_block"]["dense2"]["kernel"])  # (F, out), out=(d,h,w,c)
    k2 = k2.reshape(-1, d, h, w, c).transpose(0, 4, 1, 2, 3).reshape(k2.shape)
    t.var_block.dense2.weight.data = torch.tensor(k2.T.copy())
    b2 = np.asarray(p["var_block"]["dense2"]["bias"])
    b2 = b2.reshape(d, h, w, c).transpose(3, 0, 1, 2).reshape(-1)
    t.var_block.dense2.bias.data = torch.tensor(b2.copy())
    t.out_conv.weight.data = _conv_w(p["out_conv"]["kernel"])


# ---- Myronenko encoder ----

def test_myronenko_encoder(ref):
    from unet3d_tpu.models.myronenko import MyronenkoEncoder

    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8, 2), jnp.float32)
    model = MyronenkoEncoder(base_width=4, layer_blocks=(1, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)

    tmod = ref.myr.MyronenkoEncoder(n_features=2, base_width=4,
                                    layer_blocks=[1, 2]).eval()
    _load_encoder(tmod, params)
    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


# ---- MirroredDecoder, both upsampling modes ----

@pytest.mark.parametrize("transposed", [False, True])
def test_mirrored_decoder(ref, transposed):
    from unet3d_tpu.models.decoder import MirroredDecoder

    x = jnp.asarray(np.random.RandomState(1).rand(1, 2, 2, 2, 8), jnp.float32)
    model = MirroredDecoder(base_width=4, layer_blocks=(1, 1),
                            use_transposed_convolutions=transposed)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)

    tmod = ref.dec.MirroredDecoder(base_width=4, layer_blocks=[1, 1],
                                   use_transposed_convolutions=transposed).eval()
    _load_mirrored_decoder(tmod, params)
    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


def test_reference_myronenko_decoder_kernal_size_bug(ref):
    """`decoder.py:39` spells the kwarg `kernal_size`; ConvolutionalAutoEncoder
    passes `kernel_size` (`variational.py:51-55`), so the reference's default
    (non-mirrored) decoder path raises. Documented divergence: this framework's
    MyronenkoDecoder accepts kernel_size (models/decoder.py)."""
    with pytest.raises(TypeError, match="kernel_size|kernal_size"):
        ref.var.ConvolutionalAutoEncoder(n_features=2, base_width=4,
                                         encoder_blocks=[1, 1])


# ---- ConvolutionalAutoEncoder (mirrored path — the one that works) ----

def test_convolutional_autoencoder(ref):
    from unet3d_tpu.models.variational import ConvolutionalAutoEncoder

    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 8, 2), jnp.float32)
    model = ConvolutionalAutoEncoder(n_features=2, base_width=4,
                                     encoder_blocks=(1, 1),
                                     decoder_mirrors_encoder=True)
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    out = model.apply({"params": params}, x)

    tmod = ref.var.ConvolutionalAutoEncoder(
        n_features=2, base_width=4, encoder_blocks=[1, 1],
        decoder_mirrors_encoder=True).eval()
    _load_encoder(tmod.encoder, params["encoder"])
    _load_mirrored_decoder(tmod.decoder, params["decoder"])
    tmod.final_convolution.weight.data = _conv_w(params["final_convolution"]["kernel"])
    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


# ---- VariationalAutoEncoder ----

def test_variational_autoencoder(ref):
    from unet3d_tpu.models.variational import VariationalAutoEncoder

    x = jnp.asarray(np.random.RandomState(3).rand(1, 8, 8, 8, 2), jnp.float32)
    model = VariationalAutoEncoder(n_features=2, base_width=4,
                                   encoder_blocks=(1, 1),
                                   decoder_mirrors_encoder=True,
                                   input_shape=(8, 8, 8),
                                   n_reduced_latent_feature_maps=4,
                                   vae_features=8)
    params = model.init({"params": jax.random.PRNGKey(3),
                         "sample": jax.random.PRNGKey(4)}, x)["params"]
    # train=False -> deterministic mu-decode; the torch side gets
    # reparameterize patched to z=mu to remove the eps draw.
    out, mu, logvar = model.apply({"params": params}, x)

    tmod = ref.var.VariationalAutoEncoder(
        n_features=2, base_width=4, encoder_blocks=[1, 1],
        decoder_class=None, decoder_mirrors_encoder=True, input_shape=(8, 8, 8),
        n_reduced_latent_feature_maps=4, vae_features=8).eval()
    _load_encoder(tmod.encoder, params["encoder"])
    _load_var_layer(tmod.var_layer, params["var_layer"],
                    reduced_shape=(2, 2, 2), reduced_features=4)
    _load_mirrored_decoder(tmod.decoder, params["decoder"])
    tmod.final_convolution.weight.data = _conv_w(params["final_convolution"]["kernel"])

    orig = ref.var.VariationalBlock.reparameterize
    ref.var.VariationalBlock.reparameterize = staticmethod(lambda mu, logvar: mu)
    try:
        with torch.no_grad():
            ref_out, ref_mu, ref_logvar = tmod(_nchw(x))
    finally:
        ref.var.VariationalBlock.reparameterize = orig
    np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=3e-4)


# ---- UNet3D ----

def _build_unet_pair(ref, seed=5, n_outputs=3):
    from unet3d_tpu.models.unet import UNet3D

    x = jnp.asarray(np.random.RandomState(seed).rand(1, 8, 8, 8, 2), jnp.float32)
    model = UNet3D(n_features=2, base_width=4, encoder_blocks=(1, 1),
                   n_outputs=n_outputs)
    params = model.init(jax.random.PRNGKey(seed), x)["params"]

    tmod = ref.unet.UNet3D(n_features=2, base_width=4, encoder_blocks=[1, 1],
                           n_outputs=n_outputs).eval()
    _load_encoder(tmod.encoder, params["encoder"])
    _load_mirrored_decoder(tmod.decoder, params["decoder"])
    tmod.final_convolution.weight.data = _conv_w(params["final_convolution"]["kernel"])
    return model, params, tmod, x


def test_reference_unet_missing_F_bug(ref):
    """`unet.py:38` references `F` without importing it: the reference's
    UNet3D forward always raises NameError. Documented divergence (fixed in
    models/decoder.py `_center_pad_to`)."""
    _, _, tmod, x = _build_unet_pair(ref)
    if hasattr(ref.unet, "F"):
        pytest.skip("F was injected by a previous parity test")
    with pytest.raises(NameError, match="F"):
        with torch.no_grad():
            tmod(_nchw(x))


def test_unet3d(ref):
    model, params, tmod, x = _build_unet_pair(ref)
    out = model.apply({"params": params}, x)
    ref.unet.F = torch.nn.functional  # fix the reference bug for the comparison
    try:
        with torch.no_grad():
            ref_out = tmod(_nchw(x))
    finally:
        del ref.unet.F
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


# ---- ResNet / ResNeXt ----

def _randomize_batch_stats(stats, seed):
    rng = np.random.RandomState(seed)

    def fn(path, leaf):
        name = path[-1].key
        arr = np.asarray(leaf)
        if name == "mean":
            return jnp.asarray(rng.uniform(-0.3, 0.3, arr.shape), jnp.float32)
        return jnp.asarray(rng.uniform(0.5, 1.5, arr.shape), jnp.float32)

    return jax.tree_util.tree_map_with_path(fn, stats)


def _load_bn(tbn, p, s):
    tbn.weight.data = _t(p["scale"])
    tbn.bias.data = _t(p["bias"])
    tbn.running_mean.data = _t(s["mean"])
    tbn.running_var.data = _t(s["var"])


def _load_resnet(tmod, params, stats):
    tmod.conv1.weight.data = _conv_w(params["conv1"]["kernel"])
    _load_bn(tmod.bn1, params["bn1"], stats["bn1"])
    for stage in range(4):
        tl = getattr(tmod, f"layer{stage + 1}")
        for b, blk in enumerate(tl):
            p = params[f"layer{stage + 1}_block{b}"]
            s = stats[f"layer{stage + 1}_block{b}"]
            for name in ("conv1", "conv2", "conv3"):
                if name in p:
                    getattr(blk, name).weight.data = _conv_w(p[name]["kernel"])
            for name in ("bn1", "bn2", "bn3"):
                if name in p:
                    _load_bn(getattr(blk, name), p[name], s[name])
            if blk.downsample is not None:
                blk.downsample[0].weight.data = _conv_w(p["downsample_conv"]["kernel"])
                _load_bn(blk.downsample[1], p["downsample_bn"], s["downsample_bn"])
    tmod.fc.weight.data = _t(params["fc"]["kernel"]).T.contiguous()
    tmod.fc.bias.data = _t(params["fc"]["bias"])


@pytest.mark.parametrize("kind", ["basic", "bottleneck_grouped"])
def test_resnet(ref, kind):
    from unet3d_tpu.models import resnet as our_res

    if kind == "basic":
        model = our_res.ResNet(block=our_res.BasicBlock, layers=(1, 1, 1, 1),
                               n_outputs=5)
        tmod = ref.res.ResNet(ref.res.BasicBlock, [1, 1, 1, 1], n_outputs=5,
                              n_features=2).eval()
    else:  # ResNeXt-style grouped bottleneck
        model = our_res.ResNet(block=our_res.Bottleneck, layers=(1, 1, 1, 1),
                               n_outputs=5, groups=2, width_per_group=4)
        tmod = ref.res.ResNet(ref.res.Bottleneck, [1, 1, 1, 1], n_outputs=5,
                              n_features=2, groups=2, width_per_group=4).eval()

    x = jnp.asarray(np.random.RandomState(6).rand(1, 16, 16, 16, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(6), x)
    stats = _randomize_batch_stats(variables["batch_stats"], seed=7)
    out = model.apply({"params": variables["params"], "batch_stats": stats}, x)

    _load_resnet(tmod, variables["params"], stats)
    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-3, atol=1e-3)


# ---- VQ-VAE-2 ----

def test_reference_vqvae_encode_permute_bug(ref):
    """`vqvae2.py:204` permutes the 5D quant_t with 4 indices: the reference's
    encode/forward always raises. Documented divergence (models/vqvae2.py stays
    NDHWC so no permute exists)."""
    tmod = ref.vq.VQVAE(in_channel=2, channel=8, n_res_block=1, n_res_channel=4,
                        embed_dim=4, n_embed=16).eval()
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            tmod(torch.zeros(1, 2, 16, 16, 16))


def test_vqvae_quantize(ref):
    from unet3d_tpu.models.vqvae2 import Quantize

    x = jnp.asarray(np.random.RandomState(8).rand(1, 2, 2, 2, 4), jnp.float32)
    q = Quantize(dim=4, n_embed=16)
    variables = q.init({"params": jax.random.PRNGKey(8)}, x)
    quant, diff, ind = q.apply(variables, x)

    tq = ref.vq.Quantize(dim=4, n_embed=16).eval()
    tq.embed.data = _t(variables["codebook"]["embed"])
    tq.embed_avg.data = _t(variables["codebook"]["embed_avg"])
    tq.cluster_size.data = _t(variables["codebook"]["cluster_size"])
    with torch.no_grad():
        tquant, tdiff, tind = tq(torch.tensor(np.asarray(x).copy()))
    np.testing.assert_array_equal(np.asarray(ind), tind.numpy())
    np.testing.assert_allclose(np.asarray(quant), tquant.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(diff), float(tdiff), rtol=2e-4, atol=2e-6)


def _load_vq_resblock(t, p):
    t.conv[1].weight.data = _conv_w(p["conv1"]["kernel"])
    t.conv[1].bias.data = _t(p["conv1"]["bias"])
    t.conv[3].weight.data = _conv_w(p["conv2"]["kernel"])
    t.conv[3].bias.data = _t(p["conv2"]["bias"])


def _load_vq_encoder(t, p, stride, n_res_block):
    convs = [("down1", 0), ("down2", 2), ("conv", 4)] if stride == 4 else \
        [("down1", 0), ("conv", 2)]
    for name, idx in convs:
        t.blocks[idx].weight.data = _conv_w(p[name]["kernel"])
        t.blocks[idx].bias.data = _t(p[name]["bias"])
    base = convs[-1][1] + 1
    for i in range(n_res_block):
        _load_vq_resblock(t.blocks[base + i], p[f"res{i}"])


def _load_vq_decoder(t, p, stride, n_res_block):
    t.blocks[0].weight.data = _conv_w(p["conv"]["kernel"])
    t.blocks[0].bias.data = _t(p["conv"]["bias"])
    for i in range(n_res_block):
        _load_vq_resblock(t.blocks[1 + i], p[f"res{i}"])
    base = 1 + n_res_block + 1  # past the ReLU
    if stride == 4:
        ups = [("up1", base), ("up2", base + 2)]
    else:
        ups = [("up1", base)]
    for name, idx in ups:
        t.blocks[idx].weight.data = _transp_w(p[name]["kernel"])
        t.blocks[idx].bias.data = _t(p[name]["bias"])


@pytest.mark.parametrize("stride", [2, 4])
def test_vqvae_encoder(ref, stride):
    from unet3d_tpu.models.vqvae2 import Encoder

    x = jnp.asarray(np.random.RandomState(9).rand(1, 8, 8, 8, 2), jnp.float32)
    model = Encoder(channel=8, n_res_block=1, n_res_channel=4, stride=stride)
    params = model.init(jax.random.PRNGKey(9), x)["params"]
    out = model.apply({"params": params}, x)

    tmod = ref.vq.Encoder(2, 8, 1, 4, stride=stride).eval()
    _load_vq_encoder(tmod, params, stride, n_res_block=1)
    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("stride", [2, 4])
def test_vqvae_decoder(ref, stride):
    from unet3d_tpu.models.vqvae2 import Decoder

    x = jnp.asarray(np.random.RandomState(10).rand(1, 2, 2, 2, 4), jnp.float32)
    model = Decoder(out_channel=2, channel=8, n_res_block=1, n_res_channel=4,
                    stride=stride)
    params = model.init(jax.random.PRNGKey(10), x)["params"]
    out = model.apply({"params": params}, x)

    tmod = ref.vq.Decoder(4, 2, 8, 1, 4, stride=stride).eval()
    _load_vq_decoder(tmod, params, stride, n_res_block=1)
    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


def test_vqvae_decode(ref):
    """Full two-level decode (upsample_t + joint decoder), `vqvae2.py:217-222`."""
    from unet3d_tpu.models.vqvae2 import VQVAE

    rng = np.random.RandomState(11)
    model = VQVAE(in_channel=2, channel=8, n_res_block=1, n_res_channel=4,
                  embed_dim=4, n_embed=16)
    x0 = jnp.asarray(rng.rand(1, 16, 16, 16, 2), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(11)}, x0)
    qt = jnp.asarray(rng.rand(1, 2, 2, 2, 4), jnp.float32)
    qb = jnp.asarray(rng.rand(1, 4, 4, 4, 4), jnp.float32)
    out = model.apply(variables, qt, qb, method=VQVAE.decode)

    tmod = ref.vq.VQVAE(in_channel=2, channel=8, n_res_block=1, n_res_channel=4,
                        embed_dim=4, n_embed=16).eval()
    params = variables["params"]
    tmod.upsample_t.weight.data = _transp_w(params["upsample_t"]["kernel"])
    tmod.upsample_t.bias.data = _t(params["upsample_t"]["bias"])
    _load_vq_decoder(tmod.dec, params["dec"], stride=4, n_res_block=1)
    with torch.no_grad():
        ref_out = tmod.decode(_nchw(qt), _nchw(qb))
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref_out),
                               rtol=2e-4, atol=2e-4)


# ---- FCN (fcn/fcn.py:4-18) ----

def test_fcn(ref):
    from unet3d_tpu.models.fcn import FCN

    rng = np.random.RandomState(13)
    model = FCN(hidden_layers_list=(8, 6), n_inputs=5, n_outputs=3)
    x = jnp.asarray(rng.rand(4, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(13), x)
    out = model.apply(variables, x)

    tmod = ref.fcn.FCN(hidden_layers_list=[8, 6], n_inputs=5, n_outputs=3).eval()
    p = variables["params"]
    linears = [m for m in tmod.network if isinstance(m, torch.nn.Linear)]
    for t, name in zip(linears, ("hidden0", "hidden1", "out")):
        t.weight.data = _t(np.asarray(p[name]["kernel"]).T)
        t.bias.data = _t(p[name]["bias"])
    with torch.no_grad():
        ref_out = tmod(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-6)


# ---- Graph layers (graph/graph_cmr_layers.py) ----
# The reference multiplies a sparse adjacency through the SparseMM autograd
# workaround; a DENSE torch adjacency runs the same math, so the transplant
# pins the dense-MXU redesign (models/graph.py) against the actual source.

def _dense_adjacency(v, seed=5):
    rng = np.random.RandomState(seed)
    adj = (rng.rand(v, v) < 0.3).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 1.0)
    return adj / adj.sum(axis=1, keepdims=True)


def test_graph_linear(ref):
    from unet3d_tpu.models.graph import GraphLinear

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 6, 10), jnp.float32)  # (B, C, V)
    model = GraphLinear(out_channels=4)
    variables = model.init(jax.random.PRNGKey(7), x)
    out = model.apply(variables, x)

    tmod = ref.graph.GraphLinear(6, 4).eval()
    tmod.W.data = _t(variables["params"]["W"])
    tmod.b.data = _t(variables["params"]["b"])
    with torch.no_grad():
        ref_out = tmod(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_graph_convolution(ref):
    from unet3d_tpu.models.graph import GraphConvolution

    rng = np.random.RandomState(8)
    v = 10
    adj = _dense_adjacency(v)
    x = jnp.asarray(rng.rand(1, v, 6), jnp.float32)  # ours: (B, V, C)
    model = GraphConvolution(out_features=4)
    variables = model.init(jax.random.PRNGKey(8), x, jnp.asarray(adj))
    out = model.apply(variables, x, jnp.asarray(adj))

    wrapper = types.SimpleNamespace(adjacency_matrix=torch.tensor(adj))
    tmod = ref.graph.GraphConvolution(6, 4, wrapper).eval()
    tmod.weight.data = _t(variables["params"]["weight"])
    tmod.bias.data = _t(variables["params"]["bias"])
    with torch.no_grad():
        # reference 2D path: (V, C) in, (V, C_out) out
        ref_out = tmod(torch.tensor(np.asarray(x)[0]))
    np.testing.assert_allclose(np.asarray(out)[0], ref_out.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_graph_res_block(ref):
    from unet3d_tpu.models.graph import GraphResBlock

    rng = np.random.RandomState(9)
    v, cin, cout = 12, 16, 32
    adj = _dense_adjacency(v)
    x = jnp.asarray(rng.rand(2, cin, v), jnp.float32)  # (B, C, V)
    model = GraphResBlock(out_channels=cout)
    variables = model.init(jax.random.PRNGKey(9), x, jnp.asarray(adj))
    out = model.apply(variables, x, jnp.asarray(adj))

    wrapper = types.SimpleNamespace(adjacency_matrix=torch.tensor(adj))
    tmod = ref.graph.GraphResBlock(cin, cout, wrapper).eval()
    p = variables["params"]
    for lin, name in ((tmod.lin1, "lin1"), (tmod.lin2, "lin2"),
                      (tmod.skip_conv, "skip_conv")):
        lin.W.data = _t(p[name]["W"])
        lin.b.data = _t(p[name]["b"])
    tmod.conv.weight.data = _t(p["conv"]["weight"])
    tmod.conv.bias.data = _t(p["conv"]["bias"])
    for norm, name in ((tmod.pre_norm, "pre_norm"), (tmod.norm1, "norm1"),
                       (tmod.norm2, "norm2")):
        norm.weight.data = _t(p[name]["scale"])
        norm.bias.data = _t(p[name]["bias"])
    with torch.no_grad():
        ref_out = tmod(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_graph_cmr(ref):
    """Full GraphCMR net vs the actual reference source (graph_cmr_net.py:17-59):
    resnet_18 encoder + ref-vertex/feature concat + graph stack + shape head.
    A dense torch adjacency runs the reference's SparseMM path unmodified."""
    import unet3d.models.pytorch.graph.graph_cmr_net as ref_net

    from unet3d_tpu.models.graph import GraphCMR

    rng = np.random.RandomState(21)
    v = 12
    adj = _dense_adjacency(v)
    ref_vertices = rng.rand(3, v).astype(np.float32)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 2), jnp.float32)

    model = GraphCMR(ref_vertices=ref_vertices, adjacency_matrix=adj,
                     n_layers=1, n_channels=32, encoder_outputs=16)
    variables = model.init(jax.random.PRNGKey(21), x)
    stats = _randomize_batch_stats(variables["batch_stats"], seed=22)
    out = model.apply({"params": variables["params"], "batch_stats": stats}, x)

    tmod = ref_net.GraphCMR(
        ref_vertices=torch.tensor(ref_vertices),
        adjacency_matrix=torch.tensor(adj), n_layers=1, n_channels=32,
        encoder_outputs=16, n_features=2).eval()
    p = variables["params"]
    _load_resnet(tmod.encoder, p["encoder"],
                 {"encoder": stats["encoder"]}["encoder"])

    def _load_graph_lin(t, q):
        t.W.data = _t(q["W"])
        t.b.data = _t(q["b"])

    def _load_graph_block(t, q):
        for lin, name in ((t.lin1, "lin1"), (t.lin2, "lin2")):
            _load_graph_lin(lin, q[name])
        if t.in_channels != t.out_channels:
            _load_graph_lin(t.skip_conv, q["skip_conv"])
        t.conv.weight.data = _t(q["conv"]["weight"])
        t.conv.bias.data = _t(q["conv"]["bias"])
        for norm, name in ((t.pre_norm, "pre_norm"), (t.norm1, "norm1"),
                           (t.norm2, "norm2")):
            norm.weight.data = _t(q[name]["scale"])
            norm.bias.data = _t(q[name]["bias"])

    _load_graph_lin(tmod.gc[0], p["gc_lin"])
    _load_graph_block(tmod.gc[1], p["gc_block0"])
    _load_graph_block(tmod.gc[2], p["gc_block1"])
    _load_graph_block(tmod.shape[0], p["shape_block0"])
    _load_graph_block(tmod.shape[1], p["shape_block1"])
    tmod.shape[2].weight.data = _t(p["shape_norm"]["scale"])
    tmod.shape[2].bias.data = _t(p["shape_norm"]["bias"])
    _load_graph_lin(tmod.shape[4], p["shape_out"])

    with torch.no_grad():
        ref_out = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_reference_regularized_resnet_hits_kernal_size_bug(ref):
    """`classification/custom.py:8-23` RegularizedResNet defaults route through
    VariationalAutoEncoder's MyronenkoDecoder path, which passes `kernel_size`
    into the `kernal_size`-typo signature (`decoder.py:39`): the reference
    class cannot be constructed without opting into decoder_mirrors_encoder.
    models/custom.py implements the as-if-fixed MyronenkoDecoder path; its
    encoder/var-layer/decoder pieces are transplant-pinned individually above."""
    import unet3d.models.pytorch.classification.custom as ref_custom

    with pytest.raises(TypeError, match="kernal_size|unexpected keyword"):
        ref_custom.RegularizedResNet(n_outputs=2, input_shape=(16, 16, 16))
