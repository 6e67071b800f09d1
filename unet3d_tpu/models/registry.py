"""Model registry: config ``name`` -> Flax module, plus parameter init.

Parity: `unet3d/models/build.py:9-29` (name lookup over a merged namespace) —
here an explicit registry instead of star-import getattr, covering both the
in-repo Myronenko family and the MONAI-name workhorses the example configs use
(DynUNet; SegResNet-style nets map onto the Myronenko family).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from unet3d_tpu.models import resnet as resnet_lib
from unet3d_tpu.models.ahnet import AHNet
from unet3d_tpu.models.attentionunet import AttentionUnet
from unet3d_tpu.models.basicunet import BasicUNet
from unet3d_tpu.models.basicunetplusplus import BasicUNetPlusPlus
from unet3d_tpu.models.custom import (RegularizedBasicResNet, RegularizedResNet,
                                      ResNetWithDecoder1D)
from unet3d_tpu.models.densenet import (DenseNet, DenseNet121, DenseNet169,
                                        DenseNet201, DenseNet264)
from unet3d_tpu.models.dints import DiNTS, TopologyInstance, TopologySearch
from unet3d_tpu.models.dynunet import DynUNet
from unet3d_tpu.models.efficientnet import EfficientNetBN
from unet3d_tpu.models.fcn import FCN
from unet3d_tpu.models.graph import GraphCMR
from unet3d_tpu.models.highresnet import HighResNet
from unet3d_tpu.models.monai_autoencoder import AutoEncoder, VarAutoEncoder
from unet3d_tpu.models.monai_heads import (Classifier, Critic, Discriminator,
                                           Generator, Regressor)
from unet3d_tpu.models.monai_unet import UNet
from unet3d_tpu.models.quicknat import Quicknat
from unet3d_tpu.models.regunet import GlobalNet, LocalNet, RegUNet
from unet3d_tpu.models.segresnet import SegResNet, SegResNetVAE
from unet3d_tpu.models.segresnet_ds import SegResNetDS
from unet3d_tpu.models.swin_unetr import SwinUNETR
from unet3d_tpu.models.unetr import UNETR
from unet3d_tpu.models.unet import AutocastUNet, AutoImplantUNet, UNet3D
from unet3d_tpu.models.variational import (ConvolutionalAutoEncoder,
                                           LabeledVariationalAutoEncoder,
                                           VariationalAutoEncoder)
from unet3d_tpu.models.vit import ViT, ViTAutoEnc
from unet3d_tpu.models.vnet import VNet
from unet3d_tpu.models.vqvae2 import VQVAE

MODEL_REGISTRY: Dict[str, Any] = {
    "UNet3D": UNet3D,
    "AutocastUNet": AutocastUNet,
    "AutoImplantUNet": AutoImplantUNet,
    "DynUNet": DynUNet,
    "SegResNet": SegResNet,
    "SegResNetVAE": SegResNetVAE,
    "SegResNetDS": SegResNetDS,
    "DenseNet": DenseNet,
    "UNETR": UNETR,
    "SwinUNETR": SwinUNETR,
    "UNet": UNet,
    "BasicUNet": BasicUNet,
    "BasicUNetPlusPlus": BasicUNetPlusPlus,
    "BasicUnetPlusPlus": BasicUNetPlusPlus,   # MONAI exports both casings
    "AttentionUnet": AttentionUnet,
    "AHNet": AHNet,
    "AHnet": AHNet,          # MONAI exports AHNet/AHnet/Ahnet aliases
    "Ahnet": AHNet,
    "DiNTS": DiNTS,
    "TopologyInstance": TopologyInstance,   # search-space objects: resolvable
    "TopologySearch": TopologySearch,       # by name for namespace parity
    "TopologyConstruction": TopologyInstance,  # MONAI base-class alias
    "Quicknat": Quicknat,
    "QuickNAT": Quicknat,
    "VNet": VNet,
    "HighResNet": HighResNet,
    "EfficientNetBN": EfficientNetBN,
    "RegUNet": RegUNet,
    "GlobalNet": GlobalNet,
    "LocalNet": LocalNet,
    "ViT": ViT,
    "ViTAutoEnc": ViTAutoEnc,
    "AutoEncoder": AutoEncoder,
    "VarAutoEncoder": VarAutoEncoder,
    "Regressor": Regressor,
    "Classifier": Classifier,
    "Discriminator": Discriminator,
    "Critic": Critic,
    "Generator": Generator,
    "ConvolutionalAutoEncoder": ConvolutionalAutoEncoder,
    "VariationalAutoEncoder": VariationalAutoEncoder,
    "LabeledVariationalAutoEncoder": LabeledVariationalAutoEncoder,
    "ResNet": resnet_lib.ResNet,
    "VQVAE": VQVAE,
    "FCN": FCN,
    "GraphCMR": GraphCMR,
    "RegularizedResNet": RegularizedResNet,
    "RegularizedBasicResNet": RegularizedBasicResNet,
    "ResNetWithDecoder1D": ResNetWithDecoder1D,
}

_FACTORIES = {
    "DenseNet121": DenseNet121,
    "DenseNet169": DenseNet169,
    "DenseNet201": DenseNet201,
    "DenseNet264": DenseNet264,
    "resnet_18": resnet_lib.resnet_18,
    "resnet_34": resnet_lib.resnet_34,
    "resnet_50": resnet_lib.resnet_50,
    "resnet_101": resnet_lib.resnet_101,
    "resnet_152": resnet_lib.resnet_152,
    "resnext_50_32x4d": resnet_lib.resnext_50_32x4d,
    "resnext_101_32x8d": resnet_lib.resnext_101_32x8d,
}


def _freeze_lists(value):
    """Config JSON lists -> tuples so they are valid (hashable) module fields."""
    if isinstance(value, list):
        return tuple(_freeze_lists(v) for v in value)
    return value


# MONAI names the reference's star-import would resolve but that have no
# native implementation here yet; listed so the error is actionable.
_KNOWN_MONAI_UNIMPLEMENTED = ()


def fetch_model_by_name(model_name: str):
    """Parity: `unet3d/models/build.py:9-13` including the error contract."""
    if model_name in MODEL_REGISTRY:
        return MODEL_REGISTRY[model_name]
    if model_name in _FACTORIES:
        return _FACTORIES[model_name]
    supported = sorted(list(MODEL_REGISTRY) + list(_FACTORIES))
    hint = ""
    if model_name in _KNOWN_MONAI_UNIMPLEMENTED:
        hint = (f" ({model_name} is a MONAI net the reference resolves via its "
                f"star-import but has no native TPU implementation here yet)")
    raise ValueError(f"model name {model_name} not supported{hint}; "
                     f"supported names: {', '.join(supported)}")


def create_model(model_name: str, /, **kwargs):
    """Instantiate a model module from config-section kwargs.

    Positional-only first arg: MONAI's EfficientNetBN takes its variant as a
    ``model_name`` kwarg, which must pass through to the module untouched."""
    cls = fetch_model_by_name(model_name)
    kwargs = {k: _freeze_lists(v) for k, v in kwargs.items()}
    return cls(**kwargs)


def model_input_channels(model, default: int = 1) -> int:
    for attr in ("in_channels", "n_features"):
        if hasattr(model, attr):
            return int(getattr(model, attr))
    return default


def _reduced_init_shape(input_shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Shrink large spatial dims to 32 (keeping /32 divisibility) for init.

    32 stays divisible through the deepest stride ladder any config ships
    (5 stride-2 boundaries); dims that aren't a multiple of 32 are kept."""
    spatial, channels = input_shape[:-1], input_shape[-1:]
    reduced = tuple(32 if (s > 32 and s % 32 == 0) else int(s) for s in spatial)
    return reduced + tuple(int(c) for c in channels)


def init_params(model, input_shape: Tuple[int, ...], seed: int = 0,
                train: bool = False) -> Dict:
    """Initialize variables for an NDHWC input of ``input_shape`` (without batch).

    For spatial-size-independent models (CNNs — the whole config-reachable
    zoo) the init forward runs at a reduced spatial shape: a 192^3 init
    forward is pure waste (7 min on the CPU backend, seconds of TPU compile).
    Safety: ``jax.eval_shape`` (abstract, no FLOPs) proves the full variable
    tree — every collection, shape and dtype — is identical between the
    reduced and requested shapes before the cheap init is used; models with
    spatially-dependent params (ViT position embeddings, VAE dense layers)
    fall back to the requested shape automatically.
    """
    rng = jax.random.PRNGKey(seed)
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1),
            "sample": jax.random.fold_in(rng, 2)}
    full = (1,) + tuple(input_shape)
    reduced = (1,) + _reduced_init_shape(tuple(input_shape))
    if reduced != full:
        try:
            def abstract(shape):
                x = jax.ShapeDtypeStruct(shape, jnp.float32)
                tree = jax.eval_shape(lambda r, v: model.init(r, v, train),
                                      rngs, x)
                leaves, treedef = jax.tree_util.tree_flatten(tree)
                return [(leaf.shape, leaf.dtype) for leaf in leaves], treedef
            if abstract(reduced) == abstract(full):
                return model.init(rngs, jnp.zeros(reduced, jnp.float32), train)
        except Exception:
            pass  # shapes invalid for this model: init at the requested shape
    x = jnp.zeros(full, dtype=jnp.float32)
    # `train` positional: remat-wrapped models mark it static by position
    return model.init(rngs, x, train)
