"""Fully-connected network (MLP). Parity: `unet3d/models/pytorch/fcn/fcn.py:4-18`."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class FCN(nn.Module):
    """Linear/ReLU stack: hidden_layers_list then a final linear to n_outputs."""
    hidden_layers_list: Tuple[int, ...]
    n_inputs: int  # kept for config parity; Flax infers the input width
    n_outputs: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        for i, width in enumerate(self.hidden_layers_list):
            x = nn.relu(nn.Dense(width, name=f"hidden{i}")(x))
        return nn.Dense(self.n_outputs, name="out")(x)
