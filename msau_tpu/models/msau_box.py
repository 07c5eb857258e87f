"""Box-convolution MSAU variant (reference model/model_box.py).

Identical 3-stage coupled topology to MSAUNet, with every residual
multi-conv block replaced by a ``MultiBoxConvBlock``: num_convs repetitions
of [BoxConv2d (C -> C*B box responses) -> 1x1 conv (C*B -> C)] inside a
residual connection (model_box.py:9-59).  The box filters are the
TPU-native integral-image op in msau_tpu/ops/boxconv.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from msau_tpu.config import ModelConfig
from msau_tpu.models.layers import ConvBnLrnDrop, get_activation
from msau_tpu.ops.boxconv import BoxConv2d


class MultiBoxConvBlock(nn.Module):
    """relu(x) -> num_convs x [BoxConv -> 1x1 conv] -> +x -> activation."""

    channels: int
    num_convs: int
    num_boxes: int
    max_box_size: int
    activation: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        orig = x
        y = jax.nn.relu(x)
        for i in range(self.num_convs):
            y = BoxConv2d(
                channels=self.channels,
                num_boxes=self.num_boxes,
                max_h=self.max_box_size,
                max_w=self.max_box_size,
                dtype=self.dtype,
                name=f"box_conv_{i}",
            )(y)
            act = self.activation if i < self.num_convs - 1 else None
            y = ConvBnLrnDrop(
                features=self.channels,
                kernel_size=(1, 1),
                activation=act,
                dtype=self.dtype,
                name=f"proj_conv_{i}",
            )(y, train=train)
        y = y + orig
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        return y


class BMSAUNet(nn.Module):
    """MSAU topology with box-conv residual blocks (model_box.py:313-357)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        # import here to avoid a module cycle
        from msau_tpu.models.msau import MSAUNet

        cfg = self.config
        return MSAUNet(config=cfg, block_variant="box", name="bmsau")(
            x, train=train
        )
