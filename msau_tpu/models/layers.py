"""Layer library: conv / dilated conv / deconv blocks with TF-SAME semantics.

TPU-first notes
---------------
* Everything is NHWC — the native layout for XLA:TPU convolutions; the MXU
  consumes [N*H*W, KH*KW*Cin] x [KH*KW*Cin, Cout] tiles directly.
* ``padding='SAME'`` in XLA reproduces exactly the asymmetric TF-SAME padding
  the reference emulates by hand (reference: model/layers/utils.py:5-28);
  for even kernels the extra pixel lands bottom/right, for atrous convs the
  effective kernel size is used.  No manual padding needed.
* Initialization follows the reference TF-style scheme
  (model/layers/layers.py:33-41,59-60): weight ~ N(0, sqrt(2/(kh*kw*cin+cout))),
  bias ~ N(0.1, 1e-5).
* LRN (torch.nn.LocalResponseNorm with size == n_features, the reference
  default for dilated convs, model/layers/layers.py:75,145) is implemented
  with a channel-axis sliding-window sum via cumsum — cheap on the VPU and
  fuses with the surrounding ops.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def tf_conv_kernel_init(kh: int, kw: int, cin: int, cout: int):
    """stddev = sqrt(2 / (kh*kw*cin + cout)) — reference initOpt=0."""
    stddev = (2.0 / (kh * kw * cin + cout)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(stddev, dtype)

    return init


def tf_bias_init(mean: float = 0.1, stddev: float = 1e-5):
    def init(key, shape, dtype=jnp.float32):
        return mean + jax.random.normal(key, shape, dtype) * jnp.asarray(stddev, dtype)

    return init


def get_activation(name: Optional[str]) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    if name is None or name == "none":
        return None
    return {
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "gelu": jax.nn.gelu,
        "identity": lambda x: x,
    }[name]


def _lrn_window_matrix(c: int, size: int, dtype) -> jnp.ndarray:
    """M[c_in, c_out] = 1 iff c_in lies in c_out's LRN window."""
    lo = size // 2
    hi = (size - 1) // 2
    ci = jnp.arange(c)[:, None]
    co = jnp.arange(c)[None, :]
    return ((ci >= co - lo) & (ci <= co + hi)).astype(dtype)


def local_response_norm(
    x: jnp.ndarray,
    size: int,
    alpha: float = 1e-4,
    beta: float = 0.75,
    k: float = 1.0,
) -> jnp.ndarray:
    """torch.nn.LocalResponseNorm semantics on NHWC input.

    b_c = a_c / (k + alpha/size * sum_{c' in window(c)} a_{c'}^2)^beta with the
    window [c - size//2, c + (size-1)//2] clamped to the channel range —
    matching torch's avg_pool3d-based implementation used by the reference
    (model/layers/layers.py:75,145).
    """
    sq = jnp.square(x)
    c = x.shape[-1]
    # windowed channel sum as one [C, C] binary-matrix contraction: a
    # cumsum over the channel axis lowers to an XLA while loop on TPU
    # (measured 8.5 ms per instance at 512^2 in the train-step profile),
    # while this is a single fused dot over a tiny static matrix.
    win = jnp.einsum("...c,cd->...d", sq, _lrn_window_matrix(c, size, sq.dtype))
    denom = jnp.power(k + (alpha / size) * win, beta)
    return x / denom


class ConvBnLrnDrop(nn.Module):
    """Conv2d + optional BatchNorm / LRN / Dropout, TF-SAME padding.

    Mirrors reference ``Conv2dBnLrnDrop`` (model/layers/layers.py:10-102).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    activation: Optional[str] = "relu"
    use_bn: bool = False
    use_lrn: bool = False
    keep_prob: float = 1.0
    padding: str = "SAME"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 geom=None) -> jnp.ndarray:
        kh, kw = self.kernel_size
        if geom is not None:
            # body-flat branch (x: [N, C, LB]); param tree matches nn.Conv;
            # activation + LRN fuse into the conv kernel's epilogue
            # (flat_conv2d act/lrn_size — falls back to XLA ops for
            # chunked or non-relu/elu cases)
            from msau_tpu.models.flat_layers import FlatConvOp

            assert not self.use_bn and self.strides == (1, 1)
            y = FlatConvOp(
                features=self.features, kernel_size=self.kernel_size,
                dtype=self.dtype, name="Conv_0",
                act=self.activation,
                lrn_size=self.features if self.use_lrn else None,
            )(x, geom)
            if self.keep_prob < 1.0:
                y = nn.Dropout(rate=1.0 - self.keep_prob,
                               deterministic=not train)(y)
            return y
        cin = x.shape[-1]
        y = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            kernel_init=tf_conv_kernel_init(kh, kw, cin, self.features),
            bias_init=tf_bias_init(),
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        if self.use_lrn:
            y = local_response_norm(y, size=self.features)
        if self.keep_prob < 1.0:
            y = nn.Dropout(rate=1.0 - self.keep_prob, deterministic=not train)(y)
        return y


class DilConvBnLrnDrop(nn.Module):
    """Dilated (atrous) conv; LRN on by default, matching the reference
    ``DilConv2dBnLrnDrop`` (model/layers/layers.py:105-164).

    XLA 'SAME' with kernel_dilation pads by the effective kernel size —
    identical to the reference's atrous_conv2d SAME emulation
    (model/layers/utils.py:21-26).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    rate: int = 1
    activation: Optional[str] = "relu"
    use_bn: bool = False
    use_lrn: bool = True
    keep_prob: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 geom=None) -> jnp.ndarray:
        kh, kw = self.kernel_size
        if geom is not None:
            from msau_tpu.models.flat_layers import FlatConvOp

            assert not self.use_bn
            y = FlatConvOp(
                features=self.features, kernel_size=self.kernel_size,
                dilation=self.rate, dtype=self.dtype, name="Conv_0",
                act=self.activation,
                lrn_size=self.features if self.use_lrn else None,
            )(x, geom)
            if self.keep_prob < 1.0:
                y = nn.Dropout(rate=1.0 - self.keep_prob,
                               deterministic=not train)(y)
            return y
        cin = x.shape[-1]
        y = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=(1, 1),
            padding="SAME",
            kernel_dilation=(self.rate, self.rate),
            kernel_init=tf_conv_kernel_init(kh, kw, cin, self.features),
            bias_init=tf_bias_init(),
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        if self.use_lrn:
            y = local_response_norm(y, size=self.features)
        if self.keep_prob < 1.0:
            y = nn.Dropout(rate=1.0 - self.keep_prob, deterministic=not train)(y)
        return y


class DeconvBnLrnDrop(nn.Module):
    """Stride-2 transposed conv resized to an exact target spatial shape.

    Mirrors reference ``Deconv2DBnLrnDrop`` (model/layers/layers.py:207-260):
    torch ``ConvTranspose2d(stride=s, padding=k//2)`` whose ``output_size=``
    argument picks the per-dim output_padding to match the skip connection
    exactly (model/model.py:230).  Implemented as the equivalent
    input-dilated convolution: dilate by ``stride``, pad
    ``(k-1-p, k-1-p+output_padding)``, correlate — verified bit-exact
    against torch for even and odd targets.  The kernel parameter is stored
    HWIO in this correlation orientation (the spatial flip of torch's
    transposed-conv weight; the Gaussian init is flip-invariant).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 2
    activation: Optional[str] = None
    use_lrn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, target_hw: Tuple[int, int],
                 *, geom_in=None, geom_out=None) -> jnp.ndarray:
        flat = geom_in is not None
        cin = x.shape[1] if flat else x.shape[-1]
        kh, kw = self.kernel_size
        s = self.stride
        # reference stddev uses kernel_shape=[kh, kw, out, in] (layers.py:217)
        kernel = self.param(
            "kernel",
            tf_conv_kernel_init(kh, kw, self.features, cin),
            (kh, kw, cin, self.features),
        )
        bias = self.param("bias", tf_bias_init(), (self.features,))
        ph, pw = kh // 2, kw // 2
        th, tw = target_hw
        h, w = (geom_in.H, geom_in.W) if flat else (x.shape[1], x.shape[2])
        base_h = (h - 1) * s - 2 * ph + kh
        base_w = (w - 1) * s - 2 * pw + kw
        oph, opw = th - base_h, tw - base_w
        assert 0 <= oph < s and 0 <= opw < s, (
            f"target {target_hw} unreachable from {(h, w)} with stride {s}"
        )
        if flat:
            # body-flat path: zero-insert onto the target canvas, then a
            # plain SAME conv — for odd k and p=(k-1)/2 the trailing zero
            # rows/cols of the canvas reproduce exactly the output_padding
            # semantics of the torch ConvTranspose2d emulation below.
            from msau_tpu.ops.flatconv import (
                _upsample_tiles,
                body_upsample2,
                flat_conv2d,
                flat_deconv2,
                flat_upsample2,
            )

            assert kh % 2 == 1 and kw % 2 == 1 and s == 2
            assert (geom_out.H, geom_out.W) == (th, tw)
            dtype = self.dtype or x.dtype
            if (kh, kw) == (3, 3) and self.activation is None \
                    and not self.use_lrn:
                # fully fused transposed conv: the zero-inserted
                # intermediate never touches HBM (flat_deconv2)
                y = flat_deconv2(x.astype(dtype), kernel, bias,
                                 geom_in, geom_out)
                if y is not None:
                    return y
            if _upsample_tiles(geom_in, geom_out) is not None:
                # one Pallas kernel, no NCHW round trip (see flat_upsample2)
                up = flat_upsample2(x.astype(dtype), geom_in, geom_out)
            else:
                up = body_upsample2(x.astype(dtype), geom_in, geom_out)
            # act/LRN fuse into the conv epilogue (no-ops for the model's
            # activation=None deconvs)
            y = flat_conv2d(up, kernel, bias, geom_out,
                            mask_cotangent=False, act=self.activation,
                            lrn_size=self.features if self.use_lrn else None)
            return y
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(dtype)
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        if self.use_lrn:
            y = local_response_norm(y, size=self.features)
        return y


class _ConvParams(nn.Module):
    """Bare kernel/bias params with nn.Conv-compatible names."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", tf_conv_kernel_init(kh, kw, cin, self.features),
            (kh, kw, cin, self.features),
        )
        bias = self.param("bias", tf_bias_init(), (self.features,))
        return kernel, bias


class _ConvParamHolder(nn.Module):
    """Scope shim so fused kernels reuse the unfused param tree
    (ConvBnLrnDrop_i/Conv_0/{kernel,bias})."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        return _ConvParams(
            features=self.features, kernel_size=self.kernel_size,
            name="Conv_0",
        )(cin)


class MultiConvResidualBlock(nn.Module):
    """relu(x) -> res_depth convs (last without activation) -> +x -> act.

    Mirrors reference ``MultiConvResidualBlock`` (model/model.py:8-50).
    """

    res_depth: int
    filter_size: int
    channels: int
    activation: str = "relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 geom=None) -> jnp.ndarray:
        if geom is not None:
            from msau_tpu.ops.flatres import (
                flat_res_block,
                fused_res_supported,
            )

            c = x.shape[1]
            if (self.res_depth == 2 and self.filter_size == 3
                    and self.channels == c
                    and fused_res_supported(geom, c, 3, 2, self.activation,
                                            x.dtype.itemsize)):
                # single fused kernel for the flagship res-block shape;
                # params named to match the unfused ConvBnLrnDrop tree
                holders = [
                    _ConvParamHolder(
                        features=self.channels, kernel_size=(3, 3),
                        name=f"ConvBnLrnDrop_{i}",
                    )(c)
                    for i in range(2)
                ]
                (w1, b1), (w2, b2) = holders
                dtype = self.dtype or x.dtype
                return flat_res_block(
                    x.astype(dtype), w1, b1, w2, b2, geom, self.activation,
                    False,  # model pipeline preserves the body invariant
                )
        orig = x
        y = jax.nn.relu(x)
        k = (self.filter_size, self.filter_size)
        for i in range(self.res_depth):
            act = self.activation if i < self.res_depth - 1 else None
            y = ConvBnLrnDrop(
                features=self.channels,
                kernel_size=k,
                activation=act,
                dtype=self.dtype,
            )(y, train=train, geom=geom)
        y = y + orig
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        return y


class DownSampleResNet(nn.Module):
    """Residual conv stack + maxpool + 4x4 stride-2 class conv.

    Mirrors reference ``DownSampleResNet`` (model/layers/layers.py:176-204),
    used as the guidance network for the (optional) CSPN path.
    """

    channel_in: int
    channel_out: int
    filter_size: int = 3
    res_depth: int = 3
    pool_size: int = 2
    activation: str = "relu"
    aux_stride: int = 2     # reference uses stride 2 (layers.py:193-194)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        orig = x
        k = (self.filter_size, self.filter_size)
        for i in range(self.res_depth):
            act = self.activation if i < self.res_depth - 1 else None
            x = ConvBnLrnDrop(self.channel_in, k, activation=act, dtype=self.dtype)(
                x, train=train
            )
        x = x + orig
        act = get_activation(self.activation)
        x = act(x) if act is not None else x
        x = nn.max_pool(
            x,
            window_shape=(self.pool_size, self.pool_size),
            strides=(self.pool_size, self.pool_size),
            padding="SAME",
        )
        x = ConvBnLrnDrop(
            self.channel_out, (4, 4), strides=(self.aux_stride, self.aux_stride),
            activation="relu", dtype=self.dtype,
        )(x, train=train)
        return x
