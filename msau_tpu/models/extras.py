"""Optional model components: sparse (masked) conv, CSPN affinity
propagation, separable row/column LSTM.

These mirror reference modules that are present but dormant or bit-rotten
(SURVEY.md §2.12); implementations follow the *intended* semantics:

* ``SparseConv`` (model/layers/sparse_conv.py, force-disabled at
  model/model.py:76): convolution over masked inputs normalized by the
  per-window count of valid pixels, with the validity mask max-pooled
  forward (Uhrig et al., "Sparsity Invariant CNNs").  The committed
  reference discards the masked product and is unconstructable; here the
  masked product is actually convolved.
* ``affinity_propagate`` (model/layers/cspn.py, off by default at
  model/model.py:353): 8-gate guided propagation — per gate
  ``out = (g/Σg)·x + Σ_{3x3, center-0}(g·x)/Σg``, elementwise max over
  gates, optional sparse-anchor re-blending, iterated ``num_layers`` times.
  The reference constructs convs inside forward with .cuda() hard-codes
  and a NameError; here it is a pure function of its inputs.
* ``SeparableRNNBlock`` (model/layers/layers.py:167-173 is an identity
  stub): a real horizontal-then-vertical LSTM over the feature map,
  with ``identity=True`` reproducing the stub for checkpoint parity.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from msau_tpu.models.layers import tf_bias_init, tf_conv_kernel_init


class SparseConv(nn.Module):
    """Masked conv: out = conv(x*m) / count(m) + b; mask maxpooled forward."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        if mask is None:
            # all-channel-zero pixels are invalid (sparse_conv.py:52-57 intent)
            mask = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(x.dtype)
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        conv = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            kernel_init=tf_conv_kernel_init(kh, kw, cin, self.features),
            dtype=self.dtype,
        )
        feats = conv(x * mask)
        # per-window valid-pixel count (ones kernel over the 1-ch mask)
        count = lax.reduce_window(
            mask[..., 0],
            0.0,
            lax.add,
            (1, kh, kw),
            (1, *self.strides),
            padding="SAME",
        )[..., None]
        norm = jnp.where(count > 0, 1.0 / count, 0.0)
        bias = self.param("bias", tf_bias_init(0.0, 1e-5), (self.features,))
        out = feats * norm + bias
        new_mask = nn.max_pool(
            mask, window_shape=self.kernel_size, strides=self.strides, padding="SAME"
        )
        return out, new_mask


def _sum_conv(x: jnp.ndarray, ksize: int, center_zero: bool) -> jnp.ndarray:
    """3x3 ones (optionally center-0) conv on [N, H, W, 1]."""
    k = jnp.ones((ksize, ksize, 1, 1), x.dtype)
    if center_zero:
        k = k.at[(ksize - 1) // 2, (ksize - 1) // 2, 0, 0].set(0.0)
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.jit, static_argnames=("ksize", "num_layers"))
def affinity_propagate(
    guidance: jnp.ndarray,           # [N, H, W, 8] gate maps
    blur: jnp.ndarray,               # [N, H, W, 1] map to refine
    sparse: Optional[jnp.ndarray] = None,  # [N, H, W, 1] anchors or None
    ksize: int = 3,
    num_layers: int = 8,
) -> jnp.ndarray:
    gates = jnp.abs(guidance)
    if sparse is not None:
        smask = jnp.sign(jnp.abs(sparse))
        result = (1 - smask) * blur + smask * sparse
    else:
        smask = None
        result = blur

    def one_gate(g, x):
        g = g[..., None]
        wsum = _sum_conv(g, ksize, center_zero=False)
        wsum = jnp.where(wsum == 0, 1e-8, wsum)
        neigh = _sum_conv(g * x, ksize, center_zero=True)
        return (g / wsum) * x + neigh / wsum

    def step(result, _):
        outs = [one_gate(gates[..., i], result) for i in range(gates.shape[-1])]
        result = functools.reduce(jnp.maximum, outs)
        if smask is not None:
            result = (1 - smask) * result + smask * sparse
        return result, None

    result, _ = lax.scan(step, result, None, length=num_layers)
    return result


class SeparableRNNBlock(nn.Module):
    """Bidirectional row LSTM then column LSTM across the feature map.

    ``identity=True`` (default) reproduces the reference stub
    (model/layers/layers.py:167-173); set False for the functional RNN.
    """

    features: int
    identity: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.identity:
            return x
        n, h, w, c = x.shape

        def run_axis(inp, name):
            # inp: [B, T, C] — bidirectional LSTM, summed
            cell = nn.OptimizedLSTMCell(self.features, name=f"{name}_cell")
            rnn = nn.RNN(cell, name=f"{name}_rnn")
            fwd = rnn(inp)
            bwd = jnp.flip(rnn(jnp.flip(inp, 1)), 1)
            return fwd + bwd

        # horizontal: rows are sequences
        xh = x.reshape(n * h, w, c)
        xh = run_axis(xh, "row").reshape(n, h, w, self.features)
        # vertical: columns are sequences
        xv = jnp.transpose(xh, (0, 2, 1, 3)).reshape(n * w, h, self.features)
        xv = run_axis(xv, "col").reshape(n, w, h, self.features)
        return jnp.transpose(xv, (0, 2, 1, 3))
