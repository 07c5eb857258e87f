"""Self-attention applied at the deepest U-Net scale.

Semantics mirror the reference SAGAN-style block
(model/layers/attention.py:138-162, wrapped at :236-243):

    f = Conv1x1(x) -> C/8 channels          (bottleneck)
    g = Conv1x1(x) -> C/8 channels
    h = Conv1x1(x) -> C  channels
    s[i, j]  = <g_i, f_j>      over flattened spatial positions
    beta     = softmax(s, axis=-1)           # normalized over j (f positions)
    out_j    = sum_i h_i * beta[i, j]        # note: transposed accumulation
    y        = out + x                        (residual)

There is deliberately no 1/sqrt(d) scaling and no output projection — the
reference has none.  The "transposed" softmax/accumulation (weights
normalized over the *output* axis) is reproduced exactly.

Two implementations:
  * ``self_attention_xla``   — einsum; XLA fuses it fine for small grids
    (the deepest scale of a 256²/S=4 model is 32x32 = 1024 tokens).
  * ``self_attention_pallas``— blockwise fused kernel with online softmax
    over the contraction axis, for 1024²-scale grids where the (HW)x(HW)
    score matrix would not fit in VMEM/HBM comfortably.

``SelfAttentionBlock`` picks one based on token count / config.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from msau_tpu.models.layers import tf_bias_init

Dtype = Any

# Token-count threshold above which the Pallas blockwise kernel is used.
# Measured on-chip (v5e, bs=16 flagship): at T=4096 the plain einsum beats
# the reduction-grid kernel in-step (254.5 vs 276.4 ms full train step) and
# its T x T buffers still fit; the blockwise kernel is for the T >= 16k
# grids (1024^2 configs) where einsum's T^2 buffers OOM.
_PALLAS_MIN_TOKENS = 8192


def add_timing_signal_2d(
    x: jnp.ndarray, min_timescale: float = 1.0, max_timescale: float = 1.0e3
) -> jnp.ndarray:
    """2-D sinusoidal positional encoding added channel-wise.

    The reference ships a broken version (attention.py:32-103: operator-
    precedence bug in the timescale exponent, commented out at :242); this
    is the intended Tensor2Tensor formulation: channels are split between
    the H and W dimensions, each getting sin/cos pairs over a geometric
    timescale ladder.  x: [N, H, W, C].
    """
    import math

    n, h, w, c = x.shape
    num_dims = 2
    num_ts = c // (num_dims * 2)
    if num_ts == 0:
        return x
    log_inc = math.log(max_timescale / min_timescale) / max(num_ts - 1, 1)
    inv_ts = min_timescale * jnp.exp(-log_inc * jnp.arange(num_ts, dtype=jnp.float32))
    out = x
    for dim, length in ((0, h), (1, w)):
        pos = jnp.arange(length, dtype=jnp.float32)
        scaled = pos[:, None] * inv_ts[None, :]            # [L, num_ts]
        signal = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
        prepad = dim * 2 * num_ts
        postpad = c - (dim + 1) * 2 * num_ts
        signal = jnp.pad(signal, ((0, 0), (prepad, postpad)))  # [L, C]
        shape = [1, 1, 1, c]
        shape[dim + 1] = length
        out = out + signal.reshape(shape)
    return out


def self_attention_xla(f: jnp.ndarray, g: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Reference-semantics attention via einsum.

    Args:
      f, g: [N, T, Cb] bottleneck projections, h: [N, T, C].
    Returns:
      [N, T, C] — out_j = sum_i h_i * softmax_j(<g_i, f_j>).
    """
    s = jnp.einsum("nic,njc->nij", g, f)         # [N, T_i, T_j]
    beta = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("nij,nic->njc", beta, h)    # accumulate over i
    return out


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def self_attention_pallas(
    f: jnp.ndarray, g: jnp.ndarray, h: jnp.ndarray, block_q: int = 512, block_k: int = 512
) -> jnp.ndarray:
    """Memory-bounded two-pass attention with reference semantics.

    softmax is over axis j of s[i, j] = <g_i, f_j>; output is
    out[j] = sum_i beta[i, j] * h[i].  Equivalently with A = softmax_rows(G F^T):
    out = A^T @ H.  We compute row statistics (max, sumexp) blockwise, then
    accumulate A^T H blockwise — never materializing the T x T matrix.

    Implemented with lax.map over j-blocks (XLA pipelines these); each step
    is MXU-bound matmuls.  A fully fused Pallas flash kernel is provided in
    msau_tpu/ops/pallas_attn.py and used when shapes are aligned.
    """
    n, t, cb = g.shape
    c = h.shape[-1]

    # Pass 1: row-wise (over i) max and sum-exp of s[i, :] in j-blocks.
    def stats_step(carry, j0):
        m, l = carry
        fj = jax.lax.dynamic_slice_in_dim(f, j0, block_q, axis=1)      # [N,Bq,Cb]
        s = jnp.einsum("nic,njc->nij", g, fj)                           # [N,T,Bq]
        mj = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, mj)
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new[..., None]), axis=-1)
        return (m_new, l), None

    nb = t // block_q if t % block_q == 0 else -1
    if nb <= 0:
        # unaligned fallback
        return self_attention_xla(f, g, h)

    j_starts = jnp.arange(nb) * block_q
    (m, l), _ = jax.lax.scan(
        stats_step,
        (jnp.full((n, t), -jnp.inf, f.dtype), jnp.zeros((n, t), f.dtype)),
        j_starts,
    )

    # Pass 2: out[:, j-block] = sum_i exp(s[i,j] - m_i)/l_i * h[i]
    w = (1.0 / l)[..., None] * h  # fold normalizer into h: [N, T, C]

    def out_step(j0):
        fj = jax.lax.dynamic_slice_in_dim(f, j0, block_q, axis=1)
        s = jnp.einsum("nic,njc->nij", g, fj)
        p = jnp.exp(s - m[..., None])
        return jnp.einsum("nij,nic->njc", p, w)

    out_blocks = jax.lax.map(out_step, j_starts)                        # [nb,N,Bq,C]
    out = jnp.moveaxis(out_blocks, 0, 1).reshape(n, t, c)
    return out


class SelfAttentionBlock(nn.Module):
    """SAGAN-style residual self-attention over the flattened 2-D grid."""

    input_channels: int
    num_heads: int = 8        # bottleneck divisor (reference num_heads=8)
    impl: str = "auto"        # "auto" | "xla" | "pallas"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, hh, ww, c = x.shape
        cb = max(c // self.num_heads, 1)
        proj = functools.partial(
            nn.Conv,
            kernel_size=(1, 1),
            strides=(1, 1),
            padding="VALID",
            bias_init=tf_bias_init(0.0, 0.0),
            dtype=self.dtype,
        )
        out_f = proj(features=cb, name="f")(x).reshape(n, hh * ww, cb)
        out_g = proj(features=cb, name="g")(x).reshape(n, hh * ww, cb)
        out_h = proj(features=c, name="h")(x).reshape(n, hh * ww, c)

        t = hh * ww
        on_tpu = jax.default_backend() not in ("cpu",)
        if self.impl in ("auto", "resident") and on_tpu:
            # whole-operand VMEM residency + exact one-pass softmax: beats
            # einsum at T=4096 (no [T, T] HBM materialization) AND the
            # online-softmax kernel at T>=16k (no rescaling overhead)
            from msau_tpu.ops.pallas_attn import (
                resident_attention,
                resident_attn_supported,
            )

            if resident_attn_supported(t, cb, c):
                o = resident_attention(out_f, out_g, out_h)
                return o.reshape(n, hh, ww, c) + x
        use_blockwise = self.impl == "pallas" or (
            self.impl in ("auto", "resident") and t >= _PALLAS_MIN_TOKENS
        )
        if use_blockwise:
            if on_tpu and t % 256 == 0:
                from msau_tpu.ops.pallas_attn import fused_attention

                o = fused_attention(out_f, out_g, out_h)
            else:
                o = self_attention_pallas(out_f, out_g, out_h)
        else:
            o = self_attention_xla(out_f, out_g, out_h)
        return o.reshape(n, hh, ww, c) + x
