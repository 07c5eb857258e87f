"""Fused Pallas attention for the MSAU deepest-scale block.

Reference semantics (model/layers/attention.py:152-162): with flattened
spatial tokens, A = softmax_rows(g @ f^T) and out = A^T @ h — softmax over
the *output* axis, accumulation over the *input* axis (note the transpose
versus standard attention).

Because the softmax normalizer of row i needs the whole row, the kernel
runs two passes, both blockwise in VMEM (the T x T score matrix never
touches HBM):

  1. ``_stats_kernel``   — per i-block, stream j-blocks of f computing the
     online (max, sum-exp) of s[i, :].
  2. ``_accum_kernel``   — per j-block, stream i-blocks accumulating
     exp(s_ij - m_i)/l_i * h_i into out[j].

All matmuls hit the MXU with f32 accumulation.  Block sizes default to
(256, 256) — T is a multiple of 256 for every power-of-two chargrid the
model produces at its deepest scale (512²/S=4 → 4096, 1024²/S=4 → 16384).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _stats_kernel(g_ref, f_ref, m_ref, l_ref):
    """Grid: (num_i_blocks,). g block [Bi, Cb]; f full [T, Cb] in VMEM."""
    bi, cb = g_ref.shape
    t = f_ref.shape[0]
    bj = bi  # use square blocks for the streamed axis
    g = g_ref[:]

    def body(j, carry):
        m, l = carry
        fj = f_ref[pl.ds(j * bj, bj), :]
        s = jax.lax.dot_general(
            g, fj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Bi, Bj]
        mj = jnp.max(s, axis=1)
        m_new = jnp.maximum(m, mj)
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new[:, None]), axis=1
        )
        return m_new, l

    m0 = jnp.full((bi,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bi,), jnp.float32)
    m, l = jax.lax.fori_loop(0, t // bj, body, (m0, l0))
    m_ref[:] = m[:, None]
    l_ref[:] = l[:, None]


def _accum_kernel(g_ref, f_ref, h_ref, m_ref, l_ref, o_ref):
    """Grid: (num_j_blocks,). f block [Bj, Cb]; g/h/m/l full in VMEM."""
    bj = f_ref.shape[0]
    t, c = h_ref.shape
    bi = bj
    fj = f_ref[:]

    def body(i, acc):
        gi = g_ref[pl.ds(i * bi, bi), :]
        hi = h_ref[pl.ds(i * bi, bi), :]
        mi = m_ref[pl.ds(i * bi, bi), :]          # [Bi, 1]
        li = l_ref[pl.ds(i * bi, bi), :]
        s = jax.lax.dot_general(
            gi, fj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Bi, Bj]
        p = jnp.exp(s - mi) / li
        return acc + jax.lax.dot_general(
            p, hi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Bj, C]

    acc0 = jnp.zeros((bj, c), jnp.float32)
    o_ref[:] = jax.lax.fori_loop(0, t // bi, body, acc0)


def _fused_forward(f, g, h, block, interpret):
    # kernels accumulate in f32; bf16 inputs are upcast at entry
    f = f.astype(jnp.float32)
    g = g.astype(jnp.float32)
    h = h.astype(jnp.float32)
    n, t, cb = f.shape
    c = h.shape[-1]
    assert t % block == 0, f"T={t} must be a multiple of block={block}"
    nb = t // block

    def single(fb, gb, hb):
        m, l = pl.pallas_call(
            _stats_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((block, cb), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
            ],
            interpret=interpret,
        )(gb, fb)
        out = pl.pallas_call(
            _accum_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # g full
                pl.BlockSpec((block, cb), lambda j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # h full
                pl.BlockSpec(memory_space=pltpu.VMEM),   # m full
                pl.BlockSpec(memory_space=pltpu.VMEM),   # l full
            ],
            out_specs=pl.BlockSpec(
                (block, c), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
            interpret=interpret,
        )(gb, fb, hb, m, l)
        return out, m, l

    return jax.vmap(single)(f, g, h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention_vjp(f, g, h, block, interpret):
    out, _, _ = _fused_forward(f, g, h, block, interpret)
    return out


def fused_attention(
    f: jnp.ndarray,  # [N, T, Cb]
    g: jnp.ndarray,  # [N, T, Cb]
    h: jnp.ndarray,  # [N, T, C]
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    return _fused_attention_vjp(f, g, h, block, interpret)


def _fused_fwd(f, g, h, block, interpret):
    out, m, l = _fused_forward(f, g, h, block, interpret)
    return out, (f, g, h, m[..., 0], l[..., 0])


def _fused_bwd(block, interpret, res, dout):
    """Memory-bounded backward using the saved softmax stats.

    With s = g f^T, A = softmax_rows(s), out = A^T h:
      dh_i = sum_j A_ij dout_j
      rho_i = h_i . dh_i
      ds_ij = A_ij (h_i . dout_j - rho_i)
      dg_i = sum_j ds_ij f_j ;  df_j = sum_i ds_ij g_i
    j-blocks are streamed with lax.map; the T x T matrix never materializes.
    """
    f, g, h, m, l = res
    in_dtypes = (f.dtype, g.dtype, h.dtype)
    # accumulate grads in f32 regardless of primal dtype
    f = f.astype(jnp.float32)
    g = g.astype(jnp.float32)
    h = h.astype(jnp.float32)
    dout = dout.astype(jnp.float32)
    n, t, cb = f.shape
    c = h.shape[-1]
    bj = block
    nb = t // bj
    j_starts = jnp.arange(nb) * bj
    inv_l = 1.0 / l

    def a_block(j0):
        fj = jax.lax.dynamic_slice_in_dim(f, j0, bj, axis=1)
        s = jnp.einsum("nic,njc->nij", g, fj)
        return jnp.exp(s - m[..., None]) * inv_l[..., None]  # [N, T, Bj]

    # pass 1: dh = A @ dout
    def dh_step(carry, j0):
        a = a_block(j0)
        doj = jax.lax.dynamic_slice_in_dim(dout, j0, bj, axis=1)
        return carry + jnp.einsum("nij,njc->nic", a, doj), None

    dh, _ = jax.lax.scan(dh_step, jnp.zeros_like(h), j_starts)
    rho = jnp.sum(h * dh, axis=-1)  # [N, T]

    # pass 2: dg accumulation + df blocks
    def dfdg_step(carry, j0):
        dg_acc = carry
        a = a_block(j0)
        doj = jax.lax.dynamic_slice_in_dim(dout, j0, bj, axis=1)
        u = jnp.einsum("nic,njc->nij", h, doj)
        ds = a * (u - rho[..., None])           # [N, T, Bj]
        fj = jax.lax.dynamic_slice_in_dim(f, j0, bj, axis=1)
        dg_acc = dg_acc + jnp.einsum("nij,njc->nic", ds, fj)
        df_j = jnp.einsum("nij,nic->njc", ds, g)
        return dg_acc, df_j

    dg, df_blocks = jax.lax.scan(dfdg_step, jnp.zeros_like(g), j_starts)
    df = jnp.moveaxis(df_blocks, 0, 1).reshape(n, t, cb)
    return (
        df.astype(in_dtypes[0]),
        dg.astype(in_dtypes[1]),
        dh.astype(in_dtypes[2]),
    )


_fused_attention_vjp.defvjp(_fused_fwd, _fused_bwd)
