"""Fused Pallas attention for the MSAU deepest-scale block.

Reference semantics (model/layers/attention.py:152-162): with flattened
spatial tokens, A = softmax_rows(g @ f^T) and out = A^T @ h — softmax over
the *output* axis, accumulation over the *input* axis (note the transpose
versus standard attention).

Because the softmax normalizer of row i needs the whole row, the kernel
runs two passes, both blockwise (the T x T score matrix never touches HBM):

  1. ``_stats_kernel``   — 2-D reduction grid (i, j): stream j-blocks of f
     per i-block of g, maintaining the online (max, sum-exp) of s[i, :] in
     the revisited (m, l) output block.
  2. ``_accum_kernel``   — 2-D reduction grid (j, i): stream i-blocks of
     g/h/m/l per j-block of f, accumulating exp(s_ij - m_i)/l_i * h_i into
     the revisited out[j] block.

Every operand streams through VMEM in blocks (nothing is held whole), so
the kernels scale to arbitrary T — 1024² chargrids put T = 16384 at the
deepest scale, which would not fit full-array VMEM residency after lane
padding.  All matmuls hit the MXU with f32 accumulation.

The backward pass is a custom VJP computed blockwise in XLA from the saved
(m, l) stats — no T x T buffers, which is what lets the full 512² 3-stage
model train un-remat'd in 16 GB.
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
    """Grid (nb_i, nb_j): g block [Bi, Cb] by i; f block [Bj, Cb] by j;
    m/l out blocks [Bi, 1] revisited across j."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    s = jax.lax.dot_general(
        g_ref[:], f_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Bi, Bj]
    m_old = m_ref[:, 0]
    l_old = l_ref[:, 0]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1))
    l_new = l_old * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(s - m_new[:, None]), axis=1
    )
    m_ref[:] = m_new[:, None]
    l_ref[:] = l_new[:, None]


def _accum_kernel(f_ref, g_ref, h_ref, m_ref, l_ref, o_ref):
    """Grid (nb_j, nb_i): f block [Bj, Cb] by j (resident across i);
    g/h/m/l blocks by i; out block [Bj, C] revisited across i."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    s = jax.lax.dot_general(
        g_ref[:], f_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Bi, Bj]
    p = jnp.exp(s - m_ref[:]) / l_ref[:]
    o_ref[:] += jax.lax.dot_general(
        p, h_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Bj, C]


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
            grid=(nb, nb),
            in_specs=[
                pl.BlockSpec((block, cb), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, cb), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
            ],
            interpret=interpret,
        )(gb, fb)
        out = pl.pallas_call(
            _accum_kernel,
            grid=(nb, nb),
            in_specs=[
                pl.BlockSpec((block, cb), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, cb), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
            interpret=interpret,
        )(fb, gb, hb, m, l)
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
    j-blocks are streamed with lax.scan; the T x T matrix never materializes.
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


# ---------------------------------------------------------------------------
# Resident-operand exact-softmax attention (v2)
# ---------------------------------------------------------------------------
#
# At the MSAU deepest scales the projections are tiny on the channel axis
# (Cb = C/8 = 8, C = 64 at the flagship; T = 4096..16384), so f [T, Cb],
# h/dout [T, C] and the output all fit WHOLE in VMEM.  That admits a much
# simpler kernel than the online-softmax pair above: grid over i-blocks
# only, each step computes the full score rows s[i_blk, :] and their EXACT
# softmax in one pass (no running max/sum rescaling — the overhead that
# made the flash-style kernel lose to einsum at T=4096, PERF.md r4), and
# accumulates A^T h into the resident output.  HBM traffic is just the
# [T, C]-sized operands once — einsum materializes the [T, T] scores and
# probabilities (0.5 GB/step at T=4096 bs=16) and its backward re-reads
# them repeatedly.  The backward is ONE kernel of the same shape emitting
# dg/dh blocks and the df accumulator.


def _res_fwd_kernel(g_ref, f_ref, h_ref, o_ref, m_ref, l_ref, *,
                    precision, acc_dtype):
    i = pl.program_id(0)
    s = jax.lax.dot_general(
        g_ref[:], f_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [Bi, T]
    mrow = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - mrow)
    lrow = jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = mrow
    l_ref[:] = lrow
    a = (p * (1.0 / lrow)).astype(acc_dtype)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        a, h_ref[:].astype(acc_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [T, C] += A^T @ h_blk


def _res_bwd_kernel(g_ref, h_ref, do_ref, f_ref, m_ref, l_ref,
                    dg_ref, dh_ref, df_ref, *, precision, acc_dtype):
    i = pl.program_id(0)
    s = jax.lax.dot_general(
        g_ref[:], f_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    a = jnp.exp(s - m_ref[:]) / l_ref[:]              # [Bi, T] f32
    ab = a.astype(acc_dtype)
    dh_b = jax.lax.dot_general(
        ab, do_ref[:].astype(acc_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [Bi, C]
    h_b = h_ref[:].astype(jnp.float32)
    rho = jnp.sum(h_b * dh_b, axis=1, keepdims=True)  # [Bi, 1]
    u = jax.lax.dot_general(
        h_ref[:].astype(acc_dtype), do_ref[:].astype(acc_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [Bi, T] = h_i . dout_j
    ds = (a * (u - rho)).astype(acc_dtype)
    dg_ref[:] = jax.lax.dot_general(
        ds, f_ref[:].astype(acc_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(dg_ref.dtype)  # [Bi, Cb]
    dh_ref[:] = dh_b.astype(dh_ref.dtype)

    @pl.when(i == 0)
    def _():
        df_ref[:] = jnp.zeros_like(df_ref)

    df_ref[:] += jax.lax.dot_general(
        ds, g_ref[:].astype(acc_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [T, Cb] += ds^T @ g_blk


def _res_precision(dtype):
    return (jax.lax.Precision.DEFAULT
            if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _res_block_i(t: int, c: int, cap: int = 256, live: int = 3) -> int:
    """Largest divisor of T <= cap whose [Bi, T] f32 temporaries fit.

    Mosaic reuses the softmax temporaries' buffers, so the effective live
    count is ~1.5 despite 3-4 being written (calibrated on-chip: the bwd
    kernel at T=4096, Bi=256 compiles and is the measured optimum —
    3.17 ms fwd+bwd vs einsum's 7.78; scripts/exp_attn_resident.py).
    ``cap`` 512 fwd / 256 bwd from the same sweep."""
    budget = 14 * 2**20 - (2 * t * c + t * 8) * 4
    bi = 1
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if cand <= cap and t % cand == 0 and 1.5 * cand * t * 4 <= budget:
            bi = cand
            break
    return bi


def resident_attn_supported(t: int, cb: int, c: int) -> bool:
    """Whole-operand VMEM residency + temp budget feasible?

    Calibrated on-chip: T=4096/C=64 compiles and wins at every block
    size; T=16384 measured 24.0M scoped even at Bi=32 (the revisited
    [T, C] f32 output block is 4.2M double-buffered before any softmax
    temporaries) — those shapes keep the streaming online-softmax kernel
    (fused_attention), whose whole point is unbounded T.
    """
    if t % 8:
        return False
    if t * c * 4 > 2 * 2**20:   # resident accumulator cap (see above)
        return False
    return _res_block_i(t, c) >= 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _resident_attention_vjp(f, g, h, interpret):
    out, _, _ = _resident_forward(f, g, h, interpret)
    return out


def _resident_forward(f, g, h, interpret):
    n, t, cb = f.shape
    c = h.shape[-1]
    bi = _res_block_i(t, c, cap=512)  # measured fwd optimum (sweep)
    acc_dtype = (jnp.bfloat16 if jnp.dtype(f.dtype) == jnp.bfloat16
                 else jnp.float32)
    kernel = functools.partial(
        _res_fwd_kernel, precision=_res_precision(f.dtype),
        acc_dtype=acc_dtype)

    def single(fb, gb, hb):
        o, m, l = pl.pallas_call(
            kernel,
            grid=(t // bi,),
            in_specs=[
                pl.BlockSpec((bi, cb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, cb), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
            ],
            interpret=interpret,
        )(gb, fb, hb)
        return o.astype(h.dtype), m, l

    return jax.vmap(single)(f, g, h)


def _resident_fwd(f, g, h, interpret):
    out, m, l = _resident_forward(f, g, h, interpret)
    return out, (f, g, h, m, l)


def _resident_bwd(interpret, res, dout):
    f, g, h, m, l = res
    n, t, cb = f.shape
    c = h.shape[-1]
    bi = _res_block_i(t, c, cap=256)  # measured bwd optimum (sweep)
    acc_dtype = (jnp.bfloat16 if jnp.dtype(f.dtype) == jnp.bfloat16
                 else jnp.float32)
    dout = dout.astype(h.dtype)
    kernel = functools.partial(
        _res_bwd_kernel, precision=_res_precision(f.dtype),
        acc_dtype=acc_dtype)

    def single(fb, gb, hb, dob, mb, lb):
        dg, dh, df = pl.pallas_call(
            kernel,
            grid=(t // bi,),
            in_specs=[
                pl.BlockSpec((bi, cb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, cb), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bi, cb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, cb), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, cb), jnp.float32),
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((t, cb), jnp.float32),
            ],
            interpret=interpret,
        )(gb, hb, dob, fb, mb, lb)
        return dg, dh, df

    dg, dh, df = jax.vmap(single)(f, g, h, dout, m, l)
    return df.astype(f.dtype), dg.astype(g.dtype), dh.astype(h.dtype)


_resident_attention_vjp.defvjp(_resident_fwd, _resident_bwd)


def resident_attention(f: jnp.ndarray, g: jnp.ndarray, h: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Reference-semantics attention (A = softmax_rows(g f^T), out = A^T h)
    with whole-operand VMEM residency and exact one-pass softmax.

    Callers must check ``resident_attn_supported(t, cb, c)`` first.
    """
    return _resident_attention_vjp(f, g, h, interpret)
