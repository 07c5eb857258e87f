"""Fused masked cross-entropy over body-form logits.

The XLA loss boundary materializes an f32 log-softmax of each [N, C, L]
logits tensor (~400 MB at the flagship shape) and re-reads it for the
select, the metrics and the backward — ~6.5 ms/step across the two heads.
This kernel computes the masked CE sum and the non-background correct
count in ONE read of the logits, and its backward writes dlogits in one
read+write pass (softmax recomputed in VMEM, nothing saved).

Semantics (reference model/model.py:446-459 masked CE + cost.py:43-51
accuracy): ce_sum = sum_over_pixels mask * (logsumexp(l) - l[label]);
correct = sum mask * (l[label] == max(l)) (argmax ties count as correct —
measure-zero in float).  Scalar reductions accumulate across the
sequential grid; the division by the mask count happens outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from msau_tpu.ops.flatconv import _use_interpret


def _pick_stride(length: int, cap: int = 8192) -> int:
    best = None
    nblk = max(1, -(-length // cap))
    for k in range(nblk, length + 1):
        if length % k == 0 and (length // k) % 128 == 0:
            best = length // k
            break
    return best or length


def _ce_fwd_kernel(l_ref, lab_ref, m_ref, s_ref, c_ref, *, nb, nclass):
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    classes = jax.lax.broadcasted_iota(jnp.int32, (nclass, 1), 0)
    for i in range(nb):
        l = l_ref[i].astype(jnp.float32)          # [C, stride]
        lab = lab_ref[i]                          # [1, stride] int32
        mask = m_ref[i]                           # [1, stride] f32
        m = jnp.max(l, axis=0, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(l - m), axis=0, keepdims=True))
        onehot = classes == lab                   # [C, stride]
        lsel = jnp.sum(jnp.where(onehot, l, 0.0), axis=0, keepdims=True)
        s_ref[:] += jnp.sum((lse - lsel) * mask, keepdims=True)
        c_ref[:] += jnp.sum(jnp.where(lsel >= m, mask, 0.0), keepdims=True)


def _ce_bwd_kernel(l_ref, lab_ref, m_ref, g_ref, dl_ref, *, nb, nclass):
    classes = jax.lax.broadcasted_iota(jnp.int32, (nclass, 1), 0)
    g = g_ref[0, 0]
    for i in range(nb):
        l = l_ref[i].astype(jnp.float32)
        lab = lab_ref[i]
        mask = m_ref[i]
        m = jnp.max(l, axis=0, keepdims=True)
        e = jnp.exp(l - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        onehot = (classes == lab).astype(jnp.float32)
        dl_ref[i] = ((p - onehot) * (mask * g)).astype(dl_ref.dtype)


@jax.custom_vjp
def fused_masked_ce_sum(logits, labels, maskf):
    """(ce_sum, correct) over body logits [N, C, L], labels/mask [N, L].

    maskf: f32 0/1 — the (label != 0) & valid mask, zero on guards/pads.
    Gradients flow to logits only.
    """
    return _ce_call(logits, labels, maskf)


def _ce_call(logits, labels, maskf):
    n, nclass, length = logits.shape
    stride = _pick_stride(length)
    # Mosaic materializes ~8 f32 [C, stride] temporaries per unrolled
    # image (l/exp/softmax/onehot/products — measured 18.7M scoped at
    # stride 20480 nb=2); budget accordingly
    per_img = 8 * nclass * stride * 4
    nb = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * per_img <= 12 * 2**20:
            nb = cand
            break
    kernel = functools.partial(_ce_fwd_kernel, nb=nb, nclass=nclass)
    s, c = pl.pallas_call(
        kernel,
        grid=(n // nb, length // stride),
        in_specs=[
            pl.BlockSpec((nb, nclass, stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((nb, 1, stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((nb, 1, stride), lambda ni, bi: (ni, 0, bi)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, 1), lambda ni, bi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(logits, labels[:, None, :], maskf[:, None, :])
    return s[0, 0], c[0, 0]


def _ce_vjp_fwd(logits, labels, maskf):
    return _ce_call(logits, labels, maskf), (logits, labels, maskf)


def _ce_vjp_bwd(res, g):
    logits, labels, maskf = res
    gs, _gc = g  # correct-count is a metric; no gradient path
    n, nclass, length = logits.shape
    stride = _pick_stride(length)
    per_img = 8 * nclass * stride * 4
    nb = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * per_img <= 12 * 2**20:
            nb = cand
            break
    kernel = functools.partial(_ce_bwd_kernel, nb=nb, nclass=nclass)
    dlogits = pl.pallas_call(
        kernel,
        grid=(n // nb, length // stride),
        in_specs=[
            pl.BlockSpec((nb, nclass, stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((nb, 1, stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((nb, 1, stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((1, 1), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, nclass, stride),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        interpret=_use_interpret(),
    )(logits, labels[:, None, :], maskf[:, None, :],
      jnp.asarray(gs, jnp.float32).reshape(1, 1))
    zero_lab = np.zeros(labels.shape, jax.dtypes.float0)
    return dlogits, zero_lab, jnp.zeros_like(maskf)


fused_masked_ce_sum.defvjp(_ce_vjp_fwd, _ce_vjp_bwd)
