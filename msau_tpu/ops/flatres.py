"""Fused residual conv block on the body-flat layout.

Computes the reference ``MultiConvResidualBlock`` with ``res_depth=2``
(model/model.py:8-50):

    y = act( conv2( act( conv1( relu(x) ) + b1 ) ) + b2 + x )

as ONE Pallas kernel per (batch, row-block) — both 3x3 convs, the
activations and the residual stay in VMEM; only x is read and y written.
The backward is likewise ONE kernel that recomputes the forward
intermediates in VMEM and emits dx plus the revisited-accumulated
dw1/dw2/db1/db2 — replacing four separate conv-grad kernels and their HBM
intermediates.

Same body-flat conventions as ops/flatconv.py (guard blocks, zero pad
columns, 128-aligned Element windows).  Only the flagship res-block shape
is fused (3x3, dilation 1, Cin == Cout); other shapes fall back to two
``flat_conv2d`` calls in the caller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msau_tpu.ops.flatconv import (
    FlatGeom,
    _ConvDims,
    _dot_precision,
    _plan,
    _sub_tile,
    _use_interpret,
    _w_group,
    body_mask,
)


def _act_fns(name: str):
    if name == "relu":
        return jax.nn.relu, lambda pre: (pre > 0).astype(jnp.float32)
    if name == "elu":
        return (
            jax.nn.elu,
            lambda pre: jnp.where(pre > 0, 1.0, jnp.exp(jnp.minimum(pre, 0.0))),
        )
    raise ValueError(f"unsupported fused activation: {name}")


def _mask_row(wp: int, w: int, n_rows: int, stride_len: int) -> jnp.ndarray:
    col = jnp.arange(n_rows * wp, dtype=jnp.int32) % wp
    return (col < w).astype(jnp.float32).reshape(1, n_rows * wp)


def _row_idx(wp: int, n_rows: int) -> jnp.ndarray:
    return (jnp.arange(n_rows * wp, dtype=jnp.int32) // wp).reshape(
        1, n_rows * wp
    )


# Live f32 rows (per channel) of kernel-internal temporaries: the z
# accumulator pairs of _conv_into plus the act/where/cast intermediates
# are f32 at EVERY input dtype, so the tile choice cannot scale with
# itemsize alone.  Calibrated against measured Mosaic scoped-vmem
# outcomes: bf16@512^2 fits at tile 32 (the flagship path — must not
# flip), while f32@512^2 and bf16@1024^2 at tile 32 exceed the 16 MiB
# scoped limit (21.4 MiB measured for the former) and must drop to 16.
_F32_TEMP_ROWS = 6


def _fused_tile(geom: FlatGeom, c: int, itemsize: int) -> int:
    """Row block shared by the fwd and bwd fused kernels.

    Cost per candidate tile = the bwd 9-row tap stack (9*C rows at the
    input itemsize) + the dtype-independent f32 temporaries
    (_F32_TEMP_ROWS*C rows at 4 bytes); largest aligned divisor of
    tile_h whose cost fits VMEM_XS_BUDGET.  Using the bwd stack for both
    plans keeps their block partitions identical by construction.
    """
    from msau_tpu.ops.flatconv import VMEM_XS_BUDGET

    wp = geom.Wp
    valid = [t for t in range(1, geom.tile_h + 1)
             if geom.tile_h % t == 0 and (t * wp) % 128 == 0]
    cost = lambda t: (9 * c * t * wp * itemsize
                      + _F32_TEMP_ROWS * c * t * wp * 4)
    fitting = [t for t in valid if cost(t) <= VMEM_XS_BUDGET]
    return max(fitting) if fitting else min(valid)


class _FusedPlan:
    """Static geometry for the fused kernels (3x3, d=1, halo 2 per conv)."""

    def __init__(self, geom: FlatGeom, cin: int, itemsize: int, halo: int):
        # reuse _plan with the effective chained kernel to get the window
        eff = 2 * halo + 1
        dims = _ConvDims(eff, eff, 1, halo, halo)
        p = _plan(geom, dims, cin, itemsize,
                  tile=_fused_tile(geom, cin, itemsize))
        self.geom = geom
        self.c = cin
        self.tile = p.tile
        self.stride = p.stride
        self.g_blk = p.g_blk
        self.n_blk = p.n_blk
        self.len_in = p.len_in
        self.start0 = p.start0
        # origin O: window element of (row h0-halo, col -halo)
        self.origin = -halo * geom.Wp - halo - p.start0
        assert self.origin >= 0
        self.halo = halo
        # lane-aligned geometry (Wp % 128 == 0): _plan's aligned branch
        # pins start0 = -(halo*Wp + 128), so window element 0 is
        # (row h0-halo, col -128) and every whole-row slice is aligned
        self.aligned = p.z0 > 0
        if self.aligned:
            assert -p.start0 == halo * geom.Wp + 128, (p, halo)


def _win(plan: _FusedPlan, rows: int) -> int:
    """VMEM buffer length for `rows` rows (+128 slack for shifted taps)."""
    return rows * plan.geom.Wp + 128


def _x_spec(plan: _FusedPlan, cin: int, nb: int):
    hi_clamp = plan.geom.LB - plan.len_in

    def x_index(ni, bi):
        s = bi * plan.stride + plan.start0
        s = jnp.clip(s, 0, hi_clamp)
        # all-Element dims (Mosaic disallows mixing): batch offset in images
        return (ni * nb, 0, pl.multiple_of(s, 128))

    return pl.BlockSpec(
        (pl.Element(nb), pl.Element(cin), pl.Element(plan.len_in)), x_index
    )


def _fused_batch_block(n: int, plan: _FusedPlan, itemsize: int,
                       n_windows: int, scratch_bytes: int) -> int:
    """Images per grid step (same rationale as flatconv._batch_block: the
    per-grid-step fixed cost dominates at feat_root channel counts).
    n_windows: streamed Element windows + output blocks per image."""
    budget = 12 * 2**20
    per_img = n_windows * plan.c * plan.len_in * itemsize
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * per_img * 2 + scratch_bytes <= budget:
            return cand
    return 1


def _conv_into(src_ref, xs_ref, w_ref, *, c, wp, row0, col0,
               n_rows, precision):
    """3x3 conv via the 3-row-tap scheme: src rows [row0-1, row0-1+n_rows+2)
    -> n_rows rows.

    src_ref: VMEM buffer whose element (r_rel, col) sits at flat index
    r_rel*wp + col + col0 (col0 absorbs the window's column origin).
    w_ref: [3*C, 3*C_out] regrouped weights (flatconv._w_group order).
    Returns the f32 accumulator [c_out, n_rows*wp].

    3 lane-rotated row copies + one dot + 2 shifted adds replace the 9
    rotated tap copies (the VPU-bound part; see flatconv._row_offsets).
    """
    L = n_rows * wp
    cw = L + 3
    cout = w_ref.shape[1] // 3
    for ky in range(3):
        # column j of xs3 row-group ky = src position (p = j - 1) under
        # row tap ky: flat src index (row0 - 1 + ky)*wp + col0 - 1 + j
        q = (row0 - 1 + ky) * wp + col0 - 1
        xs_ref[ky * c:(ky + 1) * c, :cw] = src_ref[:, q:q + cw]
    z = jax.lax.dot_general(
        w_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [3*C_out, cw]; z_kx = rows [kx*cout, (kx+1)*cout)
    return (z[0:cout, 0:L] + z[cout:2 * cout, 1:L + 1]
            + z[2 * cout:3 * cout, 2:L + 2])


def _conv_into_al(src_ref, xs_ref, w_ref, *, c, wp, q0, n_rows, precision):
    """Aligned 3x3 conv: src buffer with column origin -128 (element p of
    a row holds col p-128), taps are pure row shifts from q0 (all copies
    lane-ALIGNED); the +-1 column shifts live in the z-slice combination
    at bases {127, 128, 129}, accumulated from the aligned center slice.
    Output is origin-0 ([c, n_rows*wp], col j at index j).
    """
    L = n_rows * wp
    cw = L + 130
    cout = w_ref.shape[1] // 3
    for ky in range(3):
        q = q0 + ky * wp
        xs_ref[ky * c:(ky + 1) * c, :cw] = src_ref[:, q:q + cw]
    z = jax.lax.dot_general(
        w_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    acc = z[cout:2 * cout, 128:128 + L]          # center tap, aligned base
    acc = acc + z[0:cout, 127:127 + L]
    return acc + z[2 * cout:3 * cout, 129:129 + L]


def _store_origin128(buf_ref, val, wp, n_guard_head_rows=1):
    """Write an origin-0 value into an origin(-128) buffer: zero head
    (guard rows + 128 borrowed pad columns), ONE shifted write, zero tail.
    The single misaligned write replaces the per-tap misaligned copies of
    the classic scheme.
    """
    head = n_guard_head_rows * wp + 128
    n = val.shape[1]
    buf_ref[:, :head] = jnp.zeros_like(buf_ref[:, :head])
    buf_ref[:, head:head + n] = val.astype(buf_ref.dtype)
    buf_ref[:, head + n:] = jnp.zeros_like(buf_ref[:, head + n:])


def _fwd_kernel_al(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, m_ref, rid_ref,
                   o_ref, xs_ref, h0_ref, h1_ref, *, plan: _FusedPlan,
                   act_name: str, nb: int, precision):
    """Aligned-geometry fused forward (see _conv_into_al).  Window element
    0 is (row h0-2, col -128); all window reads and tap copies are
    lane-aligned; the only misaligned ops are the two z-slice adds per
    conv and the single h1 buffer store.
    """
    c, wp, t = plan.c, plan.geom.Wp, plan.tile
    act, _ = _act_fns(act_name)
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < plan.g_blk, bi >= plan.n_blk - plan.g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
      for i in range(nb):
        # h0 = relu(x) rows [h0-2, h0+t+2), origin -128: aligned copy.
        # +128: the borrowed-column origin shifts the whole stream, so
        # covering through row t+1's last real column needs n0*wp + 128
        # content elements (the last block-row read exactly touches it).
        n0 = t + 4
        h0_ref[:, : n0 * wp + 128] = jnp.maximum(
            x_ref[i, :, : n0 * wp + 128], 0.0
        ).astype(h0_ref.dtype)
        h0_ref[:, n0 * wp + 128:] = jnp.zeros_like(
            h0_ref[:, n0 * wp + 128:])
        # conv1 -> u rows [h0-1, h0+t+1), origin 0; q0 = 0
        n1 = t + 2
        u = _conv_into_al(h0_ref, xs_ref, w1_ref, c=c, wp=wp,
                          q0=0, n_rows=n1, precision=precision)
        u_pre = u + b1_ref[:]
        h0g = (bi - plan.g_blk) * plan.tile
        grow = h0g - 1 + rid_ref[:, : n1 * wp]
        rvalid = jnp.logical_and(grow >= 0, grow < plan.geom.H)
        keep = jnp.logical_and(m_ref[:, : n1 * wp] > 0, rvalid)
        h1c = jnp.where(keep, act(u_pre), 0.0)
        # h1 rows [h0-2, h0+t+2) origin -128: one shifted store
        _store_origin128(h1_ref, h1c, wp)
        # conv2 -> y rows [h0, h0+t): q0 = wp
        y = _conv_into_al(h1_ref, xs_ref, w2_ref, c=c, wp=wp,
                          q0=wp, n_rows=t, precision=precision)
        # residual: x rows [h0, h0+t) at window element 2*wp+128, aligned
        xcen = x_ref[i, :, 2 * wp + 128: 2 * wp + 128 + t * wp]
        y_pre = y + b2_ref[:] + xcen.astype(jnp.float32)
        o_ref[i, :, :] = jnp.where(m_ref[:, : t * wp] > 0, act(y_pre),
                                   0.0).astype(o_ref.dtype)


def _bwd_kernel_al(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref,
                   w2t_ref, m_ref, rid_ref, dx_ref, dw1_ref, dw2_ref,
                   db1_ref, db2_ref, xs_ref, h0_ref, h1_ref, gu_ref, gv_ref,
                   gs_ref, *, plan: _FusedPlan, act_name: str, nb: int,
                   precision):
    """Aligned-geometry fused backward.  Window element 0 is
    (row h0-4, col -128).  Misaligned ops: 2 z-adds per conv (x4 convs),
    3 buffer stores (h1/gu/gv), and 2 of the 3 dw g-bands."""
    c, wp, t = plan.c, plan.geom.Wp, plan.tile
    act, dact = _act_fns(act_name)
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    # sequential-grid accumulation (see _bwd_kernel note)
    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    is_guard = jnp.logical_or(bi < plan.g_blk, bi >= plan.n_blk - plan.g_blk)

    @pl.when(is_guard)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
      for i in range(nb):
        # recompute h0 = relu(x) rows [h0-4, h0+t+4), origin -128
        # (+128 content: see _fwd_kernel_al)
        n0 = t + 8
        h0_ref[:, : n0 * wp + 128] = jnp.maximum(
            x_ref[i, :, : n0 * wp + 128], 0.0
        ).astype(h0_ref.dtype)
        h0_ref[:, n0 * wp + 128:] = jnp.zeros_like(
            h0_ref[:, n0 * wp + 128:])
        # u_pre rows [h0-3, h0+t+3), origin 0; q0 = 0
        n1 = t + 6
        u = _conv_into_al(h0_ref, xs_ref, w1_ref, c=c, wp=wp,
                          q0=0, n_rows=n1, precision=precision)
        u_pre = u + b1_ref[:]
        mask1 = m_ref[:, : n1 * wp]
        h0g = (bi - plan.g_blk) * plan.tile
        grow1 = h0g - 3 + rid_ref[:, : n1 * wp]
        rv1 = jnp.logical_and(grow1 >= 0, grow1 < plan.geom.H)
        h1c = jnp.where(jnp.logical_and(mask1 > 0, rv1), act(u_pre), 0.0)
        # h1 rows [h0-4, h0+t+4) origin -128
        _store_origin128(h1_ref, h1c, wp)
        # y_pre rows [h0-2, h0+t+2): q0 = wp
        n2 = t + 4
        y = _conv_into_al(h1_ref, xs_ref, w2_ref, c=c, wp=wp,
                          q0=wp, n_rows=n2, precision=precision)
        # x rows [h0-2, ...) at window element 2*wp+128 (aligned)
        xc = x_ref[i, :, 2 * wp + 128: 2 * wp + 128 + n2 * wp]
        y_pre = y + b2_ref[:] + xc.astype(jnp.float32)
        # incoming g rows [h0-2, h0+t+2): aligned read, origin 0
        graw = g_ref[i, :, 2 * wp + 128: 2 * wp + 128 + n2 * wp]
        g_yres = jnp.where(m_ref[:, : n2 * wp] > 0,
                           graw.astype(jnp.float32), 0.0)
        g_u2 = g_yres * dact(y_pre)
        # gu rows [h0-3, h0+t+3) origin -128 (one guard row each side)
        _store_origin128(gu_ref, g_u2, wp)
        # g_h1 rows [h0-1, h0+t+1): transposed conv2 over gu; q0 = wp
        n3 = t + 2
        g_h1 = _conv_into_al(gu_ref, xs_ref, w2t_ref, c=c, wp=wp,
                             q0=wp, n_rows=n3, precision=precision)
        u_cen = u_pre[:, 2 * wp: 2 * wp + n3 * wp]
        grow3 = h0g - 1 + rid_ref[:, : n3 * wp]
        rv3 = jnp.logical_and(grow3 >= 0, grow3 < plan.geom.H)
        g_v = jnp.where(jnp.logical_and(m_ref[:, : n3 * wp] > 0, rv3),
                        g_h1 * dact(u_cen), 0.0)
        # gv rows [h0-2, h0+t+2) origin -128
        _store_origin128(gv_ref, g_v, wp)
        # g_h0 rows [h0, h0+t): transposed conv1 over gv; q0 = wp
        g_h0 = _conv_into_al(gv_ref, xs_ref, w1t_ref, c=c, wp=wp,
                             q0=wp, n_rows=t, precision=precision)
        # x rows [h0, h0+t) at window element 4*wp+128 (aligned)
        xcen = x_ref[i, :, 4 * wp + 128: 4 * wp + 128 + t * wp]
        g_res = g_u2[:, 2 * wp: 2 * wp + t * wp]
        dx = g_h0 * (xcen.astype(jnp.float32) > 0) + g_res
        dx_ref[i, :, :] = dx.astype(dx_ref.dtype)

        # --- weight/bias grads, aligned form: the h-tap stacks are pure
        # row shifts (aligned); the g bands sit at {127, 128, 129} (center
        # aligned).  dw3[ky*c+ci, kx*c+co] = sum_m xs[ky*c+ci, m] *
        # gs[kx*c+co, m] with gs[kx][m] = g[m - 127 - kx].
        L = t * wp
        cwL = L + 130
        for kx in range(3):
            lo = 127 + kx
            gs_ref[kx * c:(kx + 1) * c, :lo] = jnp.zeros_like(
                gs_ref[kx * c:(kx + 1) * c, :lo])
            gs_ref[kx * c:(kx + 1) * c, lo + L:cwL] = jnp.zeros_like(
                gs_ref[kx * c:(kx + 1) * c, lo + L:cwL])
        # dw2: h1 taps (h1 buffer origin row h0-4 col -128): out row r
        # tap (ky, kx) = h1 element (r + 3 + ky)*wp + 128 + j + kx - 1,
        # matched by xs base (3+ky)*wp with the band offsets
        g_u2c = g_u2[:, 2 * wp: 2 * wp + L]
        for ky in range(3):
            q = (3 + ky) * wp
            xs_ref[ky * c:(ky + 1) * c, :cwL] = h1_ref[:, q:q + cwL]
        for kx in range(3):
            lo = 127 + kx
            gs_ref[kx * c:(kx + 1) * c, lo:lo + L] = g_u2c.astype(
                gs_ref.dtype)
        dw2_ref[:] += jax.lax.dot_general(
            xs_ref[:, :cwL], gs_ref[:, :cwL], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db2_ref[:] += jnp.sum(g_u2c, axis=1, keepdims=True)
        # dw1: h0 taps against g_v rows [h0, h0+t)
        g_vc = g_v[:, 1 * wp: 1 * wp + L]
        for ky in range(3):
            q = (3 + ky) * wp
            xs_ref[ky * c:(ky + 1) * c, :cwL] = h0_ref[:, q:q + cwL]
        for kx in range(3):
            lo = 127 + kx
            gs_ref[kx * c:(kx + 1) * c, lo:lo + L] = g_vc.astype(
                gs_ref.dtype)
        dw1_ref[:] += jax.lax.dot_general(
            xs_ref[:, :cwL], gs_ref[:, :cwL], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db1_ref[:] += jnp.sum(g_vc, axis=1, keepdims=True)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, m_ref, rid_ref,
                o_ref, xs_ref, h0_ref, h1_ref, *, plan: _FusedPlan,
                act_name: str, nb: int, precision):
    c, wp, t = plan.c, plan.geom.Wp, plan.tile
    act, _ = _act_fns(act_name)
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < plan.g_blk, bi >= plan.n_blk - plan.g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
      for i in range(nb):
        O = plan.origin
        # h0 = relu(x) over rows [h0-2, h0+t+2); buffer element (r_rel, col)
        # at r_rel*wp + col - 2 + ... : keep the raw window shift (col0=-2
        # relative to O) and account for it in the tap offsets.
        n0 = t + 4
        h0_ref[:, : n0 * wp] = jnp.maximum(
            x_ref[i, :, O:O + n0 * wp], 0.0
        ).astype(h0_ref.dtype)
        h0_ref[:, n0 * wp:] = jnp.zeros_like(h0_ref[:, n0 * wp:])
        # conv1 -> u rows [h0-1, h0+t+1): src h0 rows offset row0=1
        # (h0 buffer row 0 == global row h0-2), col0 = -2 shift baked into
        # the buffer => taps need +2 to undo it... fold: col origin of the
        # h0 buffer is -2, so a tap at col (kx-1) sits at +kx-1+2 = kx+1.
        n1 = t + 2
        u = _conv_into(h0_ref, xs_ref, w1_ref, c=c, wp=wp,
                       row0=1, col0=2, n_rows=n1, precision=precision)
        u_pre = u + b1_ref[:]
        # conv1 outputs only exist on image rows [0, H): virtual rows in
        # the halo must be exactly zero (the unfused stack's SAME padding),
        # not act(b1)
        h0g = (bi - plan.g_blk) * plan.tile
        grow = h0g - 1 + rid_ref[:, : n1 * wp]
        rvalid = jnp.logical_and(grow >= 0, grow < plan.geom.H)
        keep = jnp.logical_and(m_ref[:, : n1 * wp] > 0, rvalid)
        h1c = jnp.where(keep, act(u_pre), 0.0)  # where: kills NaN from the
        # slack taps that a multiplicative mask would propagate
        # h1 buffer: rows [h0-2, h0+t+2) with zero guard rows 0 and t+3,
        # col origin 0
        h1_ref[:, :wp] = jnp.zeros_like(h1_ref[:, :wp])
        h1_ref[:, (t + 3) * wp:(t + 4) * wp] = jnp.zeros_like(
            h1_ref[:, :wp]
        )
        h1_ref[:, wp:(t + 3) * wp] = h1c.astype(h1_ref.dtype)
        h1_ref[:, (t + 4) * wp:] = jnp.zeros_like(h1_ref[:, (t + 4) * wp:])
        # conv2 -> y rows [h0, h0+t): src h1 rows offset row0=2, col0=0
        y = _conv_into(h1_ref, xs_ref, w2_ref, c=c, wp=wp,
                       row0=2, col0=0, n_rows=t, precision=precision)
        xcen = x_ref[i, :, O + 2 * wp + 2: O + 2 * wp + 2 + t * wp]
        y_pre = y + b2_ref[:] + xcen.astype(jnp.float32)
        o_ref[i, :, :] = jnp.where(m_ref[:, : t * wp] > 0, act(y_pre),
                                   0.0).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref,
                w2t_ref, m_ref, rid_ref, dx_ref, dw1_ref, dw2_ref, db1_ref,
                db2_ref, xs_ref, h0_ref, h1_ref, gu_ref, gv_ref, gs_ref, *,
                plan: _FusedPlan, act_name: str, nb: int, precision):
    """One-pass fused backward; recomputes h0/h1/y_pre windows in VMEM.

    g_ref is the incoming cotangent window (same Element spec as x but with
    halo 2), rows [h0-2, h0+t+2).
    """
    c, wp, t = plan.c, plan.geom.Wp, plan.tile
    act, dact = _act_fns(act_name)
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    # The first-visit zero-init + `+=` weight-grad accumulation assumes the
    # default sequential ('arbitrary') grid order; dimension_semantics=
    # ('parallel', ...) would race the dw/db accumulators (see the matching
    # note on flatconv._dw_kernel).
    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    is_guard = jnp.logical_or(bi < plan.g_blk, bi >= plan.n_blk - plan.g_blk)

    @pl.when(is_guard)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
      for i in range(nb):
        O = plan.origin  # (row h0-4, col -4) for the bwd halo-4 window
        # recompute h0 = relu(x) rows [h0-4, h0+t+4)
        n0 = t + 8
        h0_ref[:, : n0 * wp] = jnp.maximum(
            x_ref[i, :, O:O + n0 * wp], 0.0
        ).astype(h0_ref.dtype)
        h0_ref[:, n0 * wp:] = jnp.zeros_like(h0_ref[:, n0 * wp:])
        # u_pre rows [h0-3, h0+t+3)
        n1 = t + 6
        u = _conv_into(h0_ref, xs_ref, w1_ref, c=c, wp=wp,
                       row0=1, col0=4, n_rows=n1, precision=precision)
        u_pre = u + b1_ref[:]
        mask1 = m_ref[:, : n1 * wp]
        h0g = (bi - plan.g_blk) * plan.tile
        grow1 = h0g - 3 + rid_ref[:, : n1 * wp]
        rv1 = jnp.logical_and(grow1 >= 0, grow1 < plan.geom.H)
        h1c = jnp.where(jnp.logical_and(mask1 > 0, rv1), act(u_pre), 0.0)
        h1_ref[:, :wp] = jnp.zeros_like(h1_ref[:, :wp])
        h1_ref[:, (n1 + 1) * wp:(n1 + 2) * wp] = jnp.zeros_like(
            h1_ref[:, :wp]
        )
        h1_ref[:, wp:(n1 + 1) * wp] = h1c.astype(h1_ref.dtype)
        h1_ref[:, (n1 + 2) * wp:] = jnp.zeros_like(h1_ref[:, (n1 + 2) * wp:])
        # y_pre rows [h0-2, h0+t+2): conv2 over h1 buffer (row origin h0-4,
        # buffer row 0 = guard) -> out row r_rel corresponds to global
        # h0-2+r_rel; src row offset row0=2, col0=0
        n2 = t + 4
        y = _conv_into(h1_ref, xs_ref, w2_ref, c=c, wp=wp,
                       row0=2, col0=0, n_rows=n2, precision=precision)
        xc = x_ref[i, :, O + 2 * wp + 4: O + 2 * wp + 4 + n2 * wp]
        y_pre = y + b2_ref[:] + xc.astype(jnp.float32)
        # incoming g rows [h0-2, h0+t+2) (own window origin: row h0-2,
        # col -2 => element (r_rel, col) at r_rel*wp + col - 2 + Og)
        Og = plan.origin  # same spec constant; g window uses halo-4 spec too
        graw = g_ref[i, :, Og + 2 * wp + 4: Og + 2 * wp + 4 + n2 * wp]
        g_yres = jnp.where(m_ref[:, : n2 * wp] > 0,
                           graw.astype(jnp.float32), 0.0)
        g_u2 = g_yres * dact(y_pre)  # cotangent of y_pre rows [h0-2,t+2)
        # store g_u2 into a guarded buffer for the transposed conv
        gu_ref[:, :wp] = jnp.zeros_like(gu_ref[:, :wp])
        gu_ref[:, (n2 + 1) * wp:(n2 + 2) * wp] = jnp.zeros_like(
            gu_ref[:, :wp]
        )
        gu_ref[:, wp:(n2 + 1) * wp] = g_u2.astype(gu_ref.dtype)
        gu_ref[:, (n2 + 2) * wp:] = jnp.zeros_like(gu_ref[:, (n2 + 2) * wp:])
        # g_h1 rows [h0-1, h0+t+1): transposed conv2 (flipped taps) over
        # gu buffer (row origin h0-3): out row r_rel ~ global h0-1+r_rel,
        # src row offset row0=2? buffer row 0 = guard (global h0-3):
        # out global h0-1+r = buffer row (r+2); taps +-1 => row0=2, col0=0
        n3 = t + 2
        g_h1 = _conv_into(gu_ref, xs_ref, w2t_ref, c=c, wp=wp,
                          row0=2, col0=0, n_rows=n3, precision=precision)
        # u_pre rows [h0-3,t+3) -> slice rows [h0-1,t+1): offset 2 rows
        u_cen = u_pre[:, 2 * wp: 2 * wp + n3 * wp]
        grow3 = h0g - 1 + rid_ref[:, : n3 * wp]
        rv3 = jnp.logical_and(grow3 >= 0, grow3 < plan.geom.H)
        g_v = jnp.where(jnp.logical_and(m_ref[:, : n3 * wp] > 0, rv3),
                        g_h1 * dact(u_cen), 0.0)
        gv_ref[:, :wp] = jnp.zeros_like(gv_ref[:, :wp])
        gv_ref[:, (n3 + 1) * wp:(n3 + 2) * wp] = jnp.zeros_like(
            gv_ref[:, :wp]
        )
        gv_ref[:, wp:(n3 + 1) * wp] = g_v.astype(gv_ref.dtype)
        gv_ref[:, (n3 + 2) * wp:] = jnp.zeros_like(gv_ref[:, (n3 + 2) * wp:])
        # g_h0 rows [h0, h0+t): transposed conv1 over gv buffer (row
        # origin h0-2): out global h0+r = buffer row r+2
        g_h0 = _conv_into(gv_ref, xs_ref, w1t_ref, c=c, wp=wp,
                          row0=2, col0=0, n_rows=t, precision=precision)
        # dx = g_h0 * relu'(x_center) + g_yres_center (residual path)
        xcen = x_ref[i, :, O + 4 * wp + 4: O + 4 * wp + 4 + t * wp]
        # residual path: dL/dx += dL/dy_pre = g * act'(y_pre) = g_u2
        g_res = g_u2[:, 2 * wp: 2 * wp + t * wp]
        dx = g_h0 * (xcen.astype(jnp.float32) > 0) + g_res
        dx_ref[i, :, :] = dx.astype(dx_ref.dtype)

        # --- weight/bias grads (partitioned over each conv's own output
        # positions: center rows only), 3-row-tap form:
        # dw3[ky*c+ci, kx*c+co] = sum_j src3[ky*c+ci, j] * g[co, j - kx],
        # with the shifted-g stack gs zero outside [kx, kx + t*wp).
        L = t * wp
        cwL = L + 3
        for kx in range(3):
            if kx > 0:
                gs_ref[kx * c:(kx + 1) * c, :kx] = jnp.zeros_like(
                    gs_ref[kx * c:(kx + 1) * c, :kx])
            gs_ref[kx * c:(kx + 1) * c, kx + L:cwL] = jnp.zeros_like(
                gs_ref[kx * c:(kx + 1) * c, kx + L:cwL])
        # dw2: h1 row taps (out global h0+r taps h1 buffer row r+ky+3,
        # col shift kx-1 => row base (3+ky)*wp - 1)
        g_u2c = g_u2[:, 2 * wp: 2 * wp + L]
        for ky in range(3):
            q = (3 + ky) * wp - 1
            xs_ref[ky * c:(ky + 1) * c, :cwL] = h1_ref[:, q:q + cwL]
        for kx in range(3):
            gs_ref[kx * c:(kx + 1) * c, kx:kx + L] = g_u2c.astype(
                gs_ref.dtype)
        dw2_ref[:] += jax.lax.dot_general(
            xs_ref[:, :cwL], gs_ref[:, :cwL], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db2_ref[:] += jnp.sum(g_u2c, axis=1, keepdims=True)
        # dw1: h0 row taps (col shift kx+3 => row base (3+ky)*wp + 3)
        g_vc = g_v[:, 1 * wp: 1 * wp + L]
        for ky in range(3):
            q = (3 + ky) * wp + 3
            xs_ref[ky * c:(ky + 1) * c, :cwL] = h0_ref[:, q:q + cwL]
        for kx in range(3):
            gs_ref[kx * c:(kx + 1) * c, kx:kx + L] = g_vc.astype(
                gs_ref.dtype)
        dw1_ref[:] += jax.lax.dot_general(
            xs_ref[:, :cwL], gs_ref[:, :cwL], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db1_ref[:] += jnp.sum(g_vc, axis=1, keepdims=True)


def _mk_plans(geom: FlatGeom, c: int, itemsize: int):
    fwd = _FusedPlan(geom, c, itemsize, halo=2)
    bwd = _FusedPlan(geom, c, itemsize, halo=4)
    # the two plans must agree on the block partition
    assert fwd.tile == bwd.tile and fwd.n_blk == bwd.n_blk, (fwd, bwd)
    return fwd, bwd


# Mosaic scoped-VMEM ceiling for the bwd kernel, expressed as a bound on
# c*(t+8)*Wp (the row-elements its f32 temporaries scale with).  Analytic
# stacking of the declared scratch + streamed windows underpredicts the
# measured scoped size ~3x (Mosaic materializes the per-op intermediates
# of the recompute chain), so the gate is calibrated on measured compiles:
#   bf16 512^2 t=32 (c*(t+8)*Wp = 165,120) compiles         -> admit
#   bf16 1024^2 t=32 (330,240) OOMs (>16M scoped)           -> reject
#   f32  512^2 t=16 (99,840) measures 17.19M, t=32 21.4M    -> f32 never
# f32 inputs OOM even at the *smallest* valid tile while a larger bf16
# case fits, so dtype gates first; the row-element bound then rejects the
# oversized bf16 geometries.  Rejected shapes fall back to two flat_conv2d
# calls in MultiConvResidualBlock (models/layers.py) — correct, just not
# single-kernel.
_BWD_ROW_ELEMS_BOUND = 208_000


def fused_res_supported(geom: FlatGeom, c: int, filter_size: int,
                        res_depth: int, activation: str,
                        itemsize: int = 2,
                        vmem_budget: int = 12 * 2**20) -> bool:
    if filter_size != 3 or res_depth != 2 or activation not in ("relu", "elu"):
        return False
    if geom.sp > 1:
        return False  # see flat_res_block: edge-row semantics
    if itemsize != 2 and not _use_interpret():
        return False  # see _BWD_ROW_ELEMS_BOUND: f32 OOMs at every tile
    try:
        dims = _ConvDims(9, 9, 1, 4, 4)  # bwd effective window
        from msau_tpu.ops.flatconv import _check_dims

        _check_dims(geom, dims)
        fwd, bwd = _mk_plans(geom, c, itemsize)
    except (AssertionError, ValueError):
        return False
    if _use_interpret():
        return True  # CPU interpret mode has no scoped-VMEM limit
    return c * (bwd.tile + 8) * geom.Wp <= _BWD_ROW_ELEMS_BOUND


def flat_res_block(x, w1, b1, w2, b2, geom: FlatGeom, activation: str,
                   mask_cotangent: bool = True):
    """Fused residual block on a body-flat tensor (see module docstring).

    x: [N, C, LB]; w1, w2: [3, 3, C, C]; b1, b2: [C].
    ``mask_cotangent=False`` skips the defensive guard re-zeroing of the
    incoming cotangent (safe inside the model's body algebra — see
    flatconv._flat_conv_bwd for the invariant argument).

    On a spatially sharded geometry (geom.sp > 1) the block runs on the
    halo-extended form (flatconv.extend_shards) so both convs see true
    cross-shard rows; gradients route back through the extension's VJP.
    """
    if geom.sp > 1:
        # The fused kernel zeroes conv1's virtual rows outside [0, H) —
        # on the halo-EXTENDED geometry that range admits the zero halo
        # rows at true image edges, where conv1 must be exactly 0 (SAME
        # semantics) but evaluates to act(b1).  Until the kernels take
        # per-entry valid-row bounds, sharded res blocks run as two
        # flat_conv2d calls (each extends itself; exactly correct —
        # fused_res_supported gates the model path accordingly).
        raise ValueError(
            "fused flat_res_block does not support spatially sharded "
            "geometries (geom.sp > 1); compose from flat_conv2d instead")
    return _flat_res_fused(x, w1, b1, w2, b2, geom, activation,
                           mask_cotangent)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flat_res_fused(x, w1, b1, w2, b2, geom: FlatGeom, activation: str,
                    mask_cotangent: bool = True):
    return _fused_fwd_call(x, w1, b1, w2, b2, geom, activation)


def _w_t(w):
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _fused_fwd_call(x, w1, b1, w2, b2, geom, activation):
    n, c, lb = x.shape
    assert lb == geom.LB
    itemsize = x.dtype.itemsize
    plan = _FusedPlan(geom, c, itemsize, halo=2)
    wp, t = geom.Wp, plan.tile
    interp = _use_interpret()
    slack = 256 if plan.aligned else 128
    scratch_bytes = ((3 * c * ((t + 2) * wp + slack)
                      + 2 * c * ((t + 4) * wp + slack)) * itemsize
                     + 2 * 3 * c * ((t + 2) * wp + slack) * 4)  # f32 z temps
    nb = _fused_batch_block(n, plan, itemsize, 2, scratch_bytes)
    kernel = functools.partial(
        _fwd_kernel_al if plan.aligned else _fwd_kernel,
        plan=plan, act_name=activation, nb=nb,
        precision=_dot_precision(x.dtype),
    )
    mask = _mask_row(wp, geom.W, t + 2, plan.stride)
    return pl.pallas_call(
        kernel,
        grid=(n // nb, plan.n_blk),
        in_specs=[
            _x_spec(plan, c, nb),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((c, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((c, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, (t + 2) * wp), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, (t + 2) * wp), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, c, plan.stride),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, c, geom.LB), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3 * c, (t + 2) * wp + slack), x.dtype),
            pltpu.VMEM((c, (t + 4) * wp + slack), x.dtype),
            pltpu.VMEM((c, (t + 4) * wp + slack), x.dtype),
        ],
        interpret=interp,
    )(x, _w_group(w1, x.dtype), b1.reshape(-1, 1).astype(jnp.float32),
      _w_group(w2, x.dtype), b2.reshape(-1, 1).astype(jnp.float32), mask,
      _row_idx(wp, t + 2))


def _fused_vjp_fwd(x, w1, b1, w2, b2, geom, activation,
                   mask_cotangent=True):
    y = _fused_fwd_call(x, w1, b1, w2, b2, geom, activation)
    return y, (x, w1, b1, w2, b2)


def _fused_vjp_bwd(geom, activation, mask_cotangent, res, g):
    x, w1, b1, w2, b2 = res
    n, c, lb = x.shape
    itemsize = x.dtype.itemsize
    plan = _FusedPlan(geom, c, itemsize, halo=4)
    wp, t = geom.Wp, plan.tile
    interp = _use_interpret()
    if mask_cotangent:
        g = body_mask(g, geom)
    g = g.astype(x.dtype)
    slack = 256 if plan.aligned else 128
    scratch_bytes = ((3 * c * ((t + 6) * wp + slack)
                      + 4 * c * ((t + 8) * wp + slack)) * itemsize
                     + 3 * c * (t * wp + slack) * 4
                     + 2 * 3 * c * ((t + 6) * wp + slack) * 4)  # f32 z temps
    nb = _fused_batch_block(n, plan, itemsize, 3, scratch_bytes)
    kernel = functools.partial(
        _bwd_kernel_al if plan.aligned else _bwd_kernel,
        plan=plan, act_name=activation, nb=nb,
        precision=_dot_precision(x.dtype),
    )
    mask = _mask_row(wp, geom.W, t + 6, plan.stride)
    dx, dw1s, dw2s, db1, db2 = pl.pallas_call(
        kernel,
        grid=(n // nb, plan.n_blk),
        in_specs=[
            _x_spec(plan, c, nb),
            _x_spec(plan, c, nb),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((c, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((c, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, (t + 6) * wp), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, (t + 6) * wp), lambda ni, bi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, c, plan.stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda ni, bi: (0, 0)),
            pl.BlockSpec((c, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((c, 1), lambda ni, bi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, geom.LB), x.dtype),
            jax.ShapeDtypeStruct((3 * c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((3 * c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * c, (t + 6) * wp + slack), x.dtype),
            pltpu.VMEM((c, (t + 8) * wp + slack), x.dtype),
            pltpu.VMEM((c, (t + 8) * wp + slack), x.dtype),
            pltpu.VMEM((c, (t + 8) * wp + slack), x.dtype),
            pltpu.VMEM((c, (t + 8) * wp + slack), x.dtype),
            pltpu.VMEM((3 * c, t * wp + slack), jnp.float32),
        ],
        interpret=interp,
    )(x, g, _w_group(w1, x.dtype), b1.reshape(-1, 1).astype(jnp.float32),
      _w_group(w2, x.dtype), b2.reshape(-1, 1).astype(jnp.float32),
      _w_group(_w_t(w1), x.dtype), _w_group(_w_t(w2), x.dtype), mask,
      _row_idx(wp, t + 6))
    # dw3 layout [ky*c+ci, kx*c+co] -> [ky, kx, ci, co]
    dw1 = dw1s.reshape(3, c, 3, c).transpose(0, 2, 1, 3).astype(w1.dtype)
    dw2 = dw2s.reshape(3, c, 3, c).transpose(0, 2, 1, 3).astype(w2.dtype)
    return (dx, dw1, db1.reshape(-1).astype(jnp.float32),
            dw2, db2.reshape(-1).astype(jnp.float32))


_flat_res_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def flat_res_block_reference(x, w1, b1, w2, b2, geom: FlatGeom,
                             activation: str):
    """Composition oracle via flat_conv2d, for tests."""
    from msau_tpu.ops.flatconv import flat_conv2d

    act, _ = _act_fns(activation)
    h0 = jnp.maximum(x, 0)
    h1 = act(flat_conv2d(h0, w1, b1, geom))
    y = flat_conv2d(h1, w2, b2, geom)
    return body_mask(act(y + x), geom)
