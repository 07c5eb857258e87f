"""Flat channel-major conv kernels for shallow (C << 128) U-Net scales.

Why this exists
---------------
XLA:TPU stores conv activations with the channel axis on the 128-wide lane
dimension.  At the MSAU shallow scales (feat_root=8..16 channels) that pads
8/128 lanes, inflating HBM traffic ~16x — the flagship train step moves
192 GB/step and is bandwidth-bound (PERF.md).  Measured on-chip: one
512^2 8->8 conv costs 5.2 ms / 2.28 GB in any XLA formulation
(scripts/exp_shallow_conv.py), vs ~140 MB of logical data.

The fix is a layout XLA cannot pick: put **W on the lane axis** and C on
sublanes.  Activations live in "body-flat" form

    x_body : [N, C, LB]   LB = (n_h + 2) * S,  S = tile_h * Wp,
    Wp = W + 2P (P = halo budget), n_h = H / tile_h

i.e. H*W pixels in row-major rows of width Wp (real pixels at columns
[0, W), zeros at [W, Wp)), preceded and followed by one *guard block* of
S zeros.  Real pixel (h, w) sits at flat index S + h*Wp + w.

The guard blocks and zero pad columns make every conv window an in-bounds
flat slice: the vertical halo of the first/last rows falls in the guards,
and the horizontal halo of each row falls in the zero pad columns of the
neighbouring rows.  A conv is then, per (batch, row-block) grid step:

    1. one lane-offset slice per kernel tap (KH*KW slices, all Cin rows at
       once) into a stacked buffer  xs : [KH*KW*Cin, TILE*Wp]
    2. ONE matmul  w2[KH*KW*Cin, Cout]^T @ xs  on the MXU
    3. bias + pad-column re-zeroing epilogue (precomputed mask operand)

Guard output blocks are written as zeros by the same kernel, so the layout
invariant (guards and pad columns are exactly 0) is closed under every op
in the tower: convs re-establish it, and the elementwise ops between them
(relu/elu, LRN, residual add, concat, dropout) all map 0 -> 0.

Backward is two more Pallas kernels of the same shape: dx is the transposed
conv (flipped/transposed taps), dw is one [R, L] x [L, Cout] matmul per tile
accumulated into a revisited output block.

Mosaic notes (all discovered on-chip, jax 0.9.0 / v5e):
  * overlapping windows need ``pl.Element`` dims; a spec must be all
    Element/Squeezed or all Blocked;
  * element offsets on the lane dim must be provably 128-divisible: we
    constrain tile*Wp % 128 == 0 so every window start shares one static
    misalignment that is folded into the in-kernel tap offsets, and wrap
    the index in ``pl.multiple_of(.., 128)`` (the prover fails on mul+add);
  * Element low padding is unsupported — hence guard blocks, not OOB pads.

Replaces the shallow-scale instances of the reference conv stack
(reference: model/layers/layers.py:10-164 run via cuDNN); deep scales stay
on XLA's native NHWC conv where lane padding is harmless.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_P = 2  # covers 3x3 d<=2, 4x4 d=1 and their transposed grads


class FlatGeom(NamedTuple):
    """Geometry of a body-flat tensor (one per U-Net scale).

    ``sp > 1`` marks a SPATIALLY SHARDED layout: H is the per-shard row
    count, and tensors carry ``sp * n_images`` entries on the batch axis
    in shard-major order (entry i*n + j = shard i of image j).  Flat ops
    that read vertical halos wrap themselves in extend_shards /
    shrink_shards so shard-boundary rows see their true neighbours (the
    context-parallel analog for the chargrid, SURVEY.md §5.7); under a
    GSPMD 'spatial' mesh axis the shard-shifted slices lower to
    collective permutes.
    """

    H: int
    W: int
    P: int
    tile_h: int  # rows per guard block; tile_h*Wp % 128 == 0, tile_h | H
    sp: int = 1  # spatial shards sharing the image (H_global = sp * H)

    @property
    def Wp(self) -> int:
        return self.W + 2 * self.P

    @property
    def S(self) -> int:  # guard block length
        return self.tile_h * self.Wp

    @property
    def n_h(self) -> int:
        return self.H // self.tile_h

    @property
    def LB(self) -> int:  # total flat length incl. guard blocks
        return (self.n_h + 2) * self.S


VMEM_XS_BUDGET = 6 * 2**20  # per-conv tap-stack scratch target


def choose_geom(h: int, w: int, *, min_p: int = DEFAULT_P,
                tile_cap: int = 32, itemsize: int = 2,
                max_cin: int = 17, wp_mod: int = 1) -> FlatGeom:
    """Pick (P, tile_h): smallest feasible halo, largest aligned tile.

    tile_h only sets the guard-block size and the per-conv tile ceiling;
    each conv picks its own sub-tile dividing tile_h that fits its
    tap-stack in VMEM (_sub_tile), so a wide worst-case conv no longer
    forces small grids on the narrow ones.  The widest conv expected at
    this scale (max_cin, itemsize) must fit at SOME valid sub-tile —
    f32 at 512^2 needs P=4 so that 16-row tiles align (P=2 only admits
    32-row tiles, whose 17-channel f32 tap-stack blows the 16M VMEM).
    """
    # guards cost 2/(H/tile_h + 2) of every tensor and bigger tiles were
    # measured slower at the flagship shapes (604 vs 583 ms/step at
    # tile 64 vs 32), so prefer small aligned tiles; fall back to the
    # smallest feasible tile above the cap rather than failing.
    soft_cap = min(tile_cap, max(1, h // 8))
    r_max = 9 * max_cin
    for p in range(min_p, min_p + 129):
        wp = w + 2 * p
        if wp % wp_mod:
            # wp_mod=8 aligns Wp so the flat upsample kernel's half-tile
            # input windows land on 128-element boundaries
            # ((t_out/2) * Wp_in % 128 == 0; see flat_upsample2)
            continue
        valid = [t for t in range(1, h + 1)
                 if h % t == 0 and (t * wp) % 128 == 0]
        if not valid:
            continue
        capped = [t for t in valid if t <= soft_cap]
        tile = max(capped) if capped else min(valid)
        if r_max * min(valid) * wp * itemsize <= VMEM_XS_BUDGET:
            return FlatGeom(h, w, p, tile)
    # No (P, tile) keeps the widest expected conv's tap-stack within the
    # VMEM budget (e.g. odd W where only large row tiles align): raise so
    # MSAUNet's except ValueError cleanly degrades to the NHWC path rather
    # than shipping a geometry that fails in the Mosaic compiler at runtime.
    raise ValueError(
        f"no VMEM-feasible flat geometry for H={h}, W={w} "
        f"(max_cin={max_cin}, itemsize={itemsize})"
    )


def max_flat_cin(kh: int, kw: int, geom: FlatGeom, itemsize: int,
                 budget: int = VMEM_XS_BUDGET) -> int:
    """Widest cin whose tap-stack fits the budget at the smallest tile.

    Convs wider than this are still served by the flat path via cin
    chunking in ``flat_conv2d`` (partial convs summed), so eligibility for
    the flat layout only requires max_flat_cin >= 1.
    """
    valid = [t for t in range(1, geom.tile_h + 1)
             if geom.tile_h % t == 0 and (t * geom.Wp) % 128 == 0]
    t_min = min(valid)
    # 3-row-tap scratch: [KH*Cin, tile*Wp] (kw does not multiply).
    # Same itemsize-scaled effective budget as _sub_tile, so a conv this
    # admits always has a feasible sub-tile.
    per_cin = kh * t_min * geom.Wp * itemsize
    return (budget * 2 // itemsize) // per_cin


def _sub_tile(geom: FlatGeom, r: int, itemsize: int,
              budget: int = VMEM_XS_BUDGET) -> int:
    """Per-conv row-block: largest aligned divisor of tile_h within budget.

    Shares VMEM_XS_BUDGET with choose_geom and flat_layers.flat_eligible so
    eligibility and the actual tile choice agree: any conv admitted by
    flat_eligible has r * min(valid) * Wp * itemsize <= budget, hence
    `fitting` below is non-empty; min(valid) is kept only as a belt-and-
    braces fallback for direct callers that bypass the eligibility gate.
    """
    valid = [t for t in range(1, geom.tile_h + 1)
             if geom.tile_h % t == 0 and (t * geom.Wp) % 128 == 0]
    assert valid, geom  # t == tile_h always qualifies by FlatGeom invariant
    # f32 inputs get half the tap budget: the kernels' f32 temporaries
    # (z accumulators, epilogue intermediates) are the same bytes at any
    # input dtype, so doubling the streamed/tap bytes leaves less scoped
    # VMEM for them.  Calibrated on-chip: the f32 512^2 end-conv dx kernel
    # exceeded the 16 MiB scoped limit by 0.6 MiB at tile 32 (Mosaic
    # compile error), while every bf16 512^2 kernel fits; tile 16 fixes
    # f32 with margin and bf16 tiles are unchanged.
    budget = budget * 2 // itemsize
    fitting = [t for t in valid if r * t * geom.Wp * itemsize <= budget]
    return max(fitting) if fitting else min(valid)


def to_body(x_nchw: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    """[N, C, H, W] -> body-flat [N, C, LB] (zero pads and guards)."""
    n, c, h, w = x_nchw.shape
    assert (h, w) == (geom.H, geom.W), (x_nchw.shape, geom)
    xp = jnp.pad(x_nchw, ((0, 0), (0, 0), (0, 0), (0, 2 * geom.P)))
    flat = xp.reshape(n, c, geom.H * geom.Wp)
    return jnp.pad(flat, ((0, 0), (0, 0), (geom.S, geom.S)))


def from_body(x_body: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    """body-flat [N, C, LB] -> [N, C, H, W]."""
    n, c, l = x_body.shape
    assert l == geom.LB, (x_body.shape, geom)
    core = x_body[:, :, geom.S: geom.S + geom.H * geom.Wp]
    return core.reshape(n, c, geom.H, geom.Wp)[:, :, :, : geom.W]


def body_mask(x_body: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    """Re-zero guards and pad columns (cheap XLA pass; used on cotangents)."""
    return to_body(from_body(x_body, geom), geom)


def extend_shards(x_body: jnp.ndarray, geom: FlatGeom):
    """Spatially sharded halo exchange by EXTENSION (geom.sp > 1).

    [sp*N, C, LB] shard-major -> ([sp*N, C, LB + 2S], geom_ext) where each
    shard's tensor gains one guard-block's worth (tile_h rows) of its
    neighbours' edge rows as REAL body rows of an (H + 2*tile_h)-row
    geometry.  Ops computed on the extended form see true cross-shard
    halos; shrink_shards slices the center back.  Because the halo rows
    are ordinary body rows (not kernel-zeroed guard blocks), the conv
    custom-VJPs produce their gradients, and the VJP of this function's
    shard-shifted slices routes them back to the owning shard — no
    kernel changes, and under a GSPMD 'spatial' mesh axis the shifts
    lower to collective permutes (ppermute).  First/last shards get zero
    halos (true image boundary, SAME-padding semantics).

    Replaces the reference's nothing — it is single-device only
    (model/training/trainer.py:59,114-120 caps area instead); this is
    the TPU-native context-parallel analog (SURVEY.md §5.7).
    """
    sp = geom.sp
    assert sp > 1, geom
    ne, c, lb = x_body.shape
    assert lb == geom.LB and ne % sp == 0, (x_body.shape, geom)
    n = ne // sp
    S = geom.S
    body = x_body[:, :, S:lb - S]
    x4 = body.reshape(sp, n, c, geom.H * geom.Wp)
    tail = x4[:, :, :, -S:]
    head = x4[:, :, :, :S]
    prev = jnp.concatenate([jnp.zeros_like(tail[:1]), tail[:-1]], axis=0)
    nxt = jnp.concatenate([head[1:], jnp.zeros_like(head[:1])], axis=0)
    zeros = jnp.zeros_like(tail)
    ext = jnp.concatenate([zeros, prev, x4, nxt, zeros], axis=3)
    geom_ext = FlatGeom(geom.H + 2 * geom.tile_h, geom.W, geom.P,
                        geom.tile_h, 1)
    return ext.reshape(ne, c, geom_ext.LB), geom_ext


def shrink_shards(y_ext: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    """Inverse of extend_shards' layout: slice the per-shard center rows
    back out of the extended form and re-wrap them in zero guards."""
    ne, c, lbe = y_ext.shape
    S = geom.S
    assert lbe == geom.LB + 2 * S, (y_ext.shape, geom)
    body = y_ext[:, :, 2 * S: 2 * S + geom.H * geom.Wp]
    z = jnp.zeros((ne, c, S), y_ext.dtype)
    return jnp.concatenate([z, body, z], axis=2)


class _ConvDims(NamedTuple):
    kh: int
    kw: int
    d: int
    pt: int     # virtual top padding of the conv (rows)
    pleft: int  # virtual left padding (cols)


def _check_dims(geom: FlatGeom, dims: _ConvDims) -> None:
    # vertical halo lives in the guard blocks (tile_h rows each side);
    # horizontal halo lives in the 2P zero pad columns between rows.
    assert dims.pt <= geom.tile_h and dims.pleft <= 2 * geom.P, (dims, geom)
    assert (dims.kh - 1) * dims.d - dims.pt <= geom.tile_h, (dims, geom)
    assert (dims.kw - 1) * dims.d - dims.pleft <= 2 * geom.P, (dims, geom)


class _Plan(NamedTuple):
    tile: int          # rows per compute block
    stride: int        # tile * Wp (block length, % 128 == 0)
    g_blk: int         # guard blocks per side (= tile_h / tile)
    n_blk: int         # total blocks = H/tile + 2*g_blk
    len_in: int        # input window length (% 128 == 0)
    start0: int        # 128-aligned constant part of the window offset
    r: int             # kh*kw*cin
    z0: int = 0        # z-slice base: 0 (classic) or 128-pleft (aligned)


def _plan(geom: FlatGeom, dims: _ConvDims, cin: int, itemsize: int,
          tile: Optional[int] = None) -> _Plan:
    _check_dims(geom, dims)
    kh, kw, d, pt, pleft = dims
    r = kh * kw * cin
    # the 3-row-tap scratch is [KH*Cin, tile*Wp] — only KH row groups, not
    # KH*KW taps — so the tile budget scales with kh*cin.  Callers whose
    # kernels hold more VMEM per row than the plain tap stack (the fused
    # residual block) pass their own `tile`.
    if tile is None:
        tile = _sub_tile(geom, kh * cin, itemsize)
    stride = tile * geom.Wp
    g_blk = geom.tile_h // tile
    n_blk = geom.H // tile + 2 * g_blk
    if geom.Wp % 128 == 0 and pleft > 0:
        # ALIGNED scheme (lane-aligned Wp): every row-tap copy offset is
        # a pure row shift ky*d*Wp (128-divisible), and the +-pleft column
        # handling moves into the z-slice combination at base z0 = 128 -
        # pleft (the window starts 128 columns early so all z slices stay
        # non-negative).  Measured on-chip (device trace): the misaligned
        # tap copies were the VPU bottleneck — 0.422 -> 0.317 ms for the
        # isolated 512^2 8->8 bf16 conv despite Wp 516 -> 640 traffic
        # (scripts/exp_align_variants.py, device timing).
        z0 = 128 - pleft
        start0 = -(pt * geom.Wp + 128)
        q_max = (kh - 1) * d * geom.Wp
        len_in = -(-(q_max + stride + z0 + (kw - 1) * d + 1) // 128) * 128
    else:
        z0 = 0
        # input element for out-block-local (row, col) under tap (ky, kx):
        #   global = blk*stride + local + (ky*d - pt)*Wp + (kx*d - pleft)
        # the most negative tap shift is raw0; floor-align it to 128.
        raw0 = -(pt * geom.Wp + pleft)
        start0 = raw0 - (raw0 % 128)  # <= raw0, multiple of 128, <= 0
        q_max = (((kh - 1) * d - pt) * geom.Wp
                 + ((kw - 1) * d - pleft) - start0)
        # +1: the 3-row-tap scheme's widest row window is q_row_max + cw =
        # q_max + stride + 1 (see _row_offsets)
        len_in = -(-(q_max + stride + 1) // 128) * 128
    # first compute block (bi = g_blk) must start in range, and the last
    # compute block's window must end inside the tail guard (no clamping
    # may ever affect a compute block — clamps only serve guard blocks).
    assert g_blk * stride + start0 >= 0, (geom, dims)
    last = (n_blk - g_blk - 1) * stride + start0
    assert last + len_in <= geom.LB, (geom, dims, tile, len_in)
    return _Plan(tile, stride, g_blk, n_blk, len_in, start0, r, z0)


def _row_offsets(plan: _Plan, geom: FlatGeom, dims: _ConvDims):
    """Static in-window offsets per ROW tap (ky), all >= 0.

    The kernels factor the conv by rows: KH lane-rotated copies build a
    row stack xs3[ky*cin:(ky+1)*cin, j] = x[blockstart + j - pleft +
    (ky*d - pt)*Wp]; one matmul against the [KH*Cin, KW*Cout]-regrouped
    weights yields all KW column-shift groups at once, and the final
    output sums KW misaligned row-slices of that product.  This replaces
    KH*KW rotated copies (the VPU-bound part of the kernel: ~20% lane
    efficiency on misaligned slices) with KH rotated copies of the same
    width plus KW-1 misaligned adds over Cout rows — measured 1.67x on the
    isolated 512^2 8->8 conv (scripts/exp_tap_variants.py).
    """
    kh, kw, d, pt, pleft = dims
    cw = plan.stride + plan.z0 + (kw - 1) * d + 1
    out = []
    for ky in range(kh):
        if plan.z0:
            # aligned scheme: pure row shift; window starts at
            # start0 = -(pt*Wp + 128), so row tap ky*d - pt sits at
            # (ky*d - pt)*Wp - start0 = ky*d*Wp + 128 - 128 ... the
            # extra 128 is absorbed into z0's column base.
            q = ky * d * geom.Wp
            assert q % 128 == 0
        else:
            q = (ky * d - pt) * geom.Wp - pleft - plan.start0
        assert 0 <= q and q + cw <= plan.len_in, (q, cw, plan)
        out.append(q)
    return tuple(out)


def _x_spec(plan: _Plan, geom: FlatGeom, cin: int, nb: int):
    hi_clamp = geom.LB - plan.len_in

    def x_index(ni, bi):
        s = bi * plan.stride + plan.start0
        s = jnp.clip(s, 0, hi_clamp)  # guard blocks read garbage, ignored
        # Mosaic requires all-Element (or no-Element) block dims, so the
        # batch-group dim is Element too: offset in images, not groups
        return (ni * nb, 0, pl.multiple_of(s, 128))

    return pl.BlockSpec(
        (pl.Element(nb), pl.Element(cin), pl.Element(plan.len_in)), x_index
    )


def _batch_block(n: int, in_bytes: int, out_bytes: int,
                 stack_bytes: int, per_img_bytes: int = 0) -> int:
    """Images per grid step: the grid (n, n_blk) runs tiny blocks whose
    per-step fixed cost (DMA issue, semaphores) dominates at feat_root-
    sized channels (~5 us/step vs ~2 us of work at 512^2 cin=8) — so
    process the largest divisor of n whose double-buffered windows plus
    the shared tap stack stay inside a 12 MiB working set.

    ``per_img_bytes`` counts kernel temporaries Mosaic keeps alive per
    unrolled image iteration instead of reusing (the f32 path: each
    HIGHEST/X3 dot holds its own f32 product plus bf16 hi/lo operand
    splits — measured: the plain f32 cin=16 512^2 fwd conv compiled at
    18.57M scoped VMEM with nb=8 while the matching bf16 kernel fits).
    bf16 callers pass 0 and keep their on-chip-calibrated nb choices.
    """
    budget = 12 * 2**20
    nb = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and (cand * (in_bytes + out_bytes) * 2 + stack_bytes
                              + cand * per_img_bytes) <= budget:
            nb = cand
            break
    return nb


def _act_pair(name: Optional[str]):
    """(act, dact-from-preactivation) for the fused epilogue."""
    if name is None:
        return None, None
    if name == "relu":
        return (lambda a: jnp.maximum(a, 0.0),
                lambda a: (a > 0).astype(jnp.float32))
    if name == "elu":
        return (jax.nn.elu,
                lambda a: jnp.where(a > 0, 1.0,
                                    jnp.exp(jnp.minimum(a, 0.0))))
    raise ValueError(f"unsupported fused activation: {name}")


def _lrn_pow(t: jnp.ndarray, beta: float) -> jnp.ndarray:
    """t**-beta with a sqrt fast path for torch's default beta=0.75."""
    if beta == 0.75:
        return jax.lax.rsqrt(t * jnp.sqrt(t))
    return jnp.exp(-beta * jnp.log(t))


def _lrn_win_dot(M_ref, y2, precision):
    """Channel-window sum  win[co, j] = sum_ci M[ci, co] * y2[ci, j].

    For bf16 kernels (precision DEFAULT) the operands are cast to bf16 and
    summed on the MXU in one pass: the window term enters the output as
    (k + alpha/size * win)^-beta with alpha=1e-4, so a ~0.5% relative
    error in win moves the output by ~1e-6 relative — measured 0.44 vs
    0.50 ms for the fused 512^2 LRN conv, and the 6-pass HIGHEST f32
    emulation is the single biggest epilogue cost on the aligned layout.
    f32 kernels keep the exact HIGHEST path (they are parity carriers).
    """
    if precision == jax.lax.Precision.DEFAULT:
        return jax.lax.dot_general(
            M_ref[:].astype(jnp.bfloat16), y2.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    return jax.lax.dot_general(
        M_ref[:], y2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _epilogue_fwd(acc, b_ref, M_ref, act_name, lrn,
                  precision=jax.lax.Precision.HIGHEST):
    """bias -> activation -> LRN on the f32 accumulator (pre-mask)."""
    a = acc + b_ref[:]
    act, _ = _act_pair(act_name)
    y = act(a) if act is not None else a
    if lrn is not None:
        size, alpha, beta, k = lrn
        win = _lrn_win_dot(M_ref, y * y, precision)
        y = y * _lrn_pow(k + (alpha / size) * win, beta)
    return y


def _fwd_kernel(*refs, plan: _Plan, offs,
                dims: _ConvDims, cins, couts, nb: int, precision,
                act_name: Optional[str] = None, lrn=None):
    """Forward conv kernel over CONCATENATED inputs and SPLIT outputs.

    ``cins`` is a tuple of input channel counts: the tap stack interleaves
    the inputs per row tap exactly as a channel concat would, so the
    standard [KH*sum(cins), KW*sum(couts)] weight grouping applies and a
    concat is never materialized (the up-tower merge conv pattern,
    reference model/model.py:228-243).  ``couts`` splits the accumulator
    rows over multiple output refs (used by the dual conv's dx, which
    produces the two branch cotangents directly).  The single-input,
    single-output case (cins=(cin,), couts=(cout,)) is the classic kernel.
    """
    n_in, n_out = len(cins), len(couts)
    x_refs = refs[:n_in]
    w_ref, b_ref, m_ref = refs[n_in:n_in + 3]
    rest = refs[n_in + 3:]
    if lrn is not None:
        M_ref = rest[0]
        rest = rest[1:]
    else:
        M_ref = None
    o_refs = rest[:n_out]
    xs_ref = rest[n_out]
    cin = sum(cins)
    cout = sum(couts)
    kh, kw, d = dims.kh, dims.kw, dims.d
    z0 = plan.z0
    cw = plan.stride + z0 + (kw - 1) * d + 1
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < plan.g_blk,
                              bi >= plan.n_blk - plan.g_blk)

    @pl.when(is_guard)
    def _():
        for o_ref in o_refs:
            o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for i in range(nb):
            for ky, q in enumerate(offs):
                base = ky * cin
                for xr, cj in zip(x_refs, cins):
                    xs_ref[base:base + cj, :cw] = xr[i, :, q:q + cw]
                    base += cj
            z = jax.lax.dot_general(
                w_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [KW*Cout, cw]: z_kx in rows [kx*cout, (kx+1)*cout)
            # start from the lane-ALIGNED slice so acc carries offset-0
            # layout: a misaligned base forces a full relayout before the
            # epilogue's LRN dot (measured +0.25 ms at 512^2 aligned geom)
            k0 = next((kx for kx in range(kw)
                       if (z0 + kx * d) % 128 == 0), 0)
            acc = z[k0 * cout:(k0 + 1) * cout,
                    z0 + k0 * d:z0 + k0 * d + plan.stride]
            for kx in range(kw):
                if kx == k0:
                    continue
                acc = acc + z[kx * cout:(kx + 1) * cout,
                              z0 + kx * d:z0 + kx * d + plan.stride]
            acc = _epilogue_fwd(acc, b_ref, M_ref, act_name, lrn,
                                precision) * m_ref[:]
            o0 = 0
            for o_ref, ck in zip(o_refs, couts):
                o_ref[i, :, :] = acc[o0:o0 + ck].astype(o_ref.dtype)
                o0 += ck


def _dw_kernel(*refs, plan: _Plan, offs,
               dims: _ConvDims, cins, cout: int, nb: int, precision):
    # The first-visit zero-init + `+=` accumulation below relies on the
    # default sequential ('arbitrary') grid semantics: every grid step
    # revisits the same dw block in order.  Do NOT add
    # dimension_semantics=('parallel', ...) to this pallas_call — a
    # parallel batch dim would race the accumulator and silently corrupt
    # weight gradients.
    n_in = len(cins)
    x_refs = refs[:n_in]
    g_ref = refs[n_in]
    dw_ref, xs_ref, gs_ref = refs[n_in + 1:]
    cin = sum(cins)
    kh, kw, d = dims.kh, dims.kw, dims.d
    z0 = plan.z0
    cw = plan.stride + z0 + (kw - 1) * d + 1
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    is_guard = jnp.logical_or(bi < plan.g_blk,
                              bi >= plan.n_blk - plan.g_blk)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        # dw3[ky*cin+ci, kx*cout+co] = sum_j xs3[ky*cin+ci, j] *
        # g[co, j - z0 - kx*d]: the column-shifted g stack gs carries each
        # kx group at lane offset z0 + kx*d, ZERO outside its band —
        # out-of-block tap contributions belong to neighbouring grid steps.
        for kx in range(kw):
            lo, hi = z0 + kx * d, z0 + kx * d + plan.stride
            if lo > 0:
                gs_ref[kx * cout:(kx + 1) * cout, :lo] = jnp.zeros_like(
                    gs_ref[kx * cout:(kx + 1) * cout, :lo])
            if hi < cw:
                gs_ref[kx * cout:(kx + 1) * cout, hi:cw] = jnp.zeros_like(
                    gs_ref[kx * cout:(kx + 1) * cout, hi:cw])
        for i in range(nb):
            for ky, q in enumerate(offs):
                base = ky * cin
                for xr, cj in zip(x_refs, cins):
                    xs_ref[base:base + cj, :cw] = xr[i, :, q:q + cw]
                    base += cj
            for kx in range(kw):
                gs_ref[kx * cout:(kx + 1) * cout,
                       z0 + kx * d:z0 + kx * d + plan.stride] = g_ref[i]
            dw_ref[:] += jax.lax.dot_general(
                xs_ref[:, :cw], gs_ref[:, :cw], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [KH*Cin, KW*Cout]


def _epi_bwd_kernel(x_ref, g_ref, w_ref, b_ref, m_ref, *rest,
                    plan: _Plan, offs, dims: _ConvDims, cin: int, cout: int,
                    nb: int, precision, act_name: Optional[str], lrn):
    """Cotangent transform for the fused epilogue, one pass.

    Recomputes the conv forward (taps already in VMEM), maps the incoming
    cotangent g (wrt the post-LRN/post-act output) back to g0 (wrt the
    conv preactivation), and accumulates dw/db from the same tap stack —
    so the backward of conv+act+LRN costs one windowed x read + one g
    read + one g0 write (plus the dx conv), instead of the 4-6 full XLA
    passes of the unfused LRN/act backward.

    Sequential-grid ('arbitrary') semantics required: dw/db use
    first-visit zero-init + `+=` like _dw_kernel — do NOT mark grid dims
    parallel.
    """
    if lrn is not None:
        M_ref, g0_ref, dw_ref, db_ref, xs_ref, gs_ref = rest
    else:
        M_ref = None
        g0_ref, dw_ref, db_ref, xs_ref, gs_ref = rest
    kh, kw, d = dims.kh, dims.kw, dims.d
    z0 = plan.z0
    cw = plan.stride + z0 + (kw - 1) * d + 1
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    is_guard = jnp.logical_or(bi < plan.g_blk,
                              bi >= plan.n_blk - plan.g_blk)

    @pl.when(is_guard)
    def _():
        g0_ref[:] = jnp.zeros_like(g0_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        # static zero bands of the shifted-g stack (see _dw_kernel)
        for kx in range(kw):
            lo, hi = z0 + kx * d, z0 + kx * d + plan.stride
            if lo > 0:
                gs_ref[kx * cout:(kx + 1) * cout, :lo] = jnp.zeros_like(
                    gs_ref[kx * cout:(kx + 1) * cout, :lo])
            if hi < cw:
                gs_ref[kx * cout:(kx + 1) * cout, hi:cw] = jnp.zeros_like(
                    gs_ref[kx * cout:(kx + 1) * cout, hi:cw])
        act, dact = _act_pair(act_name)
        for i in range(nb):
            for ky, q in enumerate(offs):
                xs_ref[ky * cin:(ky + 1) * cin, :cw] = (
                    x_ref[i, :, q:q + cw])
            z = jax.lax.dot_general(
                w_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            k0 = next((kx for kx in range(kw)
                       if (z0 + kx * d) % 128 == 0), 0)
            acc = z[k0 * cout:(k0 + 1) * cout,
                    z0 + k0 * d:z0 + k0 * d + plan.stride]
            for kx in range(kw):
                if kx == k0:
                    continue
                acc = acc + z[kx * cout:(kx + 1) * cout,
                              z0 + kx * d:z0 + kx * d + plan.stride]
            a = acc + b_ref[:]
            g = g_ref[i].astype(jnp.float32)
            if lrn is not None:
                size, alpha, beta, k = lrn
                s = alpha / size
                y1 = act(a) if act is not None else a
                win = _lrn_win_dot(M_ref, y1 * y1, precision)
                t = k + s * win
                r = _lrn_pow(t, beta)  # t^-beta
                # dL/dy1 = g*r - 2*beta*s * y1 * (M @ (g*y1*r/t))
                u = g * y1 * (r / t)
                if precision == jax.lax.Precision.DEFAULT:
                    mu = jax.lax.dot_general(
                        M_ref[:].astype(jnp.bfloat16),
                        u.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                else:
                    mu = jax.lax.dot_general(
                        M_ref[:], u, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                g1 = g * r - (2.0 * beta * s) * y1 * mu
            else:
                g1 = g
            g0 = g1 * dact(a) if act is not None else g1
            g0 = g0 * m_ref[:]
            g0_ref[i, :, :] = g0.astype(g0_ref.dtype)
            # dw/db from the already-loaded tap stack (see _dw_kernel)
            g0c = g0.astype(gs_ref.dtype)
            for kx in range(kw):
                gs_ref[kx * cout:(kx + 1) * cout,
                       z0 + kx * d:z0 + kx * d + plan.stride] = g0c
            dw_ref[:] += jax.lax.dot_general(
                xs_ref[:, :cw], gs_ref[:, :cw], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            db_ref[:] += jnp.sum(g0, axis=1, keepdims=True)


def _epi_bwd_call(xb, g, w2, b, geom: FlatGeom, dims: _ConvDims,
                  cout: int, act_name: Optional[str], lrn, interpret: bool):
    """Stage-1 backward: returns (g0 body tensor, dw2 [KH*Cin, KW*Cout],
    db [Cout])."""
    n, cin, lb = xb.shape
    kh, kw = dims.kh, dims.kw
    itemsize = xb.dtype.itemsize
    # same double-stack accounting as _dw_call: xs + gs scratch plus their
    # materialized [:, :cw] dot-operand copies
    plan = _plan(geom, dims, cin, itemsize,
                 tile=_sub_tile(geom, 2 * (kh * cin + kw * cout), itemsize))
    offs = _row_offsets(plan, geom, dims)
    cwp = -(-(plan.stride + plan.z0 + (kw - 1) * dims.d + 1) // 128) * 128
    epi_bytes = (2 * kw * cout * cwp * 4
                 + (6 * cout * cwp * 4 if lrn else 0))
    nb = _batch_block(n, cin * plan.len_in * itemsize
                      + cout * plan.stride * itemsize,
                      cout * plan.stride * itemsize,
                      (kh * cin + kw * cout) * cwp * itemsize
                      + (0 if itemsize == 4 else epi_bytes),
                      epi_bytes + (kh * cin + kw * cout) * cwp * 4
                      if itemsize == 4 else 0)
    kernel = functools.partial(
        _epi_bwd_kernel, plan=plan, offs=offs, dims=dims, cin=cin,
        cout=cout, nb=nb, precision=_dot_precision(xb.dtype),
        act_name=act_name, lrn=lrn,
    )
    in_specs = [
        _x_spec(plan, geom, cin, nb),
        pl.BlockSpec((nb, cout, plan.stride), lambda ni, bi: (ni, 0, bi)),
        pl.BlockSpec((kh * cin, kw * cout), lambda ni, bi: (0, 0)),
        pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
        pl.BlockSpec((1, plan.stride), lambda ni, bi: (0, 0)),
    ]
    args = [xb, g, w2, b, _col_mask(plan, geom)]
    if lrn is not None:
        in_specs.append(pl.BlockSpec((cout, cout), lambda ni, bi: (0, 0)))
        args.append(_lrn_matrix(cout, lrn[0]))
    g0, dw2, db = pl.pallas_call(
        kernel,
        grid=(n // nb, plan.n_blk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nb, cout, plan.stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((kh * cin, kw * cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cout, geom.LB), xb.dtype),
            jax.ShapeDtypeStruct((kh * cin, kw * cout), jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((kh * cin, cwp), xb.dtype),
                        pltpu.VMEM((kw * cout, cwp), xb.dtype)],
        interpret=interpret,
    )(*args)
    return g0, dw2, db.reshape(-1)


def _dot_precision(dtype) -> jax.lax.Precision:
    """bf16 operands: one exact MXU pass; f32: force the 3-pass algorithm.

    Mosaic cannot lower HIGHEST (or the global *_X3 preset) for bf16
    inputs ("Bad lhs type"), and bf16 x bf16 -> f32 accumulation is already
    exact, so DEFAULT is both required and lossless there.
    """
    return (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _col_mask(plan: _Plan, geom: FlatGeom) -> jnp.ndarray:
    col = jnp.arange(plan.stride, dtype=jnp.int32) % geom.Wp
    return (col < geom.W).astype(jnp.float32).reshape(1, plan.stride)


def _lrn_matrix(cout: int, size: int, dtype=jnp.float32) -> jnp.ndarray:
    """M[ci, co] = 1 iff ci lies in co's LRN window (torch clamping)."""
    lo, hi = size // 2, (size - 1) // 2
    ci = np.arange(cout)[:, None]
    co = np.arange(cout)[None, :]
    return jnp.asarray(((ci >= co - lo) & (ci <= co + hi)).astype(np.float32),
                       dtype)


def _conv_body(xb, w2: jnp.ndarray, b: jnp.ndarray,
               geom: FlatGeom, dims: _ConvDims, cout,
               out_dtype, interpret: bool, act_name: Optional[str] = None,
               lrn=None):
    """Core pallas_call: body x [N, Cin, LB] -> body y [N, Cout, LB].

    ``act_name``/``lrn`` fuse the ConvBnLrnDrop epilogue (bias -> act ->
    LRN, see models/layers.py) into the kernel: the separate XLA passes
    re-reading and re-writing the full body tensor disappear.

    ``xb`` may be a tuple of body tensors, computed as their channel
    concat without materializing it; ``cout`` may be a tuple, splitting
    the output rows over separate tensors (returned as a tuple).
    """
    xbs = xb if isinstance(xb, tuple) else (xb,)
    couts = cout if isinstance(cout, tuple) else (cout,)
    split_out = isinstance(cout, tuple)
    n = xbs[0].shape[0]
    cins = tuple(x.shape[1] for x in xbs)
    cin = sum(cins)
    cout = sum(couts)
    for x in xbs:
        assert x.shape[2] == geom.LB and x.shape[0] == n, (x.shape, geom)
    kh, kw = dims.kh, dims.kw
    itemsize = xbs[0].dtype.itemsize
    # tile budget counts the z intermediate's KW*Cout rows next to the
    # tap stack's KH*Cin: the wide-cout end conv (4x4, 17 out) holds a
    # [KW*Cout, cw] f32 product per image that dwarfs its 8-row tap stack
    plan = _plan(geom, dims, cin, itemsize,
                 tile=_sub_tile(geom, kh * cin + kw * cout, itemsize))
    offs = _row_offsets(plan, geom, dims)
    cwp = -(-(plan.stride + plan.z0 + (kw - 1) * dims.d + 1) // 128) * 128
    # stack budget: xs3 scratch + 2x the f32 z intermediate ([KW*Cout, cw])
    # the kernel materializes per image (the 4x4/17-out end conv OOM'd
    # VMEM when this was uncounted) + the LRN win/sq temps.  At f32 the
    # z/epilogue temps and the X3 operand splits are NOT reused across the
    # unrolled image loop — count them per image (see _batch_block).
    z_bytes = (2 * kw * cout * cwp * 4
               + (4 * cout * cwp * 4 if lrn else 0))
    if itemsize == 4:
        nb = _batch_block(n, cin * plan.len_in * itemsize,
                          cout * plan.stride * itemsize,
                          kh * cin * cwp * itemsize,
                          z_bytes + kh * cin * cwp * 4)
    else:
        nb = _batch_block(n, cin * plan.len_in * itemsize,
                          cout * plan.stride * itemsize,
                          kh * cin * cwp * itemsize + z_bytes)
    kernel = functools.partial(
        _fwd_kernel, plan=plan, offs=offs, dims=dims, cins=cins,
        couts=couts, nb=nb, precision=_dot_precision(xbs[0].dtype),
        act_name=act_name, lrn=lrn,
    )
    in_specs = [_x_spec(plan, geom, cj, nb) for cj in cins] + [
        pl.BlockSpec((kh * cin, kw * cout), lambda ni, bi: (0, 0)),
        pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
        pl.BlockSpec((1, plan.stride), lambda ni, bi: (0, 0)),
    ]
    args = list(xbs) + [w2, b, _col_mask(plan, geom)]
    if lrn is not None:
        in_specs.append(pl.BlockSpec((cout, cout), lambda ni, bi: (0, 0)))
        args.append(_lrn_matrix(cout, lrn[0]))
    out = pl.pallas_call(
        kernel,
        grid=(n // nb, plan.n_blk),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((nb, ck, plan.stride),
                                lambda ni, bi: (ni, 0, bi))
                   for ck in couts],
        out_shape=[jax.ShapeDtypeStruct((n, ck, geom.LB), out_dtype)
                   for ck in couts],
        scratch_shapes=[pltpu.VMEM((kh * cin, cwp), xbs[0].dtype)],
        interpret=interpret,
    )(*args)
    return tuple(out) if split_out else out[0]


def _dw_call(xb, g: jnp.ndarray, geom: FlatGeom,
             dims: _ConvDims, cin: int, cout: int,
             interpret: bool) -> jnp.ndarray:
    xbs = xb if isinstance(xb, tuple) else (xb,)
    cins = tuple(x.shape[1] for x in xbs)
    assert sum(cins) == cin
    n = xbs[0].shape[0]
    kh, kw = dims.kh, dims.kw
    itemsize = xbs[0].dtype.itemsize
    # the dw kernel holds TWO scratch stacks (xs: KH*Cin rows, gs: KW*Cout
    # rows) and Mosaic materializes their [:, :cw] dot operands as copies,
    # so the tile budget counts 2x both stacks — the planner's default
    # (kh*cin only) admitted a tile whose end-conv dw kernel measured
    # 16.80M scoped VMEM at f32 512^2 (limit 16M)
    plan = _plan(geom, dims, cin, itemsize,
                 tile=_sub_tile(geom, 2 * (kh * cin + kw * cout), itemsize))
    offs = _row_offsets(plan, geom, dims)
    cwp = -(-(plan.stride + plan.z0 + (kw - 1) * dims.d + 1) // 128) * 128
    # f32: the X3 dot's per-iteration operand splits aren't reused across
    # the unrolled image loop (see _batch_block)
    nb = _batch_block(n, cin * plan.len_in * itemsize,
                      cout * plan.stride * itemsize,
                      (kh * cin + kw * cout) * cwp * itemsize,
                      (kh * cin + kw * cout) * cwp * 4
                      if itemsize == 4 else 0)
    kernel = functools.partial(
        _dw_kernel, plan=plan, offs=offs, dims=dims, cins=cins, cout=cout,
        nb=nb, precision=_dot_precision(xbs[0].dtype),
    )
    return pl.pallas_call(
        kernel,
        grid=(n // nb, plan.n_blk),
        in_specs=[_x_spec(plan, geom, cj, nb) for cj in cins] + [
            pl.BlockSpec((nb, cout, plan.stride),
                         lambda ni, bi: (ni, 0, bi)),
        ],
        out_specs=pl.BlockSpec((kh * cin, kw * cout),
                               lambda ni, bi: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((kh * cin, kw * cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kh * cin, cwp), xbs[0].dtype),
                        pltpu.VMEM((kw * cout, cwp), xbs[0].dtype)],
        interpret=interpret,
    )(*xbs, g)


def _w_group(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """[KH, KW, Cin, Cout] -> [KH*Cin, KW*Cout] for the 3-row-tap kernels.

    Element [ky*cin + ci, kx*cout + co] = w[ky, kx, ci, co].
    """
    kh, kw, cin, cout = w.shape
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(
        kh * cin, kw * cout).astype(dtype)


def _w_transposed(w: jnp.ndarray) -> jnp.ndarray:
    """Taps for the gradient conv: flip spatially, swap in/out channels."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
)
def _flat_conv_prim(xb, w, b, geom: FlatGeom, kh: int, kw: int,
                    dilation: int, pt: int, pleft: int, out_dtype_name: str,
                    mask_cotangent: bool = True,
                    act: Optional[str] = None, lrn=None):
    dims = _ConvDims(kh, kw, dilation, pt, pleft)
    cout = w.shape[-1]
    out_dtype = jnp.dtype(out_dtype_name)
    return _conv_body(
        xb, _w_group(w, xb.dtype), b.reshape(-1, 1).astype(jnp.float32),
        geom, dims, cout, out_dtype, _use_interpret(),
        act_name=act, lrn=lrn,
    )


def _flat_conv_fwd(xb, w, b, geom, kh, kw, dilation, pt, pleft,
                   out_dtype_name, mask_cotangent=True, act=None, lrn=None):
    y = _flat_conv_prim(xb, w, b, geom, kh, kw, dilation, pt, pleft,
                        out_dtype_name, mask_cotangent, act, lrn)
    return y, (xb, w, b)


def _flat_conv_bwd(geom, kh, kw, dilation, pt, pleft, out_dtype_name,
                   mask_cotangent, act, lrn, res, g):
    xb, w, b = res
    dims = _ConvDims(kh, kw, dilation, pt, pleft)
    cin, cout = w.shape[2], w.shape[3]
    interp = _use_interpret()
    # In the model pipeline g's guards/pads are already zero (every producer
    # in the body algebra preserves them: body convs/pools/upsamples write
    # zero guards, elementwise ops map 0 -> 0, and the loss boundary's
    # from_body transpose pads with zeros), so the model wiring passes
    # mask_cotangent=False and skips this re-zeroing — its from_body +
    # to_body round trip was ~30 pad/slice/reshape instances per train
    # step.  The default stays defensive for arbitrary callers.
    if mask_cotangent:
        g = body_mask(g, geom)
    g = g.astype(xb.dtype)
    dims_t = _ConvDims(kh, kw, dilation,
                       (kh - 1) * dilation - pt,
                       (kw - 1) * dilation - pleft)
    wt = _w_transposed(w)
    zero_b = jnp.zeros((cin,), jnp.float32)
    if act is not None or lrn is not None:
        # fused epilogue: one stage-1 kernel recomputes the conv, maps g
        # back through LRN/act, and emits dw/db from the same tap stack;
        # then dx is the usual transposed conv of the transformed g0.
        g0, dw2, db = _epi_bwd_call(
            xb, g, _w_group(w, xb.dtype),
            b.reshape(-1, 1).astype(jnp.float32), geom, dims, cout,
            act, lrn, interp,
        )
        dxb = _conv_body(g0, _w_group(wt, g0.dtype), zero_b.reshape(-1, 1),
                         geom, dims_t, cin, xb.dtype, interp)
        dw = dw2.reshape(kh, cin, kw, cout).transpose(0, 2, 1, 3).astype(
            w.dtype)
        return dxb, dw, db
    # dx: transposed conv of the cotangent
    dxb = _conv_body(g, _w_group(wt, g.dtype), zero_b.reshape(-1, 1),
                     geom, dims_t, cin, xb.dtype, interp)
    # dw: one stacked matmul per tile, accumulated across the grid
    dw2 = _dw_call(xb, g, geom, dims, cin, cout, interp)
    dw = dw2.reshape(kh, cin, kw, cout).transpose(0, 2, 1, 3).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 2), dtype=jnp.float32)
    return dxb, dw, db


_flat_conv_prim.defvjp(_flat_conv_fwd, _flat_conv_bwd)


def flat_conv2d(
    x_body: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    geom: FlatGeom,
    *,
    dilation: int = 1,
    padding: str = "SAME",
    out_dtype=None,
    mask_cotangent: bool = True,
    vmem_budget: int = VMEM_XS_BUDGET,
    act: Optional[str] = None,
    lrn_size: Optional[int] = None,
    lrn_alpha: float = 1e-4,
    lrn_beta: float = 0.75,
    lrn_k: float = 1.0,
) -> jnp.ndarray:
    """Stride-1 2-D conv on a body-flat tensor.

    x_body: [N, Cin, LB]; w: [KH, KW, Cin, Cout] (flax HWIO order);
    b: [Cout] or None.  Returns body-flat [N, Cout, LB] with zero pads and
    guards.  ``padding='SAME'`` reproduces TF/XLA SAME for stride 1 (even
    kernels pad more on the bottom/right, reference model/layers/utils.py).
    ``mask_cotangent=False`` skips the defensive guard re-zeroing in the
    VJP — only safe when every downstream consumer preserves the body
    invariant (the model wiring does; see _flat_conv_bwd).

    ``act`` ('relu'/'elu') and ``lrn_size`` fuse the ConvBnLrnDrop epilogue
    (bias -> activation -> LocalResponseNorm, torch semantics) into the
    conv kernel and its custom VJP — zero extra HBM passes in forward, one
    recompute kernel in backward.  Falls back to XLA epilogue ops for
    chunked wide-cin convs and unsupported activations.
    """
    kh, kw, cin, cout = w.shape
    assert x_body.shape[1] == cin, (x_body.shape, w.shape)
    if geom.sp > 1 and kh > 1:
        # spatially sharded layout: compute on the halo-extended form so
        # vertical taps cross shard boundaries correctly (extend_shards);
        # kh == 1 convs have no vertical halo and skip the round trip
        xe, geom_ext = extend_shards(x_body, geom)
        ye = flat_conv2d(
            xe, w, b, geom_ext, dilation=dilation, padding=padding,
            out_dtype=out_dtype, mask_cotangent=mask_cotangent,
            vmem_budget=vmem_budget, act=act, lrn_size=lrn_size,
            lrn_alpha=lrn_alpha, lrn_beta=lrn_beta, lrn_k=lrn_k)
        return shrink_shards(ye, geom)
    if act in ("none", "identity"):
        act = None
    if padding == "SAME":
        pt = ((kh - 1) * dilation) // 2
        pleft = ((kw - 1) * dilation) // 2
    else:  # explicit (pt, pleft)
        pt, pleft = padding
    if b is None:
        b = jnp.zeros((cout,), jnp.float32)
    out_dtype_name = jnp.dtype(out_dtype or x_body.dtype).name
    cmax = max_flat_cin(kh, kw, geom, x_body.dtype.itemsize, vmem_budget)
    fusable = act in (None, "relu", "elu")
    lrn = ((int(lrn_size), float(lrn_alpha), float(lrn_beta), float(lrn_k))
           if (lrn_size and fusable) else None)
    # On TPU the fused epilogue is bf16-only, like the fused res block:
    # at f32 the kernel's per-image f32 temporaries plus the HIGHEST-
    # precision (3-pass) dot operand splits exceed the 16 MiB scoped-VMEM
    # limit (measured on-chip: the 512^2 f32 cin=16 act+LRN conv compiled
    # at 18.57M scoped, Mosaic compile error).  f32 paths take the XLA
    # epilogue below — the calibrated round-2 behavior.  Interpret mode
    # (CPU tests) has no scoped-VMEM limit and keeps f32 kernel coverage.
    fuse = (fusable and (act is not None or lrn is not None)
            and (x_body.dtype.itemsize == 2 or _use_interpret()))

    def _xla_epilogue(y):
        # chunked / unsupported-act fallback: epilogue as plain XLA ops
        if act is not None:
            from msau_tpu.models.layers import get_activation

            y = get_activation(act)(y)
        if lrn_size:
            y = body_lrn(y, lrn_size, lrn_alpha, lrn_beta, lrn_k)
        return y

    if cin > cmax:
        # Wide-cin conv (e.g. the 64-channel chargrid entry conv): the tap
        # stack of the full conv blows VMEM, but the conv factorizes exactly
        # into partial convs over cin chunks summed in the output — each
        # chunk is its own Pallas call, the (chunks-1) extra output-sized
        # read+add pairs are noise next to the lane-padding traffic the
        # NHWC fallback would pay.  Balanced chunk sizes keep every call on
        # the same sub-tile.  The epilogue cannot fuse into a partial conv
        # (it needs the full sum), so it runs as XLA ops here.
        if cmax < 1:
            raise ValueError(
                f"flat conv infeasible even at cin=1 (cin={cin}, {geom})")
        n_chunks = -(-cin // cmax)
        chunk = -(-cin // n_chunks)
        out = None
        for i in range(0, cin, chunk):
            j = min(i + chunk, cin)
            part = _flat_conv_prim(
                x_body[:, i:j, :], w[:, :, i:j, :],
                b if i == 0 else jnp.zeros((cout,), jnp.float32),
                geom, kh, kw, dilation, int(pt), int(pleft),
                out_dtype_name, bool(mask_cotangent))
            out = part if out is None else out + part
        return _xla_epilogue(out)
    y = _flat_conv_prim(
        x_body, w, b, geom, kh, kw, dilation, int(pt), int(pleft),
        out_dtype_name, bool(mask_cotangent),
        act if fuse else None, lrn if fuse else None)
    if not fuse:
        return _xla_epilogue(y)
    return y


def flat_conv2d_reference(x_body, w, b, geom: FlatGeom, *, dilation=1,
                          padding="SAME"):
    """XLA oracle with identical semantics, for tests."""
    kh, kw, cin, cout = w.shape
    x = from_body(x_body, geom).astype(jnp.float32)
    if padding == "SAME":
        pad = "SAME"
    else:
        pt, pleft = padding
        pad = ((pt, (kh - 1) * dilation - pt),
               (pleft, (kw - 1) * dilation - pleft))
    y = jax.lax.conv_general_dilated(
        x, w.astype(jnp.float32), (1, 1), pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    if b is not None:
        y = y + b.astype(jnp.float32).reshape(1, cout, 1, 1)
    return to_body(y, geom)


# ---------------------------------------------------------------------------
# Layout helpers used by the model wiring


def body_upsample2(x_body: jnp.ndarray, geom_in: FlatGeom,
                   geom_out: FlatGeom) -> jnp.ndarray:
    """Zero-insertion x2 upsampling (transposed-conv lhs dilation).

    [N, C, LB_in] at (H, W) -> [N, C, LB_out] at (Ho, Wo) where
    Ho in {2H-1, 2H}, Wo in {2W-1, 2W}: real pixel (2i, 2j) = x[i, j].
    """
    n, c, _ = x_body.shape
    x = from_body(x_body, geom_in)
    ho, wo = geom_out.H, geom_out.W
    # interior padding is XLA's native zero-insertion; the equivalent
    # .at[::2, ::2].set scatter was measured at 12.8/10.3 ms fwd/bwd per
    # 512^2 instance vs 7.2/2.6 for this form
    up = jax.lax.pad(
        x, jnp.zeros((), x.dtype),
        ((0, 0, 0), (0, 0, 0), (0, 1, 1), (0, 1, 1)),
    )
    return to_body(up[:, :, :ho, :wo], geom_out)


def _upsample_tiles(geom_in: FlatGeom, geom_out: FlatGeom):
    """Feasible (t_out, t_in) block tiles for flat_upsample2, or None.

    Constraints: exact x2 geometry; fwd grid over geom_out blocks needs
    (t_out/2) * Wp_in aligned input windows; bwd grid over geom_in blocks
    needs 2 * t_in * Wp_out aligned cotangent windows.
    """
    if geom_out.H != 2 * geom_in.H or geom_out.W != 2 * geom_in.W:
        return None
    t_out = [t for t in range(2, geom_out.tile_h + 1, 2)
             if geom_out.tile_h % t == 0 and (t * geom_out.Wp) % 128 == 0
             and ((t // 2) * geom_in.Wp) % 128 == 0]
    t_in = [t for t in range(1, geom_in.tile_h + 1)
            if geom_in.tile_h % t == 0 and (t * geom_in.Wp) % 128 == 0
            and (2 * t * geom_out.Wp) % 128 == 0]
    if not t_out or not t_in:
        return None
    return max(t_out), max(t_in)


def _insert_matrix(geom_in: FlatGeom, geom_out: FlatGeom, dtype) -> jnp.ndarray:
    """[Wp_in, Wp_out] zero-insert matrix: row @ M dilates columns 2x.

    Mosaic has no lane interleave, but a banded 0/1 matmul on the MXU does
    the same job (M[j, 2j] = 1 for real columns) — the box-conv trick.
    """
    j = np.arange(geom_in.Wp)[:, None]
    q = np.arange(geom_out.Wp)[None, :]
    m = (q == 2 * j) & (j < geom_in.W)
    return jnp.asarray(m.astype(np.float32), dtype)


def _ups_fwd_kernel(x_ref, m_ref, o_ref, *, t_out, wp_in, wp_out,
                    g_blk, n_blk, nb, precision):
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        zero_row = jnp.zeros_like(o_ref[0, :, :wp_out])
        for i in range(nb):
            for m in range(t_out // 2):
                row = x_ref[i, :, m * wp_in:(m + 1) * wp_in]
                out = jax.lax.dot_general(
                    row, m_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                o_ref[i, :, 2 * m * wp_out:(2 * m + 1) * wp_out] = out.astype(
                    o_ref.dtype)
                o_ref[i, :, (2 * m + 1) * wp_out:(2 * m + 2) * wp_out] = (
                    zero_row)


def _ups_bwd_kernel(g_ref, m_ref, o_ref, *, t_in, wp_in, wp_out,
                    g_blk, n_blk, nb, precision):
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for i in range(nb):
            for m in range(t_in):
                grow = g_ref[i, :, 2 * m * wp_out:(2 * m + 1) * wp_out]
                out = jax.lax.dot_general(
                    grow, m_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                o_ref[i, :, m * wp_in:(m + 1) * wp_in] = out.astype(
                    o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flat_upsample2(x_body: jnp.ndarray, geom_in: FlatGeom,
                   geom_out: FlatGeom) -> jnp.ndarray:
    """Zero-insertion x2 upsample, body-flat -> body-flat, in one Pallas
    kernel (real pixel (2i, 2j) = x[i, j], all other pixels 0).

    Replaces body_upsample2's from_body -> interior-pad -> to_body round
    trip, whose NCHW relayouts + the backward's strided slices were the
    single largest glue family in the flagship step profile (~3-5 ms per
    instance x 6 deconvs).  Requires ``_upsample_tiles`` feasibility —
    callers fall back to body_upsample2 otherwise.
    """
    tiles = _upsample_tiles(geom_in, geom_out)
    assert tiles is not None, (geom_in, geom_out)
    t_out, _ = tiles
    n, c, lb = x_body.shape
    assert lb == geom_in.LB, (x_body.shape, geom_in)
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    g_blk = geom_out.tile_h // t_out
    n_blk = geom_out.H // t_out + 2 * g_blk
    len_win = (t_out // 2) * wp_in
    itemsize = x_body.dtype.itemsize
    nb = _batch_block(n, c * len_win * itemsize,
                      c * t_out * wp_out * itemsize, 0)
    kernel = functools.partial(
        _ups_fwd_kernel, t_out=t_out, wp_in=wp_in, wp_out=wp_out,
        g_blk=g_blk, n_blk=n_blk, nb=nb,
        precision=_dot_precision(x_body.dtype),
    )

    def x_index(ni, bi):
        s = (bi - g_blk) * len_win + geom_in.S
        return (ni * nb, 0,
                pl.multiple_of(jnp.clip(s, 0, geom_in.LB - len_win), 128))

    return pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(nb), pl.Element(c), pl.Element(len_win)), x_index),
            pl.BlockSpec((wp_in, wp_out), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, c, t_out * wp_out),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, c, geom_out.LB), x_body.dtype),
        interpret=_use_interpret(),
    )(x_body, _insert_matrix(geom_in, geom_out, x_body.dtype))


def _flat_upsample2_fwd(x_body, geom_in, geom_out):
    return flat_upsample2(x_body, geom_in, geom_out), None


def _flat_upsample2_bwd(geom_in, geom_out, _, g):
    t_in = _upsample_tiles(geom_in, geom_out)[1]
    n, c, _ = g.shape
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    g_blk = geom_in.tile_h // t_in
    n_blk = geom_in.H // t_in + 2 * g_blk
    len_win = 2 * t_in * wp_out
    itemsize = g.dtype.itemsize
    nb = _batch_block(n, c * len_win * itemsize,
                      c * t_in * wp_in * itemsize, 0)
    kernel = functools.partial(
        _ups_bwd_kernel, t_in=t_in, wp_in=wp_in, wp_out=wp_out,
        g_blk=g_blk, n_blk=n_blk, nb=nb, precision=_dot_precision(g.dtype),
    )

    def g_index(ni, bi):
        s = (bi - g_blk) * len_win + geom_out.S
        return (ni * nb, 0,
                pl.multiple_of(jnp.clip(s, 0, geom_out.LB - len_win), 128))

    # transpose insert matrix: dx row j sums g row 2j's column 2j entries
    mt = jnp.transpose(_insert_matrix(geom_in, geom_out, g.dtype))
    dx = pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(nb), pl.Element(c), pl.Element(len_win)), g_index),
            pl.BlockSpec((wp_out, wp_in), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, c, t_in * wp_in),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, c, geom_in.LB), g.dtype),
        interpret=_use_interpret(),
    )(g, mt)
    return (dx,)


flat_upsample2.defvjp(_flat_upsample2_fwd, _flat_upsample2_bwd)


# ---------------------------------------------------------------------------
# Fused stride-2 transposed conv: upsample + 3x3 conv in ONE kernel
# ---------------------------------------------------------------------------
#
# The up-tower deconv (reference model/layers/layers.py:207-260 via
# ConvTranspose2d) ran as flat_upsample2 -> flat_conv2d: the zero-inserted
# intermediate `up` (geom_out-sized) was written to HBM, re-read by the
# conv, kept alive as the conv VJP's residual, and its cotangent dUp was
# materialized again in backward.  The fused kernels build the dilated
# rows in VMEM (the same insert-matrix MXU trick) and never touch HBM with
# them: forward reads x and writes y; backward-dx computes the transposed
# conv of g in VMEM and emits dx (= dUp sampled at even positions — the
# transpose of conv∘upsample is the stride-2 conv) in the same pass;
# backward-dw rebuilds the dilated taps from x while accumulating dw.


def _deconv_tiles(geom_in: FlatGeom, geom_out: FlatGeom):
    """(t_out, t_in) block tiles for flat_deconv2, or None.

    fwd/dw grids run over geom_out blocks of t_out rows and read
    (t_out/2 + 1)-row x windows; dx runs over geom_in blocks of t_in rows
    and reads (2*t_in + 2)-row g windows.  All window starts must be
    128-aligned, and the transposed conv's negative start offset must stay
    inside the leading guard block.
    """
    if geom_out.H != 2 * geom_in.H or geom_out.W != 2 * geom_in.W:
        return None
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    t_out = [t for t in range(2, geom_out.tile_h + 1, 2)
             if geom_out.tile_h % t == 0 and (t * wp_out) % 128 == 0
             and ((t // 2) * wp_in) % 128 == 0]
    t_in = [t for t in range(1, geom_in.tile_h + 1)
            if geom_in.tile_h % t == 0 and (t * wp_in) % 128 == 0
            and (2 * t * wp_out) % 128 == 0]
    if not t_out or not t_in:
        return None
    # fwd x window must end inside the tail guard (see _plan's last-block
    # rule): slack after the last needed row is (tile_h_in - 1) * wp_in,
    # the 128-round-up of the window length must fit in it
    to, ti = max(t_out), max(t_in)
    need = (to // 2 + 1) * wp_in
    len_x = -(-need // 128) * 128
    if len_x - need > (geom_in.tile_h - 1) * wp_in:
        return None
    # dx: first compute block's window start S_out + start0 must be >= 0
    raw0 = -(wp_out + 1)
    start0 = raw0 - (raw0 % 128)
    if geom_out.S + start0 < 0:
        return None
    return to, ti


def _dc_z0(wp_out: int) -> int:
    return 127 if wp_out % 128 == 0 else 0  # 128 - pleft aligned scheme


def _dc_fwd_kernel(x_ref, mi_ref, w_ref, b_ref, mask_ref, o_ref, ups_ref,
                   xs_ref, rs_ref, *, t, wp_in, wp_out, cin, cout, g_blk,
                   n_blk, nb, precision):
    z0 = _dc_z0(wp_out)
    pad0 = 128
    stride = t * wp_out
    cw = stride + z0 + 3  # (kw-1)*d + 1 = 3
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for i in range(nb):
            # dilated up rows R-1..R+t in VMEM: local j odd = up row
            # R-1+j = x row (R+j-1)/2 (window-local row (j-1)/2), even
            # j (odd up rows) stay zero; margins cover the column taps
            if i == 0:
                # margins + even-j (odd up) rows; odd-j rows are fully
                # overwritten below for every image
                ups_ref[:] = jnp.zeros_like(ups_ref)
            # stack the window's x rows and dilate with ONE MXU dot
            # (t/2+1 per-row dots ran at M=cin rows; see _mp_fwd_kernel)
            for m in range(t // 2 + 1):
                rs_ref[m * cin:(m + 1) * cin, :] = x_ref[
                    i, :, m * wp_in:(m + 1) * wp_in]
            drows = jax.lax.dot_general(
                rs_ref[:], mi_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [(t/2+1)*cin, wp_out]
            for j in range(1, t + 2, 2):
                m = (j - 1) // 2
                ups_ref[:, pad0 + j * wp_out:pad0 + (j + 1) * wp_out] = (
                    drows[m * cin:(m + 1) * cin].astype(ups_ref.dtype))
            for ky in range(3):
                q = pad0 + ky * wp_out - 1 - z0  # pleft = 1
                xs_ref[ky * cin:(ky + 1) * cin, :cw] = ups_ref[:, q:q + cw]
            z = jax.lax.dot_general(
                w_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [3*cout, cw]
            k0 = next((kx for kx in range(3) if (z0 + kx) % 128 == 0), 0)
            acc = z[k0 * cout:(k0 + 1) * cout, z0 + k0:z0 + k0 + stride]
            for kx in range(3):
                if kx == k0:
                    continue
                acc = acc + z[kx * cout:(kx + 1) * cout,
                              z0 + kx:z0 + kx + stride]
            acc = (acc + b_ref[:]) * mask_ref[:]
            o_ref[i, :, :] = acc.astype(o_ref.dtype)


def _dc_dx_kernel(g_ref, mt_ref, wt_ref, o_ref, xs_ref, *, t_in, wp_in,
                  wp_out, cin, cout, g_blk, n_blk, nb, start0,
                  precision):
    # dx = stride-2 conv of g: compute the transposed conv dUp for the
    # 2*t_in up rows of this geom_in block entirely in VMEM (standard tap
    # machinery, dims_t pt=pleft=1), then sample even rows/cols via the
    # transposed insert matrix.
    z0 = _dc_z0(wp_out)
    stride = 2 * t_in * wp_out
    cw = stride + z0 + 3
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for i in range(nb):
            for ky in range(3):
                # row tap ky*d - pt = ky - 1; window base already carries
                # start0 (folded into the Element window offset)
                q = (ky - 1) * wp_out - 1 - start0 - z0
                xs_ref[ky * cout:(ky + 1) * cout, :cw] = g_ref[i, :,
                                                               q:q + cw]
            z = jax.lax.dot_general(
                wt_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [3*cin, cw]
            k0 = next((kx for kx in range(3) if (z0 + kx) % 128 == 0), 0)
            acc = z[k0 * cin:(k0 + 1) * cin, z0 + k0:z0 + k0 + stride]
            for kx in range(3):
                if kx == k0:
                    continue
                acc = acc + z[kx * cin:(kx + 1) * cin,
                              z0 + kx:z0 + kx + stride]
            # sample even dUp rows at even columns: one [wp_out, wp_in]
            # matmul per geom_in row
            for m in range(t_in):
                dxrow = jax.lax.dot_general(
                    acc[:, (2 * m) * wp_out:(2 * m + 1) * wp_out],
                    mt_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                o_ref[i, :, m * wp_in:(m + 1) * wp_in] = dxrow.astype(
                    o_ref.dtype)


def _dc_dw_kernel(x_ref, g_ref, mi_ref, dw_ref, ups_ref, xs_ref, gs_ref,
                  rs_ref, *, t, wp_in, wp_out, cin, cout, g_blk, n_blk,
                  nb, precision):
    # same dilated-taps preamble as the forward, accumulating
    # dw[ky*cin+ci, kx*cout+co] like flatconv._dw_kernel (sequential-grid
    # revisit accumulation — do NOT mark grid dims parallel)
    z0 = _dc_z0(wp_out)
    pad0 = 128
    stride = t * wp_out
    cw = stride + z0 + 3
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for kx in range(3):
            lo, hi = z0 + kx, z0 + kx + stride
            if lo > 0:
                gs_ref[kx * cout:(kx + 1) * cout, :lo] = jnp.zeros_like(
                    gs_ref[kx * cout:(kx + 1) * cout, :lo])
            if hi < cw:
                gs_ref[kx * cout:(kx + 1) * cout, hi:cw] = jnp.zeros_like(
                    gs_ref[kx * cout:(kx + 1) * cout, hi:cw])
        for i in range(nb):
            if i == 0:
                # margins + even-j (odd up) rows; odd-j rows are fully
                # overwritten below for every image
                ups_ref[:] = jnp.zeros_like(ups_ref)
            # stack the window's x rows and dilate with ONE MXU dot
            # (t/2+1 per-row dots ran at M=cin rows; see _mp_fwd_kernel)
            for m in range(t // 2 + 1):
                rs_ref[m * cin:(m + 1) * cin, :] = x_ref[
                    i, :, m * wp_in:(m + 1) * wp_in]
            drows = jax.lax.dot_general(
                rs_ref[:], mi_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [(t/2+1)*cin, wp_out]
            for j in range(1, t + 2, 2):
                m = (j - 1) // 2
                ups_ref[:, pad0 + j * wp_out:pad0 + (j + 1) * wp_out] = (
                    drows[m * cin:(m + 1) * cin].astype(ups_ref.dtype))
            for ky in range(3):
                q = pad0 + ky * wp_out - 1 - z0
                xs_ref[ky * cin:(ky + 1) * cin, :cw] = ups_ref[:, q:q + cw]
            for kx in range(3):
                gs_ref[kx * cout:(kx + 1) * cout,
                       z0 + kx:z0 + kx + stride] = g_ref[i]
            dw_ref[:] += jax.lax.dot_general(
                xs_ref[:, :cw], gs_ref[:, :cw], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )


def _dc_x_spec(geom_in: FlatGeom, t: int, g_blk: int, cin: int, nb: int):
    len_win = (t // 2) * geom_in.Wp
    len_x = -(-((t // 2 + 1) * geom_in.Wp) // 128) * 128
    hi = geom_in.LB - len_x

    def x_index(ni, bi):
        s = (bi - g_blk) * len_win + geom_in.S
        return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))

    return pl.BlockSpec(
        (pl.Element(nb), pl.Element(cin), pl.Element(len_x)), x_index
    ), len_x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flat_deconv2_prim(x_body, w, b, geom_in: FlatGeom,
                       geom_out: FlatGeom):
    n, cin, lb = x_body.shape
    assert lb == geom_in.LB, (x_body.shape, geom_in)
    cout = w.shape[-1]
    t, _ = _deconv_tiles(geom_in, geom_out)
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    g_blk = geom_out.tile_h // t
    n_blk = geom_out.H // t + 2 * g_blk
    stride = t * wp_out
    itemsize = x_body.dtype.itemsize
    cwp = -(-(stride + _dc_z0(wp_out) + 3) // 128) * 128
    ups_bytes = cin * (256 + (t + 2) * wp_out) * itemsize
    x_spec, len_x = _dc_x_spec(geom_in, t, g_blk, cin, nb=1)
    nb = _batch_block(n, cin * len_x * itemsize,
                      cout * stride * itemsize,
                      ups_bytes + 3 * cin * cwp * itemsize
                      + 2 * 3 * cout * cwp * 4)
    x_spec, len_x = _dc_x_spec(geom_in, t, g_blk, cin, nb)
    plan = _Plan(t, stride, g_blk, n_blk, stride, 0, 9 * cin)
    kernel = functools.partial(
        _dc_fwd_kernel, t=t, wp_in=wp_in, wp_out=wp_out, cin=cin,
        cout=cout, g_blk=g_blk, n_blk=n_blk, nb=nb,
        precision=_dot_precision(x_body.dtype))
    return pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            x_spec,
            pl.BlockSpec((wp_in, wp_out), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * cin, 3 * cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, stride), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, cout, stride),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, cout, geom_out.LB),
                                       x_body.dtype),
        scratch_shapes=[
            pltpu.VMEM((cin, 256 + (t + 2) * wp_out), x_body.dtype),
            pltpu.VMEM((3 * cin, cwp), x_body.dtype),
            pltpu.VMEM(((t // 2 + 1) * cin, wp_in), x_body.dtype),
        ],
        interpret=_use_interpret(),
    )(x_body, _insert_matrix(geom_in, geom_out, x_body.dtype),
      _w_group(w, x_body.dtype), b.reshape(-1, 1).astype(jnp.float32),
      _col_mask(plan, geom_out))


def _flat_deconv2_fwd(x_body, w, b, geom_in, geom_out):
    return _flat_deconv2_prim(x_body, w, b, geom_in, geom_out), (x_body, w)


def _flat_deconv2_bwd(geom_in, geom_out, res, g):
    x_body, w = res
    n, cin, _ = x_body.shape
    cout = w.shape[-1]
    t, t_in = _deconv_tiles(geom_in, geom_out)
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    itemsize = x_body.dtype.itemsize
    g = g.astype(x_body.dtype)  # body invariant holds in the model wiring

    # --- dx: stride-2 conv of g, geom_out -> geom_in, one kernel
    z0 = _dc_z0(wp_out)
    raw0 = -(wp_out + 1) - z0
    start0 = raw0 - (raw0 % 128)
    stride_dx = 2 * t_in * wp_out
    cw_dx = stride_dx + z0 + 3
    len_g = -(-(((3 - 1) - 1) * wp_out - 1 - start0 - z0 + cw_dx)
              // 128) * 128
    g_blk_in = geom_in.tile_h // t_in
    n_blk_in = geom_in.H // t_in + 2 * g_blk_in
    cwp_dx = -(-cw_dx // 128) * 128
    hi = geom_out.LB - len_g

    def g_index_builder(nb):
        def g_index(ni, bi):
            s = (bi - g_blk_in) * stride_dx + geom_out.S + start0
            return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))
        return g_index

    nb = _batch_block(n, cout * len_g * itemsize,
                      cin * t_in * wp_in * itemsize,
                      3 * cout * cwp_dx * itemsize
                      + 2 * 3 * cin * cwp_dx * 4)
    wt = _w_transposed(w)
    mt = jnp.transpose(_insert_matrix(geom_in, geom_out, g.dtype))
    kernel_dx = functools.partial(
        _dc_dx_kernel, t_in=t_in, wp_in=wp_in, wp_out=wp_out, cin=cin,
        cout=cout, g_blk=g_blk_in, n_blk=n_blk_in, nb=nb, start0=start0,
        precision=_dot_precision(g.dtype))
    dx = pl.pallas_call(
        kernel_dx,
        grid=(n // nb, n_blk_in),
        in_specs=[
            pl.BlockSpec((pl.Element(nb), pl.Element(cout),
                          pl.Element(len_g)), g_index_builder(nb)),
            pl.BlockSpec((wp_out, wp_in), lambda ni, bi: (0, 0)),
            pl.BlockSpec((3 * cout, 3 * cin), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, cin, t_in * wp_in),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, cin, geom_in.LB), x_body.dtype),
        scratch_shapes=[pltpu.VMEM((3 * cout, cwp_dx), g.dtype)],
        interpret=_use_interpret(),
    )(g, mt, _w_group(wt, g.dtype))

    # --- dw: rebuild the dilated taps from x, accumulate [3*Cin, 3*Cout]
    g_blk = geom_out.tile_h // t
    n_blk = geom_out.H // t + 2 * g_blk
    stride = t * wp_out
    cwp = -(-(stride + z0 + 3) // 128) * 128
    ups_bytes = cin * (256 + (t + 2) * wp_out) * itemsize
    x_spec, len_x = _dc_x_spec(geom_in, t, g_blk, cin, nb=1)
    nb2 = _batch_block(n, cin * len_x * itemsize + cout * stride * itemsize,
                       0,
                       ups_bytes + (3 * cin + 3 * cout) * cwp * itemsize)
    x_spec, len_x = _dc_x_spec(geom_in, t, g_blk, cin, nb2)
    kernel_dw = functools.partial(
        _dc_dw_kernel, t=t, wp_in=wp_in, wp_out=wp_out, cin=cin,
        cout=cout, g_blk=g_blk, n_blk=n_blk, nb=nb2,
        precision=_dot_precision(x_body.dtype))
    dw2 = pl.pallas_call(
        kernel_dw,
        grid=(n // nb2, n_blk),
        in_specs=[
            x_spec,
            pl.BlockSpec((nb2, cout, stride), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((wp_in, wp_out), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * cin, 3 * cout), lambda ni, bi: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * cin, 3 * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cin, 256 + (t + 2) * wp_out), x_body.dtype),
            pltpu.VMEM((3 * cin, cwp), x_body.dtype),
            pltpu.VMEM((3 * cout, cwp), x_body.dtype),
            pltpu.VMEM(((t // 2 + 1) * cin, wp_in), x_body.dtype),
        ],
        interpret=_use_interpret(),
    )(x_body, g, _insert_matrix(geom_in, geom_out, x_body.dtype))
    dw = dw2.reshape(3, cin, 3, cout).transpose(0, 2, 1, 3).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 2), dtype=jnp.float32)
    return dx, dw, db


_flat_deconv2_prim.defvjp(_flat_deconv2_fwd, _flat_deconv2_bwd)


def flat_deconv2(x_body: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 geom_in: FlatGeom, geom_out: FlatGeom):
    """Fused stride-2 3x3 transposed conv (zero-insert upsample + SAME
    conv), body-flat geom_in -> geom_out, or None if the geometry pair
    doesn't admit the fused tiling (caller falls back to flat_upsample2 /
    body_upsample2 + flat_conv2d).

    Exactly equal to flat_conv2d(flat_upsample2(x), w, b, geom_out) —
    the torch ConvTranspose2d(stride=2, padding=1) emulation of
    DeconvBnLrnDrop (reference model/layers/layers.py:207-260) — but the
    zero-inserted intermediate never exists in HBM, in forward or
    backward.  Requires the body invariant on the incoming cotangent.
    """
    assert w.shape[:2] == (3, 3), w.shape
    if geom_in.sp > 1:
        return None  # spatially sharded deconvs keep the two-op path
    if geom_out.Wp % 128:
        # measured on-chip (flagship bs=16 device trace): the fused kernel
        # wins only on lane-aligned outputs (scale-0 512^2: fwd 2.52 ->
        # 1.61, bwd 4.47 -> 4.09 ms) — on the unaligned scale-1 geometry
        # its misaligned VMEM tap copies LOSE to the two-op path (fwd
        # <=1.36 -> 1.90, bwd 2.04 -> 2.47 ms), so those keep
        # flat_upsample2 + flat_conv2d.
        return None
    if _deconv_tiles(geom_in, geom_out) is None:
        return None
    t, t_in = _deconv_tiles(geom_in, geom_out)
    itemsize = x_body.dtype.itemsize
    cin, cout = w.shape[2], w.shape[3]
    # scoped-VMEM gate: ups scratch + tap stacks + z products per image
    cwp = -(-(t * geom_out.Wp + _dc_z0(geom_out.Wp) + 3) // 128) * 128
    est = (cin * (256 + (t + 2) * geom_out.Wp) * itemsize
           + (3 * cin + 3 * cout) * cwp * itemsize
           + 2 * 3 * cout * cwp * 4)
    if est > 13 * 2**20:
        return None
    return _flat_deconv2_prim(x_body, w, b, geom_in, geom_out)


def _pool2_halves(x_body, geom_in):
    n, c, _ = x_body.shape
    h, w, wp = geom_in.H, geom_in.W, geom_in.Wp
    core = x_body[:, :, geom_in.S: geom_in.S + h * wp]
    core = core.reshape(n, c, h // 2, 2 * wp)
    a = core[..., :wp][..., :w]
    b = core[..., wp:][..., :w]
    return a, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pool2_even(x_body, geom_in: FlatGeom, geom_out: FlatGeom):
    a, b = _pool2_halves(x_body, geom_in)
    rows = jnp.maximum(a, b)
    p = jnp.maximum(rows[..., 0::2], rows[..., 1::2])
    return to_body(p, geom_out)


def _pool2_even_fwd(x_body, geom_in, geom_out):
    return _pool2_even(x_body, geom_in, geom_out), x_body


def _pool2_even_bwd(geom_in, geom_out, x_body, g):
    """Route grads with interior pads; autodiff's strided-slice transposes
    lowered to indexed scatters (~7 ms per 512^2 instance)."""
    n, c, _ = x_body.shape
    h, w, wp = geom_in.H, geom_in.W, geom_in.Wp
    g4 = from_body(g, geom_out)
    a, b = _pool2_halves(x_body, geom_in)
    rows = jnp.maximum(a, b)
    rme = rows[..., 0::2]
    rmo = rows[..., 1::2]
    m_e = rme >= rmo  # ties to the even column (reduce_window first-match)
    zero = jnp.zeros((), g4.dtype)
    ge = jax.lax.pad(jnp.where(m_e, g4, 0),
                     zero, ((0, 0, 0),) * 3 + ((0, 1, 1),))
    go = jax.lax.pad(jnp.where(m_e, 0, g4),
                     zero, ((0, 0, 0),) * 3 + ((1, 0, 1),))
    grm = ge + go  # [N, C, H/2, W]
    m_a = a >= b
    ga = jnp.pad(jnp.where(m_a, grm, 0),
                 ((0, 0),) * 3 + ((0, 2 * geom_in.P),))
    gb = jnp.pad(jnp.where(m_a, 0, grm),
                 ((0, 0),) * 3 + ((0, 2 * geom_in.P),))
    dxcore = jnp.concatenate([ga, gb], axis=-1).reshape(n, c, h * wp)
    dx = jnp.pad(dxcore, ((0, 0), (0, 0), (geom_in.S, geom_in.S)))
    return (dx,)


_pool2_even.defvjp(_pool2_even_fwd, _pool2_even_bwd)


# ---------------------------------------------------------------------------
# Fused Pallas 2x2 maxpool (forward + routed backward in one kernel each)
# ---------------------------------------------------------------------------
#
# The XLA _pool2_even path costs ~4.3 ms fwd+bwd per stage at the flagship
# shapes (isolated, scripts/exp_pool_cost.py: 2.83 + 0.86 + 0.63 ms for the
# three scales) — its fwd materializes the row-half slices and the to_body
# re-pad, and its bwd runs interior pads + concats over full tensors.  The
# fused kernels do the row-pair max on contiguous Wp-chunks in VMEM, take
# the column-pair max with a shift, and COMPACT even columns with the 0/1
# insert-matrix transpose on the MXU (selection is linear, so a matmul
# does it exactly — max first, select after).  The backward recomputes the
# winners from x and routes the cotangent with two shifts and selects; no
# interior pads, concats, or scatters touch HBM.


def _pool_tiles(geom_in: FlatGeom, geom_out: FlatGeom):
    """(t_fwd, t_bwd) row-block tiles for the fused pool, or None.

    fwd grids over geom_out blocks of t rows reading 2t input rows; bwd
    grids over geom_in blocks of t_bwd rows reading t_bwd/2 cotangent
    rows.  All window offsets/lengths must be 128-aligned (no rounding
    slack is available: the windows end exactly at the body tail).
    """
    if (geom_out.H * 2, geom_out.W * 2) != (geom_in.H, geom_in.W):
        return None
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    tf_ = [t for t in range(1, geom_out.tile_h + 1)
           if geom_out.tile_h % t == 0 and (t * wp_out) % 128 == 0
           and (2 * t * wp_in) % 128 == 0]
    tb = [t for t in range(2, geom_in.tile_h + 1, 2)
          if geom_in.tile_h % t == 0 and (t * wp_in) % 128 == 0
          and ((t // 2) * wp_out) % 128 == 0]
    if not tf_ or not tb:
        return None
    return max(tf_), max(tb)


def _shift_left1(v):
    """v[:, q] -> v[:, q+1] content (drop col 0 ... append zero)."""
    return jax.lax.pad(v[:, 1:], jnp.zeros((), v.dtype),
                       ((0, 0, 0), (0, 1, 0)))


def _shift_right1(v):
    return jax.lax.pad(v[:, :-1], jnp.zeros((), v.dtype),
                       ((0, 0, 0), (1, 0, 0)))


def _mp_fwd_kernel(x_ref, sel_ref, o_ref, ms_ref, *, t, wp_in, wp_out,
                   g_blk, n_blk, nb, c, precision):
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for i in range(nb):
            # stack all t row winners, then ONE [t*C, Wp_in] selection dot
            # (per-row dots ran the MXU at M=C=8 rows; the stack amortizes)
            for r in range(t):
                # maxes in f32 (Mosaic lacks bf16 vector comparisons);
                # the values stay exactly representable, so casting the
                # winner back for the MXU selection dot is lossless
                a = x_ref[i, :, (2 * r) * wp_in:
                          (2 * r + 1) * wp_in].astype(jnp.float32)
                b = x_ref[i, :, (2 * r + 1) * wp_in:
                          (2 * r + 2) * wp_in].astype(jnp.float32)
                rows = jnp.maximum(a, b)
                ms_ref[r * c:(r + 1) * c, :] = jnp.maximum(
                    rows, _shift_left1(rows)).astype(ms_ref.dtype)
            p = jax.lax.dot_general(
                ms_ref[:], sel_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [t*C, Wp_out]
            for r in range(t):
                o_ref[i, :, r * wp_out:(r + 1) * wp_out] = (
                    p[r * c:(r + 1) * c].astype(o_ref.dtype))


def _mp_bwd_kernel(x_ref, g_ref, m_ref, o_ref, gs_ref, *, t, wp_in,
                   wp_out, g_blk, n_blk, nb, c, precision):
    # t here is t_bwd (geom_in rows per block); m_ref: [wp_out, wp_in]
    # insert matrix dilating the cotangent row back to even input columns
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        for i in range(nb):
            # stack the block's cotangent rows, then ONE dilation dot
            # (per-row dots ran the MXU at M=C rows; see _mp_fwd_kernel)
            for m in range(t // 2):
                gs_ref[m * c:(m + 1) * c, :] = g_ref[i, :, m * wp_out:
                                                     (m + 1) * wp_out]
            dups = jax.lax.dot_general(
                gs_ref[:], m_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [(t/2)*C, Wp_in], even-q content
            for m in range(t // 2):
                a = x_ref[i, :, (2 * m) * wp_in:
                          (2 * m + 1) * wp_in].astype(jnp.float32)
                b = x_ref[i, :, (2 * m + 1) * wp_in:
                          (2 * m + 2) * wp_in].astype(jnp.float32)
                rows = jnp.maximum(a, b)
                dup = dups[m * c:(m + 1) * c]
                # ties to the even column / the upper row, matching
                # _pool2_even_bwd (reduce_window first-match semantics).
                # everything in f32: Mosaic has no bf16 vector cmpf
                # ("Target does not support this comparison")
                ge = rows >= _shift_left1(rows)
                dcol = (jnp.where(ge, dup, 0.0)
                        + _shift_right1(jnp.where(ge, 0.0, dup)))
                m_a = a >= b
                o_ref[i, :, (2 * m) * wp_in:(2 * m + 1) * wp_in] = (
                    jnp.where(m_a, dcol, 0.0).astype(o_ref.dtype))
                o_ref[i, :, (2 * m + 1) * wp_in:(2 * m + 2) * wp_in] = (
                    jnp.where(m_a, 0.0, dcol).astype(o_ref.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flat_maxpool2_prim(x_body, geom_in: FlatGeom, geom_out: FlatGeom):
    n, c, lb = x_body.shape
    assert lb == geom_in.LB, (x_body.shape, geom_in)
    t, _ = _pool_tiles(geom_in, geom_out)
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    g_blk = geom_out.tile_h // t
    n_blk = geom_out.H // t + 2 * g_blk
    itemsize = x_body.dtype.itemsize
    len_x = 2 * t * wp_in
    # per-image f32 temporaries (a/b/rows/me per row iteration) are NOT
    # reused across the unrolled loops (see _batch_block) — uncounted,
    # the scale-0 bwd kernel measured 16.99M scoped vs the 16M limit
    nb = _batch_block(n, c * len_x * itemsize,
                      c * t * wp_out * itemsize,
                      0, t * 4 * c * wp_in * 4)
    hi = geom_in.LB - len_x

    def x_index(ni, bi):
        s = (bi - g_blk) * len_x + geom_in.S
        return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))

    kernel = functools.partial(
        _mp_fwd_kernel, t=t, wp_in=wp_in, wp_out=wp_out, g_blk=g_blk,
        n_blk=n_blk, nb=nb, c=c, precision=_dot_precision(x_body.dtype))
    sel = jnp.transpose(_insert_matrix(geom_out, geom_in, x_body.dtype))
    return pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            pl.BlockSpec((pl.Element(nb), pl.Element(c),
                          pl.Element(len_x)), x_index),
            pl.BlockSpec((wp_in, wp_out), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, c, t * wp_out),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, c, geom_out.LB), x_body.dtype),
        scratch_shapes=[pltpu.VMEM((t * c, wp_in), x_body.dtype)],
        interpret=_use_interpret(),
    )(x_body, sel)


def _flat_maxpool2_fwd(x_body, geom_in, geom_out):
    return _flat_maxpool2_prim(x_body, geom_in, geom_out), x_body


def _flat_maxpool2_bwd(geom_in, geom_out, x_body, g):
    n, c, _ = x_body.shape
    _, t = _pool_tiles(geom_in, geom_out)
    wp_in, wp_out = geom_in.Wp, geom_out.Wp
    g_blk = geom_in.tile_h // t
    n_blk = geom_in.H // t + 2 * g_blk
    itemsize = x_body.dtype.itemsize
    g = g.astype(x_body.dtype)
    len_g = (t // 2) * wp_out
    hi = geom_out.LB - len_g
    nb = _batch_block(n, c * (t * wp_in + len_g) * itemsize,
                      c * t * wp_in * itemsize,
                      0, (t // 2) * 6 * c * wp_in * 4)

    def g_index(ni, bi):
        s = (bi - g_blk) * len_g + geom_out.S
        return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))
    kernel = functools.partial(
        _mp_bwd_kernel, t=t, wp_in=wp_in, wp_out=wp_out, g_blk=g_blk,
        n_blk=n_blk, nb=nb, c=c, precision=_dot_precision(x_body.dtype))
    mt = _insert_matrix(geom_out, geom_in, x_body.dtype)
    dx = pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            pl.BlockSpec((nb, c, t * wp_in), lambda ni, bi: (ni, 0, bi)),
            pl.BlockSpec((pl.Element(nb), pl.Element(c),
                          pl.Element(len_g)), g_index),
            pl.BlockSpec((wp_out, wp_in), lambda ni, bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, c, t * wp_in),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, c, geom_in.LB), x_body.dtype),
        scratch_shapes=[pltpu.VMEM(((t // 2) * c, wp_out), x_body.dtype)],
        interpret=_use_interpret(),
    )(x_body, g, mt)
    return (dx,)


_flat_maxpool2_prim.defvjp(_flat_maxpool2_fwd, _flat_maxpool2_bwd)


def body_maxpool2(x_body: jnp.ndarray, geom_in: FlatGeom,
                  geom_out: FlatGeom) -> jnp.ndarray:
    """2x2 stride-2 SAME max pool on body-flat tensors.

    Row-pair max first, directly on the flat form: the two rows of a pool
    window are lane-contiguous Wp-chunks, so the H-reduction is one
    reshape + max with no layout change (a 6-D reshape-max was measured
    at 10/22 ms fwd/bwd per 512^2 instance vs 6/9 for this form).  Even
    shapes use a custom VJP that routes gradients with interior pads.
    """
    n, c, _ = x_body.shape
    h, w = geom_in.H, geom_in.W
    if h % 2 or w % 2:  # odd sizes: -inf-padded fallback
        x = from_body(x_body, geom_in)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2)),
                    constant_values=-jnp.inf)
        h2, w2 = x.shape[2], x.shape[3]
        p = x.reshape(n, c, h2 // 2, 2, w2 // 2, 2).max(axis=(3, 5))
        assert (p.shape[2], p.shape[3]) == (geom_out.H, geom_out.W)
        return to_body(p, geom_out)
    # pool windows never cross rows outside their pair, so spatially
    # sharded layouts (sp > 1) need no halo and use the same kernel
    if _pool_tiles(geom_in, geom_out) is not None:
        return _flat_maxpool2_prim(x_body, geom_in, geom_out)
    return _pool2_even(x_body, geom_in, geom_out)


def body_lrn(x_body: jnp.ndarray, size: int, alpha: float = 1e-4,
             beta: float = 0.75, k: float = 1.0) -> jnp.ndarray:
    """LocalResponseNorm across the channel axis (axis 1) of a body tensor."""
    from msau_tpu.models.layers import _lrn_window_matrix

    sq = jnp.square(x_body.astype(jnp.float32))
    c = x_body.shape[1]
    # one [C, C] window-matrix contraction — see local_response_norm
    win = jnp.einsum(
        "ncl,cd->ndl", sq, _lrn_window_matrix(c, size, jnp.float32)
    )
    denom = jnp.power(k + (alpha / size) * win, beta)
    return (x_body / denom.astype(x_body.dtype)).astype(x_body.dtype)


# ---------------------------------------------------------------------------
# Fused concat + 1x1 conv (the coupling/merge pattern)
# ---------------------------------------------------------------------------
#
# The MSAU coupling and up-tower merge layers are
#     y = act(Conv1x1(concat([a, b], channels)))
# (reference model/model.py:143-148, 242-252).  Materializing the 2C
# concat costs two full HBM passes the 1x1 conv immediately re-reads; the
# fused kernel reads a and b once and writes y once (3 passes vs 6), and
# its backward recomputes the preactivation in VMEM while emitting
# dxa/dxb plus revisit-accumulated dwa/dwb/db.


def _cc_fwd_kernel(a_ref, b_ref, wa_ref, wb_ref, bias_ref, m_ref, o_ref, *,
                   n_blk_g, g_blk, nb, act_name, precision):
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk_g - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        act, _ = _act_pair(act_name)
        for i in range(nb):
            z = jax.lax.dot_general(
                wa_ref[:], a_ref[i], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            z = z + jax.lax.dot_general(
                wb_ref[:], b_ref[i], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            z = z + bias_ref[:]
            if act is not None:
                z = act(z)
            o_ref[i] = (z * m_ref[:]).astype(o_ref.dtype)


def _cc_bwd_kernel(a_ref, b_ref, g_ref, wa_ref, wb_ref, bias_ref, m_ref,
                   da_ref, db_ref, dwa_ref, dwb_ref, dbias_ref, *,
                   n_blk_g, g_blk, nb, act_name, precision):
    ni = pl.program_id(0)
    bi = pl.program_id(1)

    # sequential-grid revisit accumulation (see _dw_kernel)
    @pl.when(jnp.logical_and(ni == 0, bi == 0))
    def _():
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk_g - g_blk)

    @pl.when(is_guard)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        act, dact = _act_pair(act_name)
        for i in range(nb):
            g = g_ref[i].astype(jnp.float32)
            if act is not None:
                z = jax.lax.dot_general(
                    wa_ref[:], a_ref[i], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                z = z + jax.lax.dot_general(
                    wb_ref[:], b_ref[i], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                z = z + bias_ref[:]
                g = g * dact(z)
            g = g * m_ref[:]
            gc = g.astype(a_ref.dtype)
            da_ref[i] = jax.lax.dot_general(
                wa_ref[:], gc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision).astype(da_ref.dtype)
            db_ref[i] = jax.lax.dot_general(
                wb_ref[:], gc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision).astype(db_ref.dtype)
            dwa_ref[:] += jax.lax.dot_general(
                a_ref[i], gc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            dwb_ref[:] += jax.lax.dot_general(
                b_ref[i], gc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            dbias_ref[:] += jnp.sum(g, axis=1, keepdims=True)


def _cc_specs(geom, ca, cb, cout, n, itemsize):
    tile = _sub_tile(geom, ca + cb + cout, itemsize)
    stride = tile * geom.Wp
    g_blk = geom.tile_h // tile
    n_blk = geom.H // tile + 2 * g_blk
    nb = _batch_block(n, (ca + cb) * stride * itemsize,
                      cout * stride * itemsize, 0)
    return tile, stride, g_blk, n_blk, nb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _concat_conv1x1_prim(a, b, w, bias, geom: FlatGeom, act: Optional[str],
                         out_dtype_name: str):
    n, ca, lb = a.shape
    cb = b.shape[1]
    cout = w.shape[-1]
    itemsize = a.dtype.itemsize
    tile, stride, g_blk, n_blk, nb = _cc_specs(geom, ca, cb, cout, n,
                                               itemsize)
    w2 = w.reshape(ca + cb, cout)
    wa = w2[:ca].astype(a.dtype)
    wb = w2[ca:].astype(a.dtype)
    kernel = functools.partial(
        _cc_fwd_kernel, n_blk_g=n_blk, g_blk=g_blk, nb=nb, act_name=act,
        precision=_dot_precision(a.dtype))
    blk = lambda c: pl.BlockSpec((nb, c, stride), lambda ni, bi: (ni, 0, bi))
    plan = _Plan(tile, stride, g_blk, n_blk, stride, 0, ca + cb)
    return pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            blk(ca), blk(cb),
            pl.BlockSpec((ca, cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cb, cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, stride), lambda ni, bi: (0, 0)),
        ],
        out_specs=blk(cout),
        out_shape=jax.ShapeDtypeStruct((n, cout, geom.LB),
                                       jnp.dtype(out_dtype_name)),
        interpret=_use_interpret(),
    )(a, b, wa, wb, bias.reshape(-1, 1).astype(jnp.float32),
      _col_mask(plan, geom))


def _cc_vjp_fwd(a, b, w, bias, geom, act, out_dtype_name):
    y = _concat_conv1x1_prim(a, b, w, bias, geom, act, out_dtype_name)
    return y, (a, b, w, bias)


def _cc_vjp_bwd(geom, act, out_dtype_name, res, g):
    a, b, w, bias = res
    n, ca, lb = a.shape
    cb = b.shape[1]
    cout = w.shape[-1]
    itemsize = a.dtype.itemsize
    tile, stride, g_blk, n_blk, nb = _cc_specs(geom, ca, cb, cout, n,
                                               itemsize)
    w2 = w.reshape(ca + cb, cout)
    wa = w2[:ca].astype(a.dtype)
    wb = w2[ca:].astype(a.dtype)
    g = g.astype(a.dtype)
    kernel = functools.partial(
        _cc_bwd_kernel, n_blk_g=n_blk, g_blk=g_blk, nb=nb, act_name=act,
        precision=_dot_precision(a.dtype))
    blk = lambda c: pl.BlockSpec((nb, c, stride), lambda ni, bi: (ni, 0, bi))
    plan = _Plan(tile, stride, g_blk, n_blk, stride, 0, ca + cb)
    da, db, dwa, dwb, dbias = pl.pallas_call(
        kernel,
        grid=(n // nb, n_blk),
        in_specs=[
            blk(ca), blk(cb), blk(cout),
            pl.BlockSpec((ca, cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cb, cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
            pl.BlockSpec((1, stride), lambda ni, bi: (0, 0)),
        ],
        out_specs=[
            blk(ca), blk(cb),
            pl.BlockSpec((ca, cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cb, cout), lambda ni, bi: (0, 0)),
            pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ca, geom.LB), a.dtype),
            jax.ShapeDtypeStruct((n, cb, geom.LB), b.dtype),
            jax.ShapeDtypeStruct((ca, cout), jnp.float32),
            jax.ShapeDtypeStruct((cb, cout), jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(a, b, g, wa, wb, bias.reshape(-1, 1).astype(jnp.float32),
      _col_mask(plan, geom))
    dw = jnp.concatenate([dwa, dwb], axis=0).reshape(w.shape).astype(w.dtype)
    return da, db, dw, dbias.reshape(-1)


_concat_conv1x1_prim.defvjp(_cc_vjp_fwd, _cc_vjp_bwd)


def flat_concat_conv1x1(a, b, w, bias, geom: FlatGeom,
                        act: Optional[str] = None, out_dtype=None):
    """y = act(conv1x1(concat([a, b], channel axis))) without materializing
    the concat: one fused Pallas kernel reads a and b and writes y (3 HBM
    passes instead of 6), with a matching one-pass backward.

    a: [N, Ca, LB], b: [N, Cb, LB], w: [1, 1, Ca+Cb, Cout] (flax HWIO).
    Covers the coupling / up-merge layers (reference model/model.py:
    143-148, 242-252).  Spatially sharded geometries need no halo (1x1).
    """
    assert w.shape[:2] == (1, 1) and w.shape[2] == a.shape[1] + b.shape[1]
    if act in ("none", "identity"):
        act = None
    out_dtype_name = jnp.dtype(out_dtype or a.dtype).name
    if act not in (None, "relu", "elu"):
        y = _concat_conv1x1_prim(a, b, w, bias, geom, None, out_dtype_name)
        from msau_tpu.models.layers import get_activation

        return get_activation(act)(y)
    return _concat_conv1x1_prim(a, b, w, bias, geom, act, out_dtype_name)


# ---------------------------------------------------------------------------
# Fused concat + KxK conv (the up-tower skip-merge pattern)
# ---------------------------------------------------------------------------
#
# The up tower computes  y = MergeConv3x3(concat([skip, deconv_out], C))
# (reference model/model.py:228-243).  The materialized 2C concat is two
# full HBM passes (write + re-read) that the generalized conv kernel
# eliminates: its tap stack interleaves the two inputs per row tap, which
# is exactly the channel-concat weight layout, and its dx kernel splits
# the transposed conv's output rows into the two branch cotangents
# directly (no post-hoc channel slicing).


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11)
)
def _flat_conv_cat_prim(xa, xb, w, b, geom: FlatGeom, kh: int, kw: int,
                        dilation: int, pt: int, pleft: int,
                        out_dtype_name: str, mask_cotangent: bool = True):
    dims = _ConvDims(kh, kw, dilation, pt, pleft)
    cout = w.shape[-1]
    return _conv_body(
        (xa, xb), _w_group(w, xa.dtype),
        b.reshape(-1, 1).astype(jnp.float32),
        geom, dims, cout, jnp.dtype(out_dtype_name), _use_interpret(),
    )


def _flat_conv_cat_fwd(xa, xb, w, b, geom, kh, kw, dilation, pt, pleft,
                       out_dtype_name, mask_cotangent=True):
    y = _flat_conv_cat_prim(xa, xb, w, b, geom, kh, kw, dilation, pt,
                            pleft, out_dtype_name, mask_cotangent)
    return y, (xa, xb, w)


def _flat_conv_cat_bwd(geom, kh, kw, dilation, pt, pleft, out_dtype_name,
                       mask_cotangent, res, g):
    xa, xb, w = res
    ca, cb = xa.shape[1], xb.shape[1]
    cout = w.shape[-1]
    dims = _ConvDims(kh, kw, dilation, pt, pleft)
    interp = _use_interpret()
    # the model pipeline preserves the body invariant (see _flat_conv_bwd)
    # and passes mask_cotangent=False; the default re-zeroes defensively
    if mask_cotangent:
        g = body_mask(g, geom)
    g = g.astype(xa.dtype)
    dims_t = _ConvDims(kh, kw, dilation,
                       (kh - 1) * dilation - pt,
                       (kw - 1) * dilation - pleft)
    wt = _w_transposed(w)  # [KH, KW, Cout, Ca+Cb]
    zero_b = jnp.zeros((ca + cb, 1), jnp.float32)
    dxa, dxb = _conv_body(g, _w_group(wt, g.dtype), zero_b, geom, dims_t,
                          (ca, cb), xa.dtype, interp)
    dw2 = _dw_call((xa, xb), g, geom, dims, ca + cb, cout, interp)
    dw = dw2.reshape(kh, ca + cb, kw, cout).transpose(0, 2, 1, 3).astype(
        w.dtype)
    db = jnp.sum(g, axis=(0, 2), dtype=jnp.float32)
    return dxa, dxb, dw, db


_flat_conv_cat_prim.defvjp(_flat_conv_cat_fwd, _flat_conv_cat_bwd)


def flat_concat_conv2d(a, b, w, bias, geom: FlatGeom, *, dilation: int = 1,
                       out_dtype=None, mask_cotangent: bool = True):
    """y = conv_KxK(concat([a, b], channel axis)) without materializing the
    concat (SAME padding, no activation — the up-tower merge conv shape).

    a: [N, Ca, LB], b: [N, Cb, LB], w: [KH, KW, Ca+Cb, Cout] (flax HWIO).
    The cotangents da/db come straight out of the dx kernel's split
    outputs.  Requires the body invariant on the incoming cotangent (the
    model wiring guarantees it, like flat_conv2d(mask_cotangent=False)).
    """
    kh, kw, cin, cout = w.shape
    assert cin == a.shape[1] + b.shape[1], (w.shape, a.shape, b.shape)
    if geom.sp > 1 and kh > 1:
        xe_a, geom_ext = extend_shards(a, geom)
        xe_b, _ = extend_shards(b, geom)
        ye = flat_concat_conv2d(xe_a, xe_b, w, bias, geom_ext,
                                dilation=dilation, out_dtype=out_dtype,
                                mask_cotangent=mask_cotangent)
        return shrink_shards(ye, geom)
    pt = ((kh - 1) * dilation) // 2
    pleft = ((kw - 1) * dilation) // 2
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    out_dtype_name = jnp.dtype(out_dtype or a.dtype).name
    cmax = max_flat_cin(kh, kw, geom, a.dtype.itemsize)
    if cin > cmax:
        # wide merge: fall back to the materialized concat + chunked conv
        cat = jnp.concatenate([a, b], axis=1)
        return flat_conv2d(cat, w, bias, geom, dilation=dilation,
                           out_dtype=out_dtype,
                           mask_cotangent=mask_cotangent)
    return _flat_conv_cat_prim(a, b, w, bias, geom, kh, kw, dilation,
                               int(pt), int(pleft), out_dtype_name,
                               bool(mask_cotangent))


# ---------------------------------------------------------------------------
# One-pass NHWC -> body entry conversion
# ---------------------------------------------------------------------------
#
# The model entry converts the [N, H, W, C] chargrid into body-flat form.
# As XLA ops (transpose + pad + relayout-reshape + guard pad) this costs
# 4 full HBM passes (~7.7 ms/step at the flagship shape); the Pallas
# kernel does the transpose in VMEM and writes the padded body layout
# directly — one read of x, one write of the body tensor.


def _to_body_kernel(x_ref, eye_ref, o_ref, *, tile, w, wp, c, g_blk,
                    n_blk):
    bi = pl.program_id(1)
    is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

    @pl.when(is_guard)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(is_guard))
    def _():
        v = x_ref[0].reshape(tile * w, c)  # [tile*W, C]
        # transpose on the MXU: identity contraction is exact for bf16
        # and runs at matmul speed; the VPU jnp.transpose lowering was
        # measured 3x slower than the whole conversion's stream SoL
        t = jax.lax.dot_general(
            eye_ref[:], v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v.dtype)).astype(o_ref.dtype)
        for r in range(tile):
            o_ref[0, :, r * wp: r * wp + w] = t[:, r * w: (r + 1) * w]
            o_ref[0, :, r * wp + w: (r + 1) * wp] = jnp.zeros(
                (c, wp - w), o_ref.dtype)


def _to_body_tile(geom: FlatGeom, w: int, c: int, itemsize: int = 2,
                  budget: int = 15 * 2**20) -> int:
    """Largest divisor of tile_h whose block fits the scoped-VMEM budget.

    Calibrated ~6.5 bytes per input block element per itemsize (in/out
    double buffers + f32 transpose temporaries): bf16 512^2 tile 32 C=64
    (base 1.05M -> ~12.6M scoped) compiles; f32 512^2 tile 32 measured
    26.0M (config-2 Mosaic OOM) and needs tile 16; bf16 1024^2 tile 32
    measured 25M and needs tile 16 (VERDICT r4 weak #5).  Returns 0 when
    no aligned sub-tile fits.
    """
    per_elem = 6.5 * itemsize
    for t in sorted((t for t in range(1, geom.tile_h + 1)
                     if geom.tile_h % t == 0 and (t * geom.Wp) % 128 == 0),
                    reverse=True):
        if t * w * c * per_elem <= budget:
            return t
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _to_body_nhwc_prim(x, geom: FlatGeom, out_dtype_name: str):
    n, h, w, c = x.shape
    tile = _to_body_tile(geom, w, c, x.dtype.itemsize)
    g_blk = geom.tile_h // tile
    n_blk = h // tile + 2 * g_blk
    kernel = functools.partial(_to_body_kernel, tile=tile, w=w,
                               wp=geom.Wp, c=c, g_blk=g_blk, n_blk=n_blk)

    def x_index(ni, bi):
        return (ni, jnp.clip(bi - g_blk, 0, h // tile - 1), 0, 0)

    eye = jnp.eye(c, dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n, n_blk),
        in_specs=[pl.BlockSpec((1, tile, w, c), x_index),
                  pl.BlockSpec((c, c), lambda ni, bi: (0, 0))],
        out_specs=pl.BlockSpec((1, c, tile * geom.Wp),
                               lambda ni, bi: (ni, 0, bi)),
        out_shape=jax.ShapeDtypeStruct((n, c, geom.LB),
                                       jnp.dtype(out_dtype_name)),
        interpret=_use_interpret(),
    )(x, eye)


def _to_body_nhwc_fwd(x, geom, out_dtype_name):
    return _to_body_nhwc_prim(x, geom, out_dtype_name), None


def _to_body_nhwc_bwd(geom, out_dtype_name, _res, g):
    dx = jnp.transpose(from_body(g, geom), (0, 2, 3, 1))
    return (dx.astype(jnp.dtype(out_dtype_name)),)


_to_body_nhwc_prim.defvjp(_to_body_nhwc_fwd, _to_body_nhwc_bwd)


def to_body_nhwc_fused(x: jnp.ndarray, geom: FlatGeom):
    """[N, H, W, C] -> body-flat [N, C, LB] in one Pallas pass, or None if
    the shape doesn't fit the kernel's constraints (caller falls back to
    the XLA to_body(transpose(x)) path)."""
    n, h, w, c = x.shape
    if (h, w) != (geom.H, geom.W):
        return None
    if w % 128 or geom.Wp % 128 or c % 8:
        return None  # aligned slice writes + whole-lane transpose only
    if _to_body_tile(geom, w, c, x.dtype.itemsize) == 0:
        return None  # no aligned sub-tile fits the scoped-VMEM budget
    return _to_body_nhwc_prim(x, geom, jnp.dtype(x.dtype).name)
