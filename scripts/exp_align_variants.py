"""On-chip experiment: lane-ALIGNED flat-conv schemes vs the library kernel.

The 3-row-tap library kernel (flatconv._row_offsets) still pays misaligned
lane slices: its KH tap copies land at arbitrary offsets mod 128 because
Wp = W + 2P is not a multiple of 128.  With Wp % 128 == 0 the row-tap
shift (ky * Wp) is lane-aligned, so the +-1 column misalignment can be
concentrated in ONE place:

  F  row-first, aligned taps : KH *aligned* copies [Cin, cw], then the
     KW column groups of the z product are combined with shifts
     {127, 128, 129} — 1 aligned + (KW-1) misaligned f32 slice-adds.
  G  col-first, aligned adds : KW copies [Cin, cw] at offsets
     {127, 128, 129} (1 aligned, KW-1 misaligned), weights regrouped as
     [KW*Cin, KH*Cout]; the KH row groups of z are combined with shifts
     {0, Wp, 2*Wp} — ALL aligned f32 slice-adds.
  E' the library 3-row-tap kernel run on the SAME aligned geometry
     (isolates the +24% HBM traffic of Wp 516 -> 640 from the alignment
     win).
  G0 col-first with Wp = W (P = 0, no pad columns at all): the
     horizontal halo reads the neighbouring row's edge pixels, which are
     zeroed by per-kx edge masks on the tap stack (2 aligned [Cin, cw]
     multiplies).  Same alignment structure as G with ~1% LESS HBM
     traffic than the library geometry (Wp 516 -> 512).

Run solo on the chip:  python scripts/exp_align_variants.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from msau_tpu.ops.flatconv import (
        FlatGeom,
        _col_mask,
        _ConvDims,
        _plan,
        choose_geom,
        flat_conv2d,
        from_body,
        to_body,
    )

    n, cin, cout, hw = 16, 8, 8, 512
    tile = 32
    geom_a = FlatGeom(hw, hw, 64, tile)  # Wp = 640 = 5*128
    assert geom_a.Wp % 128 == 0
    geom_e = choose_geom(hw, hw)

    x = jax.random.normal(jax.random.PRNGKey(0), (n, cin, hw, hw),
                          jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.3
         ).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))

    wp = geom_a.Wp
    stride = tile * wp            # 20480
    L = stride
    g_blk = 1
    n_blk = hw // tile + 2
    start0 = -768                 # covers row -1 col -1 at window idx 127
    nb = 4                        # images per grid step

    # F geometry: xs[ky][m] = window[640*ky + m]; y[j] = sum_kx
    # z_kx[j + 127 + kx]
    cw_f = L + 130
    len_f = -(-(2 * wp + cw_f) // 128) * 128
    # G geometry: xs[kx][m] = window[127 + kx + m]; y[j] = sum_ky
    # z_ky[j + 640*ky]
    cw_g = L + 2 * wp + 1
    len_g = -(-(129 + 2 + cw_g) // 128) * 128

    def x_spec(len_in):
        hi = geom_a.LB - len_in

        def idx(ni, bi):
            s = bi * stride + start0
            return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))

        return pl.BlockSpec(
            (pl.Element(nb), pl.Element(cin), pl.Element(len_in)), idx)

    w_row = jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * cin, 3 * cout)
    w_col = jnp.transpose(w, (1, 2, 0, 3)).reshape(3 * cin, 3 * cout)

    mask = _col_mask(
        _plan(geom_a, _ConvDims(3, 3, 1, 1, 1), cin, 2, tile=tile), geom_a)

    def kernel_f(x_ref, w_ref, b_ref, m_ref, o_ref, xs_ref):
        bi = pl.program_id(1)
        is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

        @pl.when(is_guard)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(jnp.logical_not(is_guard))
        def _():
            for i in range(nb):
                for ky in range(3):
                    xs_ref[ky * cin:(ky + 1) * cin, :cw_f] = (
                        x_ref[i, :, wp * ky: wp * ky + cw_f])
                z = jax.lax.dot_general(
                    w_ref[:], xs_ref[:, :cw_f], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = z[cout:2 * cout, 128:128 + L]  # aligned center tap
                acc = acc + z[0:cout, 127:127 + L]
                acc = acc + z[2 * cout:3 * cout, 129:129 + L]
                acc = (acc + b_ref[:]) * m_ref[:]
                o_ref[i, :, :] = acc.astype(o_ref.dtype)

    def kernel_g(x_ref, w_ref, b_ref, m_ref, o_ref, xs_ref):
        bi = pl.program_id(1)
        is_guard = jnp.logical_or(bi < g_blk, bi >= n_blk - g_blk)

        @pl.when(is_guard)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(jnp.logical_not(is_guard))
        def _():
            for i in range(nb):
                for kx in range(3):
                    xs_ref[kx * cin:(kx + 1) * cin, :cw_g] = (
                        x_ref[i, :, 127 + kx: 127 + kx + cw_g])
                z = jax.lax.dot_general(
                    w_ref[:], xs_ref[:, :cw_g], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = z[0:cout, 0:L]
                acc = acc + z[cout:2 * cout, wp:wp + L]
                acc = acc + z[2 * cout:3 * cout, 2 * wp:2 * wp + L]
                acc = (acc + b_ref[:]) * m_ref[:]
                o_ref[i, :, :] = acc.astype(o_ref.dtype)

    # --- variant G0: col-first, Wp = W = 512 (P = 0), edge-masked taps
    geom_0 = FlatGeom(hw, hw, 0, tile)
    wp0 = geom_0.Wp                      # 512
    stride0 = tile * wp0                 # 16384
    L0 = stride0
    n_blk0 = hw // tile + 2
    qb0 = 127                            # 128 - pleft
    start0_0 = -(1 * wp0 + 128)          # -(pt*Wp + 128)
    cw0 = L0 + 2 * wp0 + 1
    len_0 = -(-(qb0 + 2 + cw0) // 128) * 128
    cw0_pad = -(-cw0 // 128) * 128

    col0 = np.arange(cw0_pad) % wp0
    mask_l = jnp.asarray((col0 >= 1).astype(np.float32),
                         jnp.bfloat16).reshape(1, cw0_pad)
    mask_r = jnp.asarray((col0 <= wp0 - 2).astype(np.float32),
                         jnp.bfloat16).reshape(1, cw0_pad)

    def kernel_g0(x_ref, w_ref, b_ref, ml_ref, mr_ref, o_ref, xs_ref):
        bi = pl.program_id(1)
        is_guard = jnp.logical_or(bi < 1, bi >= n_blk0 - 1)

        @pl.when(is_guard)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(jnp.logical_not(is_guard))
        def _():
            for i in range(nb):
                xs_ref[0:cin, :cw0] = (
                    x_ref[i, :, qb0:qb0 + cw0] * ml_ref[:, :cw0])
                xs_ref[cin:2 * cin, :cw0] = x_ref[i, :, qb0 + 1:
                                                  qb0 + 1 + cw0]
                xs_ref[2 * cin:3 * cin, :cw0] = (
                    x_ref[i, :, qb0 + 2:qb0 + 2 + cw0] * mr_ref[:, :cw0])
                z = jax.lax.dot_general(
                    w_ref[:], xs_ref[:, :cw0], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = z[0:cout, 0:L0]
                acc = acc + z[cout:2 * cout, wp0:wp0 + L0]
                acc = acc + z[2 * cout:3 * cout, 2 * wp0:2 * wp0 + L0]
                o_ref[i, :, :] = (acc + b_ref[:]).astype(o_ref.dtype)

    def run_g0_impl(xb):
        hi = geom_0.LB - len_0

        def idx(ni, bi):
            s = bi * stride0 + start0_0
            return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))

        return pl.pallas_call(
            kernel_g0,
            grid=(n // nb, n_blk0),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(nb), pl.Element(cin), pl.Element(len_0)),
                    idx),
                pl.BlockSpec((3 * cin, 3 * cout), lambda ni, bi: (0, 0)),
                pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
                pl.BlockSpec((1, cw0_pad), lambda ni, bi: (0, 0)),
                pl.BlockSpec((1, cw0_pad), lambda ni, bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec((nb, cout, stride0),
                                   lambda ni, bi: (ni, 0, bi)),
            out_shape=jax.ShapeDtypeStruct((n, cout, geom_0.LB),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((3 * cin, cw0_pad), jnp.bfloat16)],
        )(xb, w_col, b.reshape(-1, 1).astype(jnp.float32), mask_l, mask_r)

    def run(xb, kernel, wmat, len_in, cw):
        xs_pad = -(-cw // 128) * 128
        return pl.pallas_call(
            kernel,
            grid=(n // nb, n_blk),
            in_specs=[
                x_spec(len_in),
                pl.BlockSpec((3 * cin, 3 * cout), lambda ni, bi: (0, 0)),
                pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
                pl.BlockSpec((1, stride), lambda ni, bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec((nb, cout, stride),
                                   lambda ni, bi: (ni, 0, bi)),
            out_shape=jax.ShapeDtypeStruct((n, cout, geom_a.LB), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((3 * cin, xs_pad), jnp.bfloat16)],
        )(xb, wmat, b.reshape(-1, 1).astype(jnp.float32), mask)

    xb_a = to_body(x, geom_a)
    xb_e = to_body(x, geom_e)
    xb_0 = to_body(x, geom_0)

    run_f = jax.jit(lambda xb: run(xb, kernel_f, w_row, len_f, cw_f))
    run_g = jax.jit(lambda xb: run(xb, kernel_g, w_col, len_g, cw_g))
    run_e = jax.jit(lambda xb: flat_conv2d(xb, w, b, geom_e))
    run_ea = jax.jit(lambda xb: flat_conv2d(xb, w, b, geom_a))
    run_g0 = jax.jit(run_g0_impl)

    # correctness vs the library kernel
    ref = from_body(run_e(xb_e), geom_e)
    for name, fn, xb, g in [("F", run_f, xb_a, geom_a),
                            ("G", run_g, xb_a, geom_a),
                            ("E'", run_ea, xb_a, geom_a),
                            ("G0", run_g0, xb_0, geom_0)]:
        y = from_body(fn(xb), g)
        diff = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        print(f"{name} vs library max diff: {diff:.2e}")

    # Device-trace timing (ktime): immune to tunnel RTT — the round-3
    # chained-host numbers carried +RTT/20 ~ +1.25 ms and are obsolete.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ktime import device_ms

    for name, fn, xb in [("E  lib Wp=516  ", run_e, xb_e),
                         ("E' lib Wp=640  ", run_ea, xb_a),
                         ("F  aligned-taps", run_f, xb_a),
                         ("G  aligned-adds", run_g, xb_a),
                         ("G0 P=0 masked  ", run_g0, xb_0)]:
        t = device_ms(fn, xb, iters=20)
        print(f"{name}: {t:.3f} ms (device)")


if __name__ == "__main__":
    main()
