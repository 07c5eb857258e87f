"""Lane-packed (N*C-on-lanes) conv experiment — the layout past the im2col
MXU-utilization floor (PERF.md "Flat-conv kernel attribution").

The flat W-on-lane kernels are MXU-utilization-bound: any im2col
factorization of a 3x3 C=8 conv contracts K*K*Cin=72 of 128 lanes and
emits Cout=8 of 128 rows (~3.5% MXU util), so ~1.3-1.6 ms is the floor
for a 512^2 8->8 bf16 conv.  This experiment packs (image, channel) on
the LANE axis instead:

    x_pack : [G + H*W + G, N*Cin]   (N*Cin == 128 lanes, G = W+8 zero
                                     guard rows top and bottom)

Pixel (h, w) of image n, channel c sits at sublane row G + h*W + w,
lane n*Cin + c.  A 3x3 tap (ky, kx) is then a STATIC sublane shift by
(ky-1)*W + (kx-1), and the conv is 9 accumulated [TW, 128] x [128, 128]
matmuls against per-tap block-diagonal weights

    W_tap[n*Cin + ci, n*Cout + co] = w[ky, kx, ci, co]

FLOPs inflate by N (the off-diagonal blocks are zero) but the MXU runs
at ~100% utilization, a projected ~3.4x over the im2col floor at C=8.
Horizontal edge columns are fixed by masking the kx=0/kx=2 taps with a
(j % W) sublane mask.

Measures (chained 20x inside one jit, best of 5):
  - library flat_conv2d (the current production kernel)
  - NC-packed kernel
  - the NCHW <-> packed transpose cost (paid once per tower boundary)
and checks numerics against lax.conv_general_dilated.

Run solo on the chip:  python scripts/exp_ncpack.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, CIN, COUT, HW = 16, 8, 8, 512
TH = 4  # output rows per grid step


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from msau_tpu.ops.flatconv import choose_geom, to_body, flat_conv2d

    W = HW
    G = W + 8
    TW = TH * W
    n_blk = HW // TH
    win = (TH + 2) * W + 16  # tap offsets span [-1, 2W+1] around 8+j

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, CIN, HW, HW), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT)) * 0.3
         ).astype(jnp.bfloat16)
    b = jnp.zeros((COUT,), jnp.float32)

    # ---- packed operands -------------------------------------------------
    def pack(x_nchw):
        # [N, C, H, W] -> [G + H*W + G, N*C]
        t = jnp.transpose(x_nchw, (2, 3, 0, 1)).reshape(HW * W, N * CIN)
        return jnp.pad(t, ((G, G), (0, 0)))

    def unpack(xp):
        if xp.shape[0] != HW * W:  # guarded form
            xp = xp[G: G + HW * W]
        t = xp.reshape(HW, W, N, COUT)
        return jnp.transpose(t, (2, 3, 0, 1))

    # per-tap block-diagonal weights [9, 128, 128] -> [9*128, 128]
    eye = np.zeros((N * CIN, N, CIN), np.float32)
    for i in range(N):
        eye[i * CIN: (i + 1) * CIN, i] = np.eye(CIN)
    eyej = jnp.asarray(eye)  # [128, N, CIN]
    # tap-major axes [lane, tap, image, cout] so the reshape's trailing
    # (image, cout) pair flattens to the intended n*Cout column index
    wt = jnp.einsum("lnc,kco->lkno", eyej,
                    w.reshape(9, CIN, COUT).astype(jnp.float32))
    w_pack = wt.reshape(N * CIN, 9, N * COUT).transpose(1, 0, 2).reshape(
        9 * N * CIN, N * COUT).astype(jnp.bfloat16)

    col = np.arange(TW) % W
    mask_l = jnp.asarray((col >= 1).astype(np.float32), jnp.bfloat16
                         ).reshape(TW, 1)
    mask_r = jnp.asarray((col <= W - 2).astype(np.float32), jnp.bfloat16
                         ).reshape(TW, 1)

    def kernel(x_ref, w_ref, ml_ref, mr_ref, o_ref):
        acc = jnp.zeros((TW, N * COUT), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = 8 + ky * W + (kx - 1)
                xs = x_ref[off: off + TW, :]
                if kx == 0:
                    xs = xs * ml_ref[:]
                elif kx == 2:
                    xs = xs * mr_ref[:]
                t = 3 * ky + kx
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[t * 128: (t + 1) * 128, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        o_ref[:] = acc.astype(o_ref.dtype)

    def conv_pack(xp):
        return pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((pl.Element(win), pl.Element(128)),
                             lambda bi: (bi * TW, 0)),
                pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                pl.BlockSpec((TW, 1), lambda bi: (0, 0)),
                pl.BlockSpec((TW, 1), lambda bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TW, 128), lambda bi: (bi, 0)),
            out_shape=jax.ShapeDtypeStruct((HW * W, 128), jnp.bfloat16),
        )(xp, w_pack, mask_l, mask_r)

    # chained versions: output feeds next input (re-guard via pad)
    @jax.jit
    def chain_pack(xp):
        y = xp
        for _ in range(20):
            o = conv_pack(y)
            y = jnp.pad(o, ((G, G), (0, 0)))
        return o

    geom = choose_geom(HW, HW)
    xb = to_body(x, geom)

    @jax.jit
    def chain_flat(xb):
        y = xb
        for _ in range(20):
            y = flat_conv2d(y, w, b, geom)
        return y

    @jax.jit
    def pack_roundtrip(x_nchw):
        return unpack(pack(x_nchw))

    # ---- numerics --------------------------------------------------------
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.transpose(w, (3, 2, 0, 1)).astype(
            jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    got = unpack(conv_pack(pack(x))).astype(jnp.float32)
    err = jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))
    print(f"numerics: rel err {float(err):.2e} (bf16 expect <2e-2)")
    assert float(err) < 2e-2, "NC-packed kernel numerics broken; refusing to time"

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            f(*args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    xp = pack(x)
    t_pack = timeit(chain_pack, xp) / 20 * 1e3
    t_flat = timeit(chain_flat, xb) / 20 * 1e3
    t_rt = timeit(pack_roundtrip, x) * 1e3
    print(f"library flat conv : {t_flat:8.3f} ms")
    print(f"NC-packed conv    : {t_pack:8.3f} ms   ({t_flat / t_pack:.2f}x)")
    print(f"pack+unpack round trip (layout boundary): {t_rt:.3f} ms")


if __name__ == "__main__":
    main()
