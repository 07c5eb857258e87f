"""Re-measure the fundamental laws with DEVICE-trace timing (ktime.py),
after host-side timing proved untrustworthy through the tunnel:

  1. HBM stream law: y+1 at several widths/dtypes (one dispatch per iter,
     so XLA can't fuse across iters).
  2. MXU width law: y = y @ W for [M,NW]x[NW,NW], bytes constant.
  3. The real lane-packed-conv vs library-flat-conv comparison.

Run solo on the chip:  python scripts/exp_devlaw.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ktime import device_ms


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    key = jax.random.PRNGKey(0)
    total = 1 << 25

    print("== HBM stream law (y+1, one kernel per iter) ==")
    add1 = jax.jit(lambda x: x + 1.0)
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        for lanes in (128, 512, 4096):
            rows = total // lanes
            x = jax.random.normal(key, (rows, lanes), dtype)
            t = device_ms(add1, x, iters=20)
            gb = rows * lanes * x.dtype.itemsize * 2 / 1e9
            print(f"  {name} [{rows:7d},{lanes:5d}]  {t:7.3f} ms  "
                  f"{gb / (t / 1e3):7.1f} GB/s")

    print("== MXU width law (y=y@W, bytes constant) ==")
    for NW in (128, 256, 512, 1024, 2048):
        M = total // NW
        x = jax.random.normal(key, (M, NW), jnp.bfloat16)
        w = jax.random.normal(key, (NW, NW), jnp.bfloat16) * 0.1
        mm = jax.jit(lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        t = device_ms(mm, x, w, iters=20)
        fl = M * NW * NW * 2 / (t / 1e3) / 1e12
        gb = (M * NW * 2 * 2 + NW * NW * 2) / 1e9
        print(f"  [{M:7d},{NW:5d}]x[{NW:5d},{NW:5d}]  {t:7.3f} ms  "
              f"{fl:6.1f} TFLOP/s  {gb / (t / 1e3):7.1f} GB/s")

    print("== conv kernels, device time ==")
    N, CIN, COUT, HW = 16, 8, 8, 512
    W = HW
    L = N * CIN
    x = jax.random.normal(key, (N, CIN, HW, HW), jnp.bfloat16)
    w3 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT)) * 0.3
          ).astype(jnp.bfloat16)
    b0 = jnp.zeros((COUT,), jnp.float32)

    from msau_tpu.ops.flatconv import choose_geom, to_body, flat_conv2d
    geom = choose_geom(HW, HW)
    xb = to_body(x, geom)
    fc = jax.jit(lambda xb: flat_conv2d(xb, w3, b0, geom))
    t = device_ms(fc, xb, iters=20)
    print(f"  library flat_conv2d       {t:7.3f} ms")

    # guard-column NC-packed, 9-dot (variant B from exp_ncpack2)
    Wp = W + 2
    TH = 4
    TW = TH * Wp
    G2 = -(-(Wp + 9) // 8) * 8
    n_blk = HW // TH
    win = -(-((TH + 2) * Wp + 16) // 8) * 8
    rows = HW * Wp

    eye = np.zeros((L, N, CIN), np.float32)
    for i in range(N):
        eye[i * CIN: (i + 1) * CIN, i] = np.eye(CIN)
    wt = jnp.einsum("lnc,kco->lkno", jnp.asarray(eye),
                    w3.reshape(9, CIN, COUT).astype(jnp.float32))
    w_pack = wt.reshape(L, 9, N * COUT).transpose(1, 0, 2).reshape(
        9 * L, N * COUT).astype(jnp.bfloat16)

    colm = np.arange(TW) % Wp
    omask = jnp.asarray((colm >= 1) & (colm <= W), jnp.bfloat16
                        ).reshape(TW, 1)

    def kernel_b(x_ref, w_ref, om_ref, o_ref):
        acc = jnp.zeros((TW, L), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = G2 - Wp - 1 + ky * Wp + kx
                t = 3 * ky + kx
                acc = acc + jax.lax.dot_general(
                    x_ref[off: off + TW, :],
                    w_ref[t * 128: (t + 1) * 128, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype) * om_ref[:]

    def conv_b(xp):
        return pl.pallas_call(
            kernel_b,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((pl.Element(win), pl.Element(L)),
                             lambda bi: (bi * TW, 0)),
                pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                pl.BlockSpec((TW, 1), lambda bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TW, L), lambda bi: (bi, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, L), jnp.bfloat16),
        )(jnp.pad(xp, ((G2, G2), (0, 0))), w_pack, omask)

    t = jnp.transpose(x, (2, 3, 0, 1)).reshape(HW, W, L)
    xg = jnp.pad(t, ((0, 0), (1, 1), (0, 0))).reshape(rows, L)
    cb = jax.jit(conv_b)
    tms = device_ms(cb, xg, iters=20)
    print(f"  NC-pack guardcol 9-dot    {tms:7.3f} ms")

    # XLA convs for scale
    conv_xla = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, jnp.transpose(w3, (3, 2, 0, 1)), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t = device_ms(conv_xla, x, iters=20)
    print(f"  XLA NCHW conv             {t:7.3f} ms")

    xh = jnp.transpose(x, (0, 2, 3, 1))
    conv_nhwc = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, jnp.transpose(w3, (0, 1, 2, 3)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t = device_ms(conv_nhwc, xh, iters=20)
    print(f"  XLA NHWC conv             {t:7.3f} ms")


if __name__ == "__main__":
    main()
