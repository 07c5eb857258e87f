"""Lane-packed conv, round 2: attribute the 1.77 ms (exp_ncpack.py came in
at 0.89x the library kernel vs the 3.4x MXU-utilization projection).

Variants (all numerics-checked against lax.conv_general_dilated):
  A  baseline from exp_ncpack.py: W-packed rows, 6 masked taps, 9 acc dots
  B  guard-COLUMN layout (row stride W+2, zero cols between rows): no tap
     masks at all, one output mask; 9 accumulated dots
  C  B but im2col-on-lanes: 9 shifted copies into a [TW, 9*128] buffer,
     ONE dot with K=1152 (tap accumulation happens inside the MXU, kills
     the 8 f32 [TW,128] VPU adds)
  D  C with TH=8 (half the grid steps)
  E  dot-only floor: like B but every tap reads the same aligned window
     (no shifted copies) — MXU + HBM floor
  F  copy-only floor: like B but dots replaced by a cheap cast-add —
     VPU/copy floor

Run solo on the chip:  python scripts/exp_ncpack2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, CIN, COUT, HW = 16, 8, 8, 512


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    W = HW
    L = N * CIN  # 128 lanes

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, CIN, HW, HW), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT)) * 0.3
         ).astype(jnp.bfloat16)

    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.transpose(w, (3, 2, 0, 1)).astype(
            jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    refmax = float(jnp.max(jnp.abs(ref)))

    # block-diagonal per-tap weights, tap-major: [9*128, 128]
    eye = np.zeros((L, N, CIN), np.float32)
    for i in range(N):
        eye[i * CIN: (i + 1) * CIN, i] = np.eye(CIN)
    wt = jnp.einsum("lnc,kco->lkno", jnp.asarray(eye),
                    w.reshape(9, CIN, COUT).astype(jnp.float32))
    w_pack = wt.reshape(L, 9, N * COUT).transpose(1, 0, 2).reshape(
        9 * L, N * COUT).astype(jnp.bfloat16)

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    # ---- A: baseline W-packed masked kernel ------------------------------
    def run_A(TH):
        G = W + 8
        TW = TH * W
        n_blk = HW // TH
        win = (TH + 2) * W + 16

        def pack(x_nchw):
            t = jnp.transpose(x_nchw, (2, 3, 0, 1)).reshape(HW * W, L)
            return jnp.pad(t, ((G, G), (0, 0)))

        def unpack(xp):
            t = xp.reshape(HW, W, N, COUT)
            return jnp.transpose(t, (2, 3, 0, 1))

        col = np.arange(TW) % W
        mask_l = jnp.asarray((col >= 1), jnp.bfloat16).reshape(TW, 1)
        mask_r = jnp.asarray((col <= W - 2), jnp.bfloat16).reshape(TW, 1)

        def kernel(x_ref, w_ref, ml_ref, mr_ref, o_ref):
            acc = jnp.zeros((TW, L), jnp.float32)
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
                        preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype)

        def conv(xp):
            return pl.pallas_call(
                kernel,
                grid=(n_blk,),
                in_specs=[
                    pl.BlockSpec((pl.Element(win), pl.Element(L)),
                                 lambda bi: (bi * TW, 0)),
                    pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                    pl.BlockSpec((TW, 1), lambda bi: (0, 0)),
                    pl.BlockSpec((TW, 1), lambda bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TW, L), lambda bi: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((HW * W, L), jnp.bfloat16),
            )(xp, w_pack, mask_l, mask_r)

        @jax.jit
        def chain(xp):
            y = xp
            for _ in range(20):
                o = conv(y)
                y = jnp.pad(o, ((G, G), (0, 0)))
            return o

        got = unpack(conv(pack(x))).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref))) / refmax
        assert err < 2e-2, f"A numerics {err}"
        return timeit(chain, pack(x)) / 20 * 1e3

    # ---- guard-column layout helpers -------------------------------------
    Wp = W + 2

    def packg(x_nchw):
        # [N,C,H,W] -> [G2 + H*Wp + G2, L], zero col before/after each row
        t = jnp.transpose(x_nchw, (2, 3, 0, 1)).reshape(HW, W, L)
        t = jnp.pad(t, ((0, 0), (1, 1), (0, 0))).reshape(HW * Wp, L)
        return t

    def unpackg(y):
        t = y.reshape(HW, Wp, N, COUT)[:, 1:-1]
        return jnp.transpose(t, (2, 3, 0, 1))

    def make_g(TH, variant):
        TW = TH * Wp
        G2 = -(-(Wp + 9) // 8) * 8  # aligned guard >= Wp+1 rows
        n_blk = HW // TH
        win = -(-((TH + 2) * Wp + 16) // 8) * 8

        colm = np.arange(TW) % Wp
        omask = jnp.asarray((colm >= 1) & (colm <= W), jnp.bfloat16
                            ).reshape(TW, 1)

        def kernel_b(x_ref, w_ref, om_ref, o_ref):
            acc = jnp.zeros((TW, L), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    off = G2 - Wp - 1 + ky * Wp + kx
                    if variant == "E":
                        off = G2  # same aligned window for every tap
                    t = 3 * ky + kx
                    acc = acc + jax.lax.dot_general(
                        x_ref[off: off + TW, :],
                        w_ref[t * 128: (t + 1) * 128, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype) * om_ref[:]

        def kernel_f(x_ref, w_ref, om_ref, o_ref):
            acc = jnp.zeros((TW, L), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    off = G2 - Wp - 1 + ky * Wp + kx
                    acc = acc + x_ref[off: off + TW, :].astype(jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype) * om_ref[:]

        def kernel_c(x_ref, w_ref, om_ref, o_ref, col_ref):
            for ky in range(3):
                for kx in range(3):
                    off = G2 - Wp - 1 + ky * Wp + kx
                    t = 3 * ky + kx
                    col_ref[:, t * 128:(t + 1) * 128] = \
                        x_ref[off: off + TW, :]
            acc = jax.lax.dot_general(
                col_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype) * om_ref[:]

        kern = {"B": kernel_b, "C": kernel_c, "C2": kernel_c,
                "B8": kernel_b, "E": kernel_b, "F": kernel_f}[variant]
        scratch = ([pl.BlockSpec(memory_space=pl.ANY)] if False else None)

        def conv(xp):
            return pl.pallas_call(
                kern,
                grid=(n_blk,),
                in_specs=[
                    pl.BlockSpec((pl.Element(win), pl.Element(L)),
                                 lambda bi: (bi * TW, 0)),
                    pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                    pl.BlockSpec((TW, 1), lambda bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TW, L), lambda bi: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((HW * Wp, L), jnp.bfloat16),
                scratch_shapes=(
                    [pltpu.VMEM((TW, 9 * 128), jnp.bfloat16)]
                    if variant in ("C", "C2") else []),
            )(jnp.pad(xp, ((G2, G2), (0, 0))), w_pack, omask)

        @jax.jit
        def chain(xp):
            y = xp
            for _ in range(20):
                y = conv(y)[: HW * Wp]
            return y

        return conv, chain

    print("variant                         ms/conv")
    t = run_A(4)
    results["A  masked W-pack TH=4"] = t

    for name, variant, TH in [("B  guardcol 9-dot TH=4", "B", 4),
                              ("B8 guardcol 9-dot TH=8", "B8", 8),
                              ("C  guardcol im2col TH=4", "C", 4),
                              ("E  dot-floor (no shifts)", "E", 4),
                              ("F  copy-floor (no dots)", "F", 4)]:
        conv, chain = make_g(TH, variant)
        if variant in ("B", "B8", "C", "C2"):
            got = unpackg(conv(packg(x))).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(got - ref))) / refmax
            assert err < 2e-2, f"{variant} numerics {err}"
        t = timeit(chain, packg(x)) / 20 * 1e3
        results[name] = t

    from msau_tpu.ops.flatconv import choose_geom, to_body, flat_conv2d
    geom = choose_geom(HW, HW)
    xb = to_body(x, geom)
    b0 = jnp.zeros((COUT,), jnp.float32)

    @jax.jit
    def chain_flat(xb):
        y = xb
        for _ in range(20):
            y = flat_conv2d(y, w, b0, geom)
        return y

    results["lib flat_conv2d"] = timeit(chain_flat, xb) / 20 * 1e3

    for k, v in results.items():
        print(f"{k:32s} {v:8.3f}")


if __name__ == "__main__":
    main()
