"""Serve-path layout crossover: NHWC vs flat-layout forward at bs 1..8.

Serving at bs=1 measured flat slower than NHWC (160 vs 102 ms p50 round 2)
— per-block overhead dominates at batch 1.  This measures where the
crossover sits so ``predict_batch`` can pick the layout per bucket
(VERDICT r2 weak #7 / next-step #8).

Run on the real chip:  python scripts/bench_batch_crossover.py [--quick]
Prints one ms-per-forward table row per (layout, bs).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    quick = "--quick" in sys.argv
    import dataclasses

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model

    hw = 128 if quick else 512
    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", dtype="bfloat16",
        remat=False,
    )
    rng = np.random.default_rng(0)
    params = None
    rows = []
    for flat in (0, 2):
        model = build_model(dataclasses.replace(cfg, flat_scales=flat))
        if params is None:  # identical trees across layouts
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 64), jnp.float32)
            )
        fwd = jax.jit(lambda p, v, m=model: jnp.sum(m.apply(p, v)[0]))
        for bs in (1, 2, 4, 8):
            x = jnp.asarray(rng.random((bs, hw, hw, 64)), jnp.float32)
            out = fwd(params, x)
            _ = float(out)  # compile + sync
            iters = 3 if quick else 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(params, x)
            _ = float(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            rows.append((flat, bs, ms))
            print(f"flat_scales={flat} bs={bs}: {ms:8.2f} ms "
                  f"({ms / bs:6.2f} ms/img)")
    # crossover summary
    by = {(f, b): ms for f, b, ms in rows}
    for bs in (1, 2, 4, 8):
        better = "flat" if by[(2, bs)] < by[(0, bs)] else "nhwc"
        print(f"bs={bs}: nhwc {by[(0, bs)]:.1f} vs flat {by[(2, bs)]:.1f} -> {better}")


if __name__ == "__main__":
    main()
