"""On-chip KV-decode breakdown: where do the decode milliseconds go?

Times the full ``decode_fields_device`` plus its stages in isolation
(closing, multiclass CCL, component stats, selection/segment reductions)
on a realistic class map — rectangles burned like a trained net's output,
not uniform noise (speckle maps exaggerate CCL sweep counts).

Run on the real chip:  python scripts/bench_decode.py [--quick]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def realistic_pred(rng, hw, n_class, n_fields=40):
    """Class map resembling a trained model's output on a dense form:
    rectangular field blobs over background, a few ragged edges."""
    pred = np.zeros((hw, hw, n_class), np.float32)
    pred[..., 0] = 0.9
    for _ in range(n_fields):
        c = int(rng.integers(2, n_class))
        fh = int(rng.integers(8, 20))
        fw = int(rng.integers(30, 140))
        y = int(rng.integers(0, hw - fh))
        x = int(rng.integers(0, hw - fw))
        pred[y:y + fh, x:x + fw, :] = 0.0
        pred[y:y + fh, x:x + fw, c] = 1.0
        # ragged edge: drop a few pixels
        for _ in range(6):
            yy = int(rng.integers(y, y + fh))
            xx = int(rng.integers(x, x + fw))
            pred[yy, xx, c] = 0.0
            pred[yy, xx, 0] = 0.9
    return pred


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from msau_tpu.infer.decode import decode_fields_device
    from msau_tpu.ops.ccl import (
        component_stats,
        connected_components_multiclass,
    )
    from msau_tpu.ops.morphology import r_closing

    hw = 256 if quick else 512
    n_class = 17
    rng = np.random.default_rng(0)
    pred = jnp.asarray(realistic_pred(rng, hw, n_class))
    line_id = jnp.asarray(rng.integers(0, 100, (hw, hw)), jnp.int32)
    char_id = jnp.asarray(rng.integers(0, 30, (hw, hw)), jnp.int32)

    def timeit(name, fn, sync, iters=10):
        fn()  # compile
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:36s} {ms:8.2f} ms")
        return ms

    def sync_dict(out):
        np.asarray(next(iter(out.values())))

    def sync_arr(out):
        np.asarray(out)

    # full decode
    timeit(
        "decode_fields_device (full)",
        lambda: decode_fields_device(
            pred, line_id, char_id, (5, 11), n_class=n_class,
            num_lines=128, k=8, min_area=5, max_iters=64,
        ),
        sync_dict,
    )

    # stages
    pred_class = jnp.argmax(pred, axis=-1).astype(jnp.int32)

    @jax.jit
    def closing_stage(pc):
        closed = jax.vmap(lambda c: r_closing(pc == c, (1, 3)))(
            jnp.arange(2, n_class, dtype=jnp.int32))
        any_fg = jnp.any(closed, axis=0)
        owner = jnp.argmax(closed, axis=0).astype(jnp.int32)
        return jnp.where(any_fg, owner + 2, 0)

    cls_map = closing_stage(pred_class)
    timeit("argmax+closing+ownership", lambda: closing_stage(pred_class),
           sync_arr)

    @jax.jit
    def ccl_stage(cm):
        return connected_components_multiclass(cm, max_iters=64)

    labels = ccl_stage(cls_map)
    timeit("multiclass CCL", lambda: ccl_stage(cls_map), sync_arr)

    @jax.jit
    def stats_stage(lb):
        return component_stats(lb)

    timeit("component_stats", lambda: stats_stage(labels), sync_dict)

    # iteration count of the CCL at this input
    import jax.lax as lax
    from msau_tpu.ops.ccl import _sweep_multiclass

    @jax.jit
    def ccl_iters(cm):
        h, w = cm.shape
        fg = cm > 0
        idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
               + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
        labels0 = jnp.where(fg, idx, 0)

        def cond(s):
            return s[1] & (s[2] < 64)

        def body(s):
            new = _sweep_multiclass(s[0], cm)
            return new, jnp.any(new != s[0]), s[2] + 1

        _, _, it = lax.while_loop(cond, body, (labels0, jnp.asarray(True), 0))
        return it

    print(f"CCL iterations to fixpoint: {int(ccl_iters(cls_map))}")


if __name__ == "__main__":
    main()
