"""Serve-path p50 breakdown: host prep / paint / forward / decode / fetch.

The honest end-to-end predict p50 (VERDICT r2 #3) is one fused device
program plus host work on both ends.  This attributes the wall time:

  host_prep   build_chargrid_programs + padding (pure host)
  paint       3x paint_boxes + one_hot           (device, synced)
  +forward    paint + model.apply                (device, synced)
  +decode     paint + forward + decode + pack    (device, synced)
  fetch       np.asarray(packed) round trip      (the serve fetch)
  strings     unpack + extract_values            (pure host)
  predict     KVModel.predict end-to-end         (the honest p50)

Each device variant returns a tiny scalar so timing excludes the big
fetch; sync is an actual device->host transfer (axon: block_until_ready
can return early).

Run on the real chip:  python scripts/bench_serve_breakdown.py [--flat N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _p50(fn, iters=10):
    fn()  # warm / compile
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        lat.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(lat))


def main():
    flat = 3
    if "--flat" in sys.argv:
        flat = int(sys.argv[sys.argv.index("--flat") + 1])
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.config import ModelConfig
    from msau_tpu.data.charset import Charset
    from msau_tpu.data.pages import page_from_label_dict
    from msau_tpu.data.synth import BENCH_CHARSET, make_page
    from msau_tpu.infer.decode import decode_fields_device, pack_decode_out
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.data.rasterize import paint_boxes_fast as paint_boxes
    from msau_tpu.data.rasterize import round_up
    from msau_tpu.models.msau import build_model

    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", dtype="bfloat16",
        remat=False, flat_scales=flat,
    )
    kv = KVModel(model_config=cfg)
    kv.charset = Charset(chars=" $" + BENCH_CHARSET)
    kv.model = build_model(cfg)
    page = page_from_label_dict(
        make_page(np.random.default_rng(3), n_cols=5, rows_per_col=10)
    )
    progs, scaled, arrays, hb, wb = kv._prepare_host(page)
    x0 = jnp.zeros((1, hb, wb, 64), jnp.float32)
    kv.params = kv.model.init(jax.random.PRNGKey(0), x0)
    num_lines = round_up(max(len(scaled), 1), 128)
    dev_arrays = tuple(jnp.asarray(a) for a in arrays)
    model = kv.model
    n_token = kv.charset.n_token
    mlc = kv._multiline_classes()

    print(f"page raster {progs.height}x{progs.width} -> bucket {hb}x{wb}, "
          f"{len(scaled)} lines, flat_scales={flat}")

    # --- host prep
    ms = _p50(lambda: kv._prepare_host(page))
    print(f"host_prep          {ms:7.2f} ms")

    # --- device stages (scalar-returning variants)
    import functools

    @functools.partial(jax.jit, static_argnames=("hb", "wb"))
    def paint_only(cb, cv, lb, lv, db, dv, *, hb, wb):
        ids = paint_boxes(cb, cv, hb, wb)
        line_id = paint_boxes(lb, lv, hb, wb)
        char_id = paint_boxes(db, dv, hb, wb)
        xx = jax.nn.one_hot(ids, n_token, dtype=jnp.float32)
        return jnp.sum(xx) + jnp.sum(line_id) + jnp.sum(char_id)

    @functools.partial(jax.jit, static_argnames=("hb", "wb"))
    def paint_fwd(params, cb, cv, lb, lv, db, dv, *, hb, wb):
        ids = paint_boxes(cb, cv, hb, wb)
        xx = jax.nn.one_hot(ids, n_token, dtype=jnp.float32)
        probs, _, _ = model.apply(params, xx[None])
        return jnp.sum(probs)

    @functools.partial(jax.jit, static_argnames=("hb", "wb", "num_lines"))
    def paint_fwd_dec(params, cb, cv, lb, lv, db, dv, *, hb, wb, num_lines):
        ids = paint_boxes(cb, cv, hb, wb)
        line_id = paint_boxes(lb, lv, hb, wb)
        char_id = paint_boxes(db, dv, hb, wb)
        xx = jax.nn.one_hot(ids, n_token, dtype=jnp.float32)
        probs, _, _ = model.apply(params, xx[None])
        dev = decode_fields_device(
            probs[0], line_id, char_id, mlc, n_class=kv.n_class,
            num_lines=num_lines, k=8, min_area=kv.cfg.min_component_area,
            max_iters=kv.cfg.max_ccl_iters,
        )
        return jnp.sum(pack_decode_out(dev))

    ms_paint = _p50(lambda: float(paint_only(*dev_arrays, hb=hb, wb=wb)))
    print(f"paint+onehot       {ms_paint:7.2f} ms")
    ms_fwd = _p50(
        lambda: float(paint_fwd(kv.params, *dev_arrays, hb=hb, wb=wb))
    )
    print(f"+forward           {ms_fwd:7.2f} ms   (forward ~{ms_fwd - ms_paint:.2f})")
    ms_dec = _p50(
        lambda: float(
            paint_fwd_dec(kv.params, *dev_arrays, hb=hb, wb=wb, num_lines=num_lines)
        )
    )
    print(f"+decode            {ms_dec:7.2f} ms   (decode ~{ms_dec - ms_fwd:.2f})")

    # --- the real fused program incl. the packed upload + fetch
    serve = kv._serve_fn()
    cap, lcap = arrays[1].shape[0], arrays[3].shape[0]
    host_buf = np.concatenate([np.asarray(a).ravel() for a in arrays])

    def fused():
        packed, _, _ = serve(
            kv.params, jnp.asarray(host_buf), hb=hb, wb=wb,
            num_lines=num_lines, cap=cap, lcap=lcap,
        )
        return np.asarray(packed)

    ms_fused = _p50(fused)
    print(f"fused+packed fetch {ms_fused:7.2f} ms   (fetch/overhead ~{ms_fused - ms_dec:.2f})")

    # --- end-to-end predict
    ms_pred = _p50(lambda: kv.predict(page))
    print(f"predict e2e        {ms_pred:7.2f} ms   (strings/glue ~{ms_pred - ms_fused - ms:.2f})")


if __name__ == "__main__":
    main()
