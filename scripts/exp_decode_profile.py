"""Attribute the on-device KV decode cost (512^2, 17 classes, dense page).

decode_fields_device is ~36 ms of the serve p50 (scripts/
bench_serve_breakdown.py).  This times its stages in isolation on a
realistic class map (the bench page painted + argmax of an untrained
forward gives background-dominated blobs like real predictions):

  closing    packed bit-plane closing + ownership map
  ccl        connected_components_multiclass at max_iters=64 (fixpoint exit)
  ccl_k      same at max_iters in {2, 4, 8} (how many sweeps converge?)
  stats      exists/y1 free-ride + 3 segment reductions [HW+1]
  topk       per-multiline-class top_k over [HW+1]
  tables     slot map + 3 (slot, line) segment ops + table math
  full       decode_fields_device end to end

Run solo on the real chip: python scripts/exp_decode_profile.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _p50(fn, iters=10):
    fn()
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        lat.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(lat))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from msau_tpu.config import ModelConfig
    from msau_tpu.data.charset import Charset
    from msau_tpu.data.pages import page_from_label_dict
    from msau_tpu.data.synth import BENCH_CHARSET, make_page
    from msau_tpu.infer.decode import decode_fields_device, pack_decode_out
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.models.msau import build_model
    from msau_tpu.ops.ccl import connected_components_multiclass
    from msau_tpu.ops.morphology import packed_closing

    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", dtype="bfloat16",
        remat=False, flat_scales=3,
    )
    kv = KVModel(model_config=cfg)
    kv.charset = Charset(chars=" $" + BENCH_CHARSET)
    kv.model = build_model(cfg)
    page = page_from_label_dict(
        make_page(np.random.default_rng(3), n_cols=5, rows_per_col=10)
    )
    x, line_id, char_id, scaled, _ = kv.rasterize(page)
    hb, wb = line_id.shape
    kv.params = kv.model.init(jax.random.PRNGKey(0), x[None])
    probs, _, _ = jax.jit(kv.model.apply)(kv.params, x[None])
    pred = probs[0]
    mlc = kv._multiline_classes()
    from msau_tpu.data.rasterize import round_up

    num_lines = round_up(max(len(scaled), 1), 128)
    n_class, k = kv.n_class, 8

    pred_class = jnp.argmax(pred, axis=-1).astype(jnp.int32)
    n_fg = int(jnp.sum(pred_class >= 2))
    print(f"grid {hb}x{wb}, {len(scaled)} lines, mlc={mlc}, "
          f"fg pixels {n_fg} ({100.0 * n_fg / (hb * wb):.1f}%)")

    @jax.jit
    def closing_only(pc):
        bits = jnp.where(
            pc >= 2,
            jnp.left_shift(jnp.int32(1), jnp.maximum(pc - 2, 0)), 0
        ).astype(jnp.int32)
        closed = packed_closing(bits, (1, 3))
        lsb = closed & -closed
        owner = jax.lax.population_count(lsb - jnp.int32(1))
        return jnp.sum(jnp.where(closed != 0, owner + 2, 0))

    @jax.jit
    def cls_map_of(pc):
        bits = jnp.where(
            pc >= 2,
            jnp.left_shift(jnp.int32(1), jnp.maximum(pc - 2, 0)), 0
        ).astype(jnp.int32)
        closed = packed_closing(bits, (1, 3))
        lsb = closed & -closed
        owner = jax.lax.population_count(lsb - jnp.int32(1))
        return jnp.where(closed != 0, owner + 2, 0).astype(jnp.int32)

    cls_map = jax.block_until_ready(cls_map_of(pred_class))

    import functools

    @functools.partial(jax.jit, static_argnames=("mi",))
    def ccl_only(cm, mi):
        return jnp.sum(connected_components_multiclass(cm, max_iters=mi))

    ms = _p50(lambda: float(closing_only(pred_class)))
    print(f"closing+owner      {ms:7.2f} ms")
    for mi in (2, 4, 8, 64):
        ms = _p50(lambda: float(ccl_only(cls_map, mi)))
        print(f"ccl max_iters={mi:<3}   {ms:7.2f} ms")

    labels = jax.block_until_ready(
        connected_components_multiclass(cls_map, max_iters=64)
    )

    @jax.jit
    def stats_only(lbl, cm):
        h, w = lbl.shape
        hw1 = h * w + 1
        lbl_flat = lbl.reshape(-1)
        iota1 = jnp.arange(1, hw1, dtype=jnp.int32)
        exists = jnp.concatenate([jnp.zeros((1,), bool), lbl_flat == iota1])
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
        y2 = jax.ops.segment_max(rows, lbl_flat, num_segments=hw1)
        x1 = jax.ops.segment_min(cols, lbl_flat, num_segments=hw1)
        x2 = jax.ops.segment_max(cols, lbl_flat, num_segments=hw1)
        return jnp.sum(y2) + jnp.sum(x1) + jnp.sum(x2) + jnp.sum(exists)

    ms = _p50(lambda: float(stats_only(labels, cls_map)))
    print(f"stats (3 segops)   {ms:7.2f} ms")

    @functools.partial(jax.jit, static_argnames=("nml",))
    def topk_only(lbl, cm, nml):
        h, w = lbl.shape
        hw1 = h * w + 1
        lbl_flat = lbl.reshape(-1)
        iota1 = jnp.arange(1, hw1, dtype=jnp.int32)
        exists = jnp.concatenate([jnp.zeros((1,), bool), lbl_flat == iota1])
        cls_of = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cm.reshape(-1)]
        )
        area = jnp.where(exists, iota1[0] + jnp.arange(hw1), 0)  # stand-in

        def one(c):
            is_alt = exists & (cls_of == c)
            vals, roots = jax.lax.top_k(jnp.where(is_alt, area, 0), 8)
            return jnp.sum(vals) + jnp.sum(roots)

        return jnp.sum(jax.vmap(one)(jnp.arange(2, 2 + nml, dtype=jnp.int32)))

    ms = _p50(lambda: float(topk_only(labels, cls_map, len(mlc) or 1)))
    print(f"topk x{len(mlc) or 1} ml classes {ms:7.2f} ms")

    @functools.partial(
        jax.jit, static_argnames=("n_class", "num_lines")
    )
    def full(pred, lid, cid, *, n_class, num_lines):
        dev = decode_fields_device(
            pred, lid, cid, mlc, n_class=n_class, num_lines=num_lines,
            k=8, min_area=5, max_iters=64,
        )
        return jnp.sum(pack_decode_out(dev))

    ms = _p50(
        lambda: float(
            full(pred, line_id, char_id, n_class=n_class, num_lines=num_lines)
        )
    )
    print(f"full decode        {ms:7.2f} ms")


if __name__ == "__main__":
    main()
