"""Headline benchmark: training images/sec on 512x512 chargrids.

Flagship config: full 3-block MSAU (featRoot=8, scale_space_num=4,
res_depth=2), 64 input channels, 17-class KV head — the BASELINE.md
"images/sec/chip (512² chargrid)" metric.

Baseline: the torch reference (model/model.py MSAUWrapper + entry-A train
step: forward + masked loss + backward + Adam step) measured empirically on
this host, CPU, 8 threads, bs=1 — 0.1123 img/s (no published numbers exist;
BASELINE.md).  vs_baseline = ours / reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_TRAIN_IMG_PER_S = 0.1123  # measured: /root/reference MSAUWrapper,
                                    # 512x512 bs=1 fwd+loss+bwd+Adam, CPU x8


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    try:  # reuse compiled kernels across runs (first compile is ~10 min)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    cfg = ModelConfig(
        img_channels=64,
        n_class=17,
        scale_space_num=4,
        res_depth=2,
        feat_root=8,
        num_blocks=3,
        final_act="softmax",
        # no remat: the fused-attention custom VJP removed the T x T backward
        # buffers, so bs=8 x 512^2 x 3 stages fits in 16G HBM and runs ~24%
        # faster than the remat'd step (measured: 656 vs 814 ms/step)
        remat=False,
        # bf16 activations (f32 params/loss/grads): 480 ms/step vs 656 f32;
        # convergence-validated on-chip (PERF.md)
        dtype="bfloat16",
        # channel-major flat layout on the three shallow scales (Pallas
        # convs, ops/flatconv.py): NHWC lane padding made the step
        # HBM-bound; fs=3 beat fs=2 by 8.6 ms/step once the flat upsample
        # kernel landed (round 3: 184.1 vs 192.7 ms at bs=16)
        flat_scales=3,
    )
    tcfg = TrainConfig(learning_rate=1e-4, lr_decay_staircase=False)
    if tcfg.matmul_precision and jax.default_backend() != "cpu":
        jax.config.update("jax_default_matmul_precision", tcfg.matmul_precision)

    hw = 128 if quick else 512
    bs = 2 if quick else 16
    if quick:
        # the quick path is a smoke test: skip the flat-layout Pallas
        # kernel set (its first remote AOT compile alone is ~10 min)
        import dataclasses

        cfg = dataclasses.replace(cfg, flat_scales=0)

    model = build_model(cfg)
    optimizer = make_optimizer(tcfg)
    rng = np.random.default_rng(0)
    # structured rectangle labels recoverable from the input: the benched
    # loss stays finite and decreasing, so the bench doubles as a
    # convergence canary for the custom-VJP kernels (uniform-random labels
    # drove the masked CE to nan after ~10 Adam steps; VERDICT r2 weak #4)
    from msau_tpu.data.synth import make_structured_batch

    xh, yh = make_structured_batch(rng, bs, hw, cfg.n_class, cfg.img_channels)
    # feed the batch in the model's compute dtype: the entry layer casts to
    # bf16 anyway, so a resident f32 batch just doubles the input read
    # (4.3 -> 2.15 GB at bs=16 512^2x64)
    x = jnp.asarray(xh).astype(cfg.dtype)
    y = jnp.asarray(yh)
    batch = {"input": x, "label": y, "valid": jnp.ones((bs, hw, hw), bool)}

    params = model.init(jax.random.PRNGKey(0), x[:1])
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, masked=True, donate=True)

    # warmup/compile — sync via an actual transfer (block_until_ready can
    # return early on the axon remote backend)
    state, metrics = step(state, batch)
    _ = float(metrics["loss"])
    state, metrics = step(state, batch)
    _ = float(metrics["loss"])

    # NOTE: on the axon remote backend block_until_ready can return before
    # the dispatched chain executes (under-measuring by ~400x); an actual
    # device->host transfer is the only reliable sync, so fetch a param
    # element + the loss value to close the timing region.
    iters = 3 if quick else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    _sync = (np.asarray(leaf).ravel()[0], float(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    img_per_s = bs / dt

    # p50 end-to-end serving latency — the BASELINE.md latency north star.
    # Honest end-to-end: KVModel.predict on a synthetic dense form page,
    # measuring box-program build + device paint + forward + on-device KV
    # decode + host string assembly (the reference predict includes
    # rasterization, inference/kv_model.py:264-278; VERDICT r2 weak #2).
    p50_ms = None
    if not quick:
        from msau_tpu.data.charset import Charset
        from msau_tpu.data.pages import page_from_label_dict
        from msau_tpu.data.synth import BENCH_CHARSET, make_page
        from msau_tpu.infer.kv_model import KVModel

        # Serve with a TRAINED net, the deployment scenario: a 12-step
        # net's argmax map is maze-like noise, which (a) drives the CCL
        # fixpoint toward its sweep cap and (b) marks every class active
        # on all ~700 lines, turning the reference's O(n^2) reading-order
        # scan into ~100 ms of host work.  Neither happens with converged
        # weights (fields are sparse blobs over 1-3 lines), so the p50
        # below would otherwise measure an artifact, not serving.
        # ~190 extra steps cost ~30 s of bench wall time.
        for _ in range(188):
            state, metrics = step(state, batch)
        _ = float(metrics["loss"])

        # serve through the flat layout too: the round-3 flat kernels win
        # at every batch size incl. bs=1 (512^2 fwd: flat 8.3 ms vs NHWC
        # 17.8; scripts/bench_batch_crossover.py); params are
        # layout-independent, so reuse the bench-trained state directly
        kv = KVModel(model_config=cfg)
        kv.charset = Charset(chars=" $" + BENCH_CHARSET)  # n_token = 64
        assert kv.charset.n_token == cfg.img_channels
        kv.model = build_model(kv.model_config)
        kv.params = state.params
        # 5 columns x 10 field blocks -> ~450^2 raster -> the 512^2 bucket
        page = page_from_label_dict(
            make_page(np.random.default_rng(3), n_cols=5, rows_per_col=10)
        )

        def serve():
            # serving protocol: packed tables only (return_maps=False);
            # the probability-map extras are debug output and cost ~9 MB
            # of eager tunnel streaming per request
            return kv.predict(page, return_maps=False)

        serve()  # compile
        lat = []
        stage = {"prep": [], "device": [], "strings": []}
        for _ in range(10):
            tm = {}
            t0 = time.perf_counter()
            kv.predict(page, timings=tm, return_maps=False)
            lat.append((time.perf_counter() - t0) * 1000)
            for k in stage:
                stage[k].append(tm[k])
        p50_ms = float(np.median(lat))
        # co-located protocol (VERDICT r4 #3): the tunneled 'device' stage
        # is dominated by the ~25 ms/RTT tunnel; a co-located host pays
        # the actual device-program time instead.  Record it from a
        # profiler trace of the same fused serve program.
        p50_co_ms = None
        try:
            import os as _os
            import sys as _sys

            _sys.path.insert(0, _os.path.join(
                _os.path.dirname(_os.path.abspath(__file__)), "scripts"))
            from ktime import device_ms

            def serve_traced():
                kv.predict(page, return_maps=False)  # syncs internally
                return jnp.zeros(())

            dev_ms = device_ms(serve_traced, iters=5, warmup=1)
            p50_co_ms = float(np.median(stage["prep"])
                              + dev_ms
                              + np.median(stage["strings"]))
        except Exception:
            pass

    result = {
        "metric": "train images/sec/chip (512^2 chargrid, 3-block MSAU)",
        "value": round(img_per_s, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_s / REFERENCE_TRAIN_IMG_PER_S, 2),
    }
    if p50_ms is not None:
        result["p50_e2e_serve_ms"] = round(p50_ms, 1)
        if p50_co_ms is not None:
            # co-located protocol: host prep + device-trace program time +
            # host strings (no tunnel round trips)
            result["p50_co_located_serve_ms"] = round(p50_co_ms, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
