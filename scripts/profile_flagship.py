"""Flagship train-step profile + XLA cost analysis (VERDICT r3 #2).

Prints:
  * measured ms/step and img/s at the bench config (bs=16, 512^2, bf16,
    flat_scales=2);
  * XLA cost analysis (FLOPs/step, bytes accessed/step) -> achieved
    TFLOP/s and fraction of HBM speed-of-light;
  * a device-op time table from a jax.profiler trace (top ops by self
    time), so the remaining glue is named, not guessed.

Run on the real chip:  python scripts/profile_flagship.py [--trace]
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data.synth import make_structured_batch
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    bs, hw = 16, 512
    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", remat=False,
        dtype="bfloat16",
        flat_scales=(2 if "--fs2" in sys.argv else 3),
    )
    model = build_model(cfg)
    optimizer = make_optimizer(TrainConfig(learning_rate=1e-4,
                                           lr_decay_staircase=False))
    rng = np.random.default_rng(0)
    xh, yh = make_structured_batch(rng, bs, hw, cfg.n_class, cfg.img_channels)
    batch = {"input": jnp.asarray(xh).astype(jnp.bfloat16),
             "label": jnp.asarray(yh),
             "valid": jnp.ones((bs, hw, hw), bool)}
    params = model.init(jax.random.PRNGKey(0), batch["input"][:1])
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, masked=True, donate=True)

    # cost analysis on the compiled step
    lowered = jax.jit(
        make_train_step(model, optimizer, masked=True, donate=False)
    ).lower(state, batch)
    compiled = lowered.compile()
    if "--hlo" in sys.argv:
        with open("/tmp/flagship_hlo.txt", "w") as f:
            f.write(compiled.as_text())
        print("HLO dumped to /tmp/flagship_hlo.txt")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        print(f"XLA cost analysis: {flops/1e12:.2f} TFLOP/step, "
              f"{bytes_/2**30:.1f} GiB accessed/step")
    except Exception as e:
        flops = bytes_ = float("nan")
        print("cost_analysis unavailable:", e)

    # timed steps
    state, m = step(state, batch)
    _ = float(m["loss"])
    state, m = step(state, batch)
    _ = float(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    _sync = (np.asarray(leaf).ravel()[0], float(m["loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(f"step: {dt*1e3:.1f} ms, {bs/dt:.1f} img/s")
    if np.isfinite(flops):
        print(f"achieved {flops/dt/1e12:.2f} TFLOP/s "
              f"({flops/dt/1e12/197*100:.1f}% of v5e bf16 peak)")
    if np.isfinite(bytes_):
        sol = bytes_ / 819e9  # v5e HBM ~819 GB/s
        print(f"HBM speed-of-light: {sol*1e3:.1f} ms "
              f"({sol/dt*100:.1f}% of step is SoL)")

    if "--trace" in sys.argv:
        trace_dir = "/tmp/flagship_trace"
        os.system(f"rm -rf {trace_dir}")
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, m = step(state, batch)
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        summarize_trace(trace_dir, n_steps=3)


def summarize_trace(trace_dir: str, n_steps: int = 1, top: int = 40):
    """Aggregate device-op self time from the .trace.json.gz event dump."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pids whose process names mention TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, name in proc_names.items()
                if "TPU" in name or "/device" in name.lower()}
    agg = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    total = sum(agg.values())
    print(f"\ndevice op self-time over {n_steps} steps "
          f"(total {total/1e3/n_steps:.1f} ms/step):")
    for name, us in rows:
        print(f"  {us/1e3/n_steps:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
