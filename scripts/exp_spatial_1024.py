"""Config-5 (1024^2 bf16 flat, bs=2) with and without spatial_shards=2,
single chip, device-trace timed (VERDICT r3 #4 'publish the measurement').

On one chip sp=2 measures the PURE OVERHEAD of the spatial machinery
(extend/shrink copies + split entry batch); the multi-chip win is the
~halved per-device footprint and compute validated by the dryrun's
data x spatial phase.

Run solo on the chip:  python scripts/exp_spatial_1024.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ktime import device_ms


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data.synth import make_structured_batch
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    bs, hw = 2, 1024
    base = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", remat=True,
        dtype="bfloat16", flat_scales=3,
    )
    optimizer = make_optimizer(TrainConfig(learning_rate=1e-4,
                                           lr_decay_staircase=False))
    rng = np.random.default_rng(0)
    xh, yh = make_structured_batch(rng, bs, hw, base.n_class,
                                   base.img_channels)
    batch = {"input": jnp.asarray(xh).astype(jnp.bfloat16),
             "label": jnp.asarray(yh),
             "valid": jnp.ones((bs, hw, hw), bool)}

    for sp in (1, 2):
        cfg = dataclasses.replace(base, spatial_shards=sp)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), batch["input"][:1])
        state = TrainState.create(params, optimizer)
        step = jax.jit(make_train_step(model, optimizer, masked=True,
                                       donate=False))
        _, m = step(state, batch)
        print(f"sp={sp} loss {float(m['loss']):.4f}", flush=True)
        t = device_ms(step, state, batch, iters=5, warmup=1)
        print(f"sp={sp}: {t:7.1f} ms/step ({bs / t * 1e3:.2f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
