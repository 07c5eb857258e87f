"""Spatial sharding x flat layout (VERDICT r3 #4).

The flat scales run on per-shard geometries (FlatGeom.sp) with the batch
axis carrying sp*N shard-major entries; halo exchange happens inside the
flat ops via flatconv.extend_shards.  These tests pin:
  * op-level parity (conv, dilated conv) sharded vs unsharded, incl. the
    cross-shard gradient routing through extend_shards' VJP;
  * full-model parity (logits exactly equal, param grads within noise);
  * execution under a data x spatial GSPMD mesh (the virtual-CPU stand-in
    for ICI, SURVEY.md §4) matching the single-device loss.

Reference has no analog (single device, area cap instead:
/root/reference/model/training/trainer.py:59,114-120).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msau_tpu.config import ModelConfig
from msau_tpu.models.msau import build_model
from msau_tpu.ops.flatconv import (
    FlatGeom,
    choose_geom,
    flat_conv2d,
    from_body,
    to_body,
)


H, W, C, SP = 64, 48, 8, 2


def _full_geom():
    return choose_geom(H, W)


def _shard_geom():
    g = _full_geom()
    return FlatGeom(H // SP, W, g.P, min(g.tile_h, H // SP), SP)


def _split(x, g_sh):
    n = x.shape[0]
    xs = x.reshape(n, C, SP, H // SP, W).transpose(2, 0, 1, 3, 4)
    return to_body(xs.reshape(SP * n, C, H // SP, W), g_sh)


def _unsplit(yb, g_sh, n, cout):
    y = from_body(yb, g_sh).reshape(SP, n, cout, H // SP, W)
    return y.transpose(1, 2, 0, 3, 4).reshape(n, cout, H, W)


@pytest.mark.parametrize("d", [1, 2])
def test_sharded_conv_matches_unsharded(d):
    g_full, g_sh = _full_geom(), _shard_geom()
    x = jax.random.normal(jax.random.PRNGKey(0), (3, C, H, W))
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (C,))
    y_full = from_body(
        flat_conv2d(to_body(x, g_full), wk, b, g_full, dilation=d), g_full)
    y_sh = _unsplit(flat_conv2d(_split(x, g_sh), wk, b, g_sh, dilation=d),
                    g_sh, 3, C)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_conv_grads_route_across_shards():
    g_full, g_sh = _full_geom(), _shard_geom()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, C, H, W))
    wk = jax.random.normal(jax.random.PRNGKey(4), (3, 3, C, C)) * 0.3
    b = jnp.zeros((C,))

    def lf(x):
        return jnp.sum(jnp.sin(from_body(
            flat_conv2d(to_body(x, g_full), wk, b, g_full), g_full)))

    def ls(x):
        return jnp.sum(jnp.sin(_unsplit(
            flat_conv2d(_split(x, g_sh), wk, b, g_sh), g_sh, 2, C)))

    gf, gs = jax.grad(lf)(x), jax.grad(ls)(x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                               rtol=1e-5, atol=1e-5)


def _model_cfgs():
    cfg1 = ModelConfig(img_channels=6, n_class=5, scale_space_num=3,
                       res_depth=2, feat_root=8, num_blocks=2,
                       final_act="softmax", flat_scales=2)
    return cfg1, dataclasses.replace(cfg1, spatial_shards=SP)


@pytest.mark.slow
def test_model_spatial_shards_parity():
    cfg1, cfg2 = _model_cfgs()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 6))
    m1, m2 = build_model(cfg1), build_model(cfg2)
    p = m1.init(jax.random.PRNGKey(1), x)
    _, logits1, aux1 = m1.apply(p, x, logits_layout="NHWC")
    _, logits2, aux2 = m2.apply(p, x, logits_layout="NHWC")
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux2), np.asarray(aux1),
                               rtol=1e-5, atol=1e-5)

    def loss(p, m):
        _, lg, ax = m.apply(p, x, logits_layout="NHWC")
        return jnp.sum(jnp.sin(lg)) + 0.5 * jnp.sum(jnp.sin(ax))

    g1 = jax.grad(lambda p: loss(p, m1))(p)
    g2 = jax.grad(lambda p: loss(p, m2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # f32 summation-order noise: near-zero leaves (attention biases,
        # grad magnitude ~2e-4) show ~3e-5 absolute wobble
        scale = float(jnp.max(jnp.abs(a))) + 1e-2
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-2


@pytest.mark.slow
def test_model_spatial_shards_on_mesh():
    """Full train step, flat layout, data x spatial mesh == single device."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from msau_tpu.train.trainer import TrainState, make_train_step

    cfg1, cfg2 = _model_cfgs()
    m1, m2 = build_model(cfg1), build_model(cfg2)
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    n = 4
    batch = {
        "input": rng.random((n, 64, 64, 6)).astype(np.float32),
        "label": rng.integers(0, 5, (n, 64, 64)).astype(np.int32),
        "valid": np.ones((n, 64, 64), bool),
    }
    x0 = jnp.zeros((1, 64, 64, 6))
    p = m1.init(jax.random.PRNGKey(0), x0)

    # single-device reference
    st = TrainState.create(p, opt)
    step1 = make_train_step(m1, opt, masked=True, donate=False)
    _, metrics1 = step1(st, {k: jnp.asarray(v) for k, v in batch.items()})
    loss1 = float(metrics1["loss"])

    # sharded: 2 data x 2 spatial
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "spatial"))
    xsh = NamedSharding(mesh, P("data", "spatial", None, None))
    ysh = NamedSharding(mesh, P("data", "spatial", None))
    repl = NamedSharding(mesh, P())
    st2 = jax.device_put(TrainState.create(p, opt), repl)
    dev_batch = {
        "input": jax.device_put(batch["input"], xsh),
        "label": jax.device_put(batch["label"], ysh),
        "valid": jax.device_put(batch["valid"], ysh),
    }
    step2 = make_train_step(m2, opt, masked=True, donate=False)
    new_state, metrics2 = jax.jit(step2)(st2, dev_batch)
    jax.block_until_ready(new_state.params)
    loss2 = float(metrics2["loss"])
    np.testing.assert_allclose(loss2, loss1, rtol=1e-4)
