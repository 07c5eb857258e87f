"""flat channel-major conv vs XLA oracle (forward + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msau_tpu.ops.flatconv import (
    DEFAULT_P,
    choose_geom,
    FlatGeom,
    body_lrn,
    body_maxpool2,
    body_upsample2,
    flat_conv2d,
    flat_conv2d_reference,
    from_body,
    to_body,
)


def _mk(geom, cin, key):
    x = jax.random.normal(key, (2, cin, geom.H, geom.W), jnp.float32)
    return to_body(x, geom)


CASES = [
    # (H, W, cin, cout, kh, kw, dilation, padding)
    (32, 48, 8, 8, 3, 3, 1, "SAME"),
    (32, 48, 8, 16, 3, 3, 2, "SAME"),       # dilated rate-2 (scale-1 conv)
    (32, 48, 16, 8, 1, 1, 1, "SAME"),       # coupling 1x1
    (32, 48, 8, 17, 4, 4, 1, "SAME"),       # end conv (even kernel, asym pad)
    (32, 48, 16, 8, 3, 3, 1, (1, 1)),       # explicit pad (deconv-style)
    (24, 40, 32, 16, 3, 3, 1, "SAME"),      # wider channels (scale-1 merge)
]


@pytest.mark.parametrize("h,w,cin,cout,kh,kw,d,pad", CASES)
def test_forward_matches_oracle(h, w, cin, cout, kh, kw, d, pad):
    geom = choose_geom(h, w)
    key = jax.random.PRNGKey(0)
    xb = _mk(geom, cin, key)
    wk = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))
    got = flat_conv2d(xb, wk, b, geom, dilation=d, padding=pad)
    ref = flat_conv2d_reference(xb, wk, b, geom, dilation=d, padding=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # pad columns and guard blocks must stay exactly zero (body invariant)
    from msau_tpu.ops.flatconv import body_mask
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(body_mask(got, geom)))


ALIGNED_CASES = [
    # lane-aligned geometry (Wp % 128 == 0, z0 > 0 scheme)
    (32, 64, 8, 8, 3, 3, 1, "SAME"),
    (32, 64, 8, 16, 3, 3, 2, "SAME"),
    (32, 64, 16, 8, 1, 1, 1, "SAME"),
    (32, 64, 8, 17, 4, 4, 1, "SAME"),
    (32, 64, 16, 8, 3, 3, 1, (1, 1)),
]


def _aligned_geom(h, w):
    from msau_tpu.ops.flatconv import FlatGeom

    p = ((-(-w // 128) + (1 if w % 128 == 0 else 0)) * 128 - w) // 2
    geom = FlatGeom(h, w, p, min(8, h))
    assert geom.Wp % 128 == 0
    return geom


@pytest.mark.parametrize("h,w,cin,cout,kh,kw,d,pad", ALIGNED_CASES)
def test_forward_matches_oracle_aligned(h, w, cin, cout, kh, kw, d, pad):
    geom = _aligned_geom(h, w)
    key = jax.random.PRNGKey(0)
    xb = _mk(geom, cin, key)
    wk = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))
    got = flat_conv2d(xb, wk, b, geom, dilation=d, padding=pad)
    ref = flat_conv2d_reference(xb, wk, b, geom, dilation=d, padding=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    from msau_tpu.ops.flatconv import body_mask
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(body_mask(got, geom)))


@pytest.mark.parametrize("h,w,cin,cout,kh,kw,d,pad", ALIGNED_CASES[:3])
def test_grads_match_oracle_aligned(h, w, cin, cout, kh, kw, d, pad):
    geom = _aligned_geom(h, w)
    xb = _mk(geom, cin, jax.random.PRNGKey(3))
    wk = jax.random.normal(jax.random.PRNGKey(4), (kh, kw, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(5), (cout,))
    cw = jax.random.normal(jax.random.PRNGKey(6), (2, cout, geom.LB))

    def loss(fn):
        return lambda *a: jnp.sum(
            fn(*a, geom, dilation=d, padding=pad) * cw)

    g_got = jax.grad(loss(flat_conv2d), argnums=(0, 1, 2))(xb, wk, b)
    g_ref = jax.grad(loss(flat_conv2d_reference), argnums=(0, 1, 2))(
        xb, wk, b)
    for got, ref, name in zip(g_got, g_ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3,
            err_msg=f"grad wrt {name}")


@pytest.mark.parametrize("act,lrn", [("relu", None), ("relu", 5)])
def test_fused_epilogue_aligned(act, lrn):
    geom = _aligned_geom(32, 64)
    cin = cout = 8
    xb = _mk(geom, cin, jax.random.PRNGKey(7))
    wk = jax.random.normal(jax.random.PRNGKey(8), (3, 3, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(9), (cout,))
    from msau_tpu.ops.flatconv import body_lrn

    got = flat_conv2d(xb, wk, b, geom, act=act, lrn_size=lrn)
    ref = flat_conv2d_reference(xb, wk, b, geom)
    ref = jax.nn.relu(ref)
    if lrn:
        ref = body_lrn(ref, lrn, 1e-4, 0.75, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h,w,cin,cout,kh,kw,d,pad", CASES[:4])
def test_grads_match_oracle(h, w, cin, cout, kh, kw, d, pad):
    geom = choose_geom(h, w)
    xb = _mk(geom, cin, jax.random.PRNGKey(3))
    wk = jax.random.normal(jax.random.PRNGKey(4), (kh, kw, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(5), (cout,))
    # cotangent weights make the scalar objective sensitive everywhere
    cw = jax.random.normal(jax.random.PRNGKey(6), (2, cout, geom.LB))

    def loss(fn):
        def f(xb, wk, b):
            return jnp.sum(fn(xb, wk, b, geom, dilation=d, padding=pad) * cw)
        return f

    g_got = jax.grad(loss(flat_conv2d), argnums=(0, 1, 2))(xb, wk, b)
    g_ref = jax.grad(loss(flat_conv2d_reference), argnums=(0, 1, 2))(xb, wk, b)
    for got, ref, name in zip(g_got, g_ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4,
            err_msg=f"grad wrt {name}",
        )


@pytest.mark.slow
def test_wide_cin_chunked_matches_oracle():
    """cin wider than the VMEM tap-stack budget splits into summed chunks.

    A small forced budget makes cmax tiny at test shapes, exercising the
    chunked path (the production trigger is the 64-channel chargrid entry
    conv at 512^2, where the full tap stack blows VMEM).
    """
    from msau_tpu.ops.flatconv import max_flat_cin

    geom = choose_geom(32, 48)
    cin, cout = 32, 8
    # effective budget is halved at itemsize=4 (f32 temporaries take the
    # other half — see _sub_tile), so double the nominal budget for cmax==7
    budget = 3 * geom.tile_h * geom.Wp * 4 * 7 * 2  # cmax == 7 -> 5 chunks
    assert max_flat_cin(3, 3, geom, 4, budget) == 7
    xb = _mk(geom, cin, jax.random.PRNGKey(7))
    wk = jax.random.normal(jax.random.PRNGKey(8), (3, 3, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(9), (cout,))
    got = flat_conv2d(xb, wk, b, geom, vmem_budget=budget)
    ref = flat_conv2d_reference(xb, wk, b, geom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    cw = jax.random.normal(jax.random.PRNGKey(10), (2, cout, geom.LB))

    def loss(fn, **kw):
        def f(xb, wk, b):
            return jnp.sum(fn(xb, wk, b, geom, **kw) * cw)
        return f

    g_got = jax.grad(loss(flat_conv2d, vmem_budget=budget),
                     argnums=(0, 1, 2))(xb, wk, b)
    g_ref = jax.grad(loss(flat_conv2d_reference), argnums=(0, 1, 2))(xb, wk, b)
    for got, ref, name in zip(g_got, g_ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4,
            err_msg=f"grad wrt {name}",
        )


def test_body_roundtrip_and_pool_upsample():
    geom = choose_geom(16, 24)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 24))
    xb = to_body(x, geom)
    np.testing.assert_array_equal(np.asarray(from_body(xb, geom)), np.asarray(x))

    gout = choose_geom(8, 12)
    pooled = body_maxpool2(xb, geom, gout)
    ref = x.reshape(2, 4, 8, 2, 12, 2).max(axis=(3, 5))
    np.testing.assert_allclose(np.asarray(from_body(pooled, gout)),
                               np.asarray(ref), rtol=1e-6)

    up = body_upsample2(pooled, gout, geom)
    up4 = np.asarray(from_body(up, geom))
    np.testing.assert_allclose(up4[:, :, ::2, ::2], np.asarray(ref), rtol=1e-6)
    assert np.all(up4[:, :, 1::2, :] == 0) and np.all(up4[:, :, :, 1::2] == 0)


def test_body_lrn_matches_nhwc_lrn():
    from msau_tpu.models.layers import local_response_norm

    geom = choose_geom(8, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    xb = to_body(x, geom)
    got = from_body(body_lrn(xb, size=8), geom)
    ref = jnp.transpose(
        local_response_norm(jnp.transpose(x, (0, 2, 3, 1)), size=8),
        (0, 3, 1, 2),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bf16_forward_close():
    geom = choose_geom(32, 48)
    xb = _mk(geom, 8, jax.random.PRNGKey(7)).astype(jnp.bfloat16)
    wk = jax.random.normal(jax.random.PRNGKey(8), (3, 3, 8, 8)) * 0.3
    b = jnp.zeros((8,))
    got = flat_conv2d(xb, wk, b, geom)
    ref = flat_conv2d_reference(xb.astype(jnp.float32), wk, b, geom)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)


@pytest.mark.slow
def test_flat_model_parity():
    """flat_scales model == NHWC model with identical params (same tree)."""
    import dataclasses

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model

    cfg0 = ModelConfig(n_class=5, img_channels=12, feat_root=8,
                       scale_space_num=4, res_depth=2, num_blocks=3)
    cfg1 = dataclasses.replace(cfg0, flat_scales=2)
    m0, m1 = build_model(cfg0), build_model(cfg1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96, 12))
    v = m0.init(jax.random.PRNGKey(0), x)
    _, l0, a0 = m0.apply(v, x)
    _, l1, a1 = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_flat_model_grads_match():
    """Train-style gradients agree between flat and NHWC layouts (CPU)."""
    import dataclasses

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model

    cfg0 = ModelConfig(n_class=4, img_channels=6, feat_root=8,
                       scale_space_num=3, res_depth=1, num_blocks=2)
    cfg1 = dataclasses.replace(cfg0, flat_scales=1)
    m0, m1 = build_model(cfg0), build_model(cfg1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 6))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 4))
    v = m0.init(jax.random.PRNGKey(0), x)

    def loss(m):
        def f(params):
            _, logits, aux = m.apply(params, x)
            return jnp.mean((logits - tgt) ** 2) + 0.5 * jnp.mean(aux**2)
        return f

    g0 = jax.grad(loss(m0))(v)
    g1 = jax.grad(loss(m1))(v)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): l
             for k, l in jax.tree_util.tree_leaves_with_path(g1)}
    for k, a in flat0:
        b = flat1[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.slow
def test_nchw_loss_path_matches_nhwc():
    """make_train_step with flat_scales (NCHW logits loss) == NHWC step."""
    import dataclasses

    import optax

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.trainer import TrainState, make_train_step

    cfg0 = ModelConfig(n_class=4, img_channels=6, feat_root=8,
                       scale_space_num=3, res_depth=1, num_blocks=2)
    cfg1 = dataclasses.replace(cfg0, flat_scales=1)
    m0, m1 = build_model(cfg0), build_model(cfg1)
    opt = optax.adam(1e-3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 6))
    lbl = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32), 0, 4)
    batch = {"input": x, "label": lbl, "valid": jnp.ones((2, 32, 32), bool)}
    params = m0.init(jax.random.PRNGKey(0), x)
    losses = []
    for m in (m0, m1):
        state = TrainState.create(params, opt)
        step = make_train_step(m, opt, masked=True, donate=False)
        _, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-4)


@pytest.mark.slow
def test_flat_model_dp_mesh_parity():
    """flat_scales train step under an 8-way data-parallel mesh == single."""
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.trainer import TrainState, make_train_step

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig(n_class=4, img_channels=6, feat_root=8,
                      scale_space_num=3, res_depth=1, num_blocks=2,
                      flat_scales=1)
    model = build_model(cfg)
    opt = optax.adam(1e-3)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 6))
    lbl = jax.random.randint(jax.random.PRNGKey(2), (8, 32, 32), 0, 4)
    batch = {"input": x, "label": lbl, "valid": jnp.ones((8, 32, 32), bool)}
    params = model.init(jax.random.PRNGKey(0), x[:1])
    step = make_train_step(model, opt, masked=True, donate=False)
    _, m0 = step(TrainState.create(params, opt), batch)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    bsh = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
           for k, v in batch.items()}
    psh = jax.device_put(params, NamedSharding(mesh, P()))
    _, m1 = step(TrainState.create(psh, opt), bsh)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)


def test_pool_custom_vjp_matches_autodiff():
    """body_maxpool2's custom backward == autodiff of the same forward."""
    from msau_tpu.ops.flatconv import _pool2_halves, choose_geom

    gin = choose_geom(16, 24)
    gout = choose_geom(8, 12)
    x = to_body(jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 24)), gin)
    cw = jax.random.normal(jax.random.PRNGKey(1), (2, 4, gout.LB))

    def auto_fwd(xb):  # same math, default autodiff
        a, b = _pool2_halves(xb, gin)
        rows = jnp.maximum(a, b)
        p = jnp.maximum(rows[..., 0::2], rows[..., 1::2])
        return to_body(p, gout)

    def custom_fwd(xb):
        return body_maxpool2(xb, gin, gout)

    np.testing.assert_allclose(np.asarray(custom_fwd(x)),
                               np.asarray(auto_fwd(x)), rtol=1e-6)
    g0 = jax.grad(lambda v: jnp.sum(auto_fwd(v) * cw))(x)
    g1 = jax.grad(lambda v: jnp.sum(custom_fwd(v) * cw))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5,
                               atol=1e-6)


def test_geometry_respects_dtype_vmem_budget():
    """f32 at 512^2 must pick a halo whose min aligned tile fits VMEM.

    P=2 only admits 32-row tiles at Wp=516; a 17-channel f32 tap-stack
    then needs 19.3M of scoped VMEM (> 16M) — the config-2 OOM.  The
    itemsize-aware choose_geom must move to P=4 where 16-row tiles align.
    """
    from msau_tpu.models.flat_layers import make_scale_geoms
    from msau_tpu.ops.flatconv import VMEM_XS_BUDGET

    for itemsize in (2, 4):
        geoms = make_scale_geoms(512, 512, 3, itemsize)
        for s, g in enumerate(geoms):
            cin = max(2 * 8 * 2**s, 17 if s == 0 else 0)
            valid = [t for t in range(1, g.H + 1)
                     if g.H % t == 0 and (t * g.Wp) % 128 == 0]
            assert 9 * cin * min(valid) * g.Wp * itemsize <= VMEM_XS_BUDGET, (
                itemsize, s, g)
    # the tuned bf16 flagship geometries must stay put: scale 0 is the
    # lane-ALIGNED Wp=640 form (round-4 device-trace calibration), deeper
    # scales keep the minimal-halo classic form
    assert make_scale_geoms(512, 512, 2, 2)[0] == (512, 512, 64, 32, 1)
    assert make_scale_geoms(512, 512, 2, 2)[1][:4] == (256, 256, 4, 32)
    assert make_scale_geoms(512, 512, 2, 2, align_scales=0)[0][:4] == (
        512, 512, 2, 32)


@pytest.mark.slow
def test_body_loss_boundary_matches_nhwc():
    """Train-step loss/grads with BODY logits + body labels == the NHWC
    path (round-3: the loss consumes raw [N, C, LB] logits; labels move
    into body columns instead of logits moving out)."""
    import jax
    import jax.numpy as jnp

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    rng = np.random.default_rng(3)
    batch = {
        "input": jnp.asarray(rng.random((2, 32, 32, 6)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32)), jnp.int32),
        "valid": jnp.asarray(rng.random((2, 32, 32)) > 0.1),
    }
    tcfg = TrainConfig(optimizer="momentum", learning_rate=1e-2,
                       lr_decay_staircase=False, donate_state=False,
                       matmul_precision="")
    losses = {}
    states = {}
    for fs in (0, 1):
        cfg = ModelConfig(img_channels=6, n_class=4, scale_space_num=2,
                          res_depth=1, feat_root=4, num_blocks=1,
                          flat_scales=fs)
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), batch["input"][:1])
        opt = make_optimizer(tcfg)
        state = TrainState.create(params, opt)
        step = make_train_step(model, opt, masked=True, donate=False)
        states[fs], m = step(state, batch)
        losses[fs] = float(m["loss"])
        assert np.isfinite(losses[fs])
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(states[0].params),
                    jax.tree_util.tree_leaves(states[1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_flat_upsample2_matches_body_upsample2():
    """The Pallas zero-insert kernel == the XLA round-trip upsample
    (forward and VJP), at a geometry satisfying its alignment rules."""
    import jax
    import jax.numpy as jnp

    from msau_tpu.ops.flatconv import (
        _upsample_tiles,
        body_upsample2,
        flat_upsample2,
        to_body,
    )
    from msau_tpu.models.flat_layers import make_scale_geoms

    rng = np.random.default_rng(7)
    geoms = make_scale_geoms(64, 64, 2, itemsize=4)
    g_out, g_in = geoms[0], geoms[1]
    assert _upsample_tiles(g_in, g_out) is not None, (g_in, g_out)
    x = to_body(jnp.asarray(rng.random((2, 3, 32, 32)), jnp.float32), g_in)

    want = body_upsample2(x, g_in, g_out)
    got = flat_upsample2(x, g_in, g_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    cw = jnp.asarray(rng.random(want.shape), jnp.float32)
    gw = jax.grad(lambda v: jnp.sum(body_upsample2(v, g_in, g_out) * cw))(x)
    gg = jax.grad(lambda v: jnp.sum(flat_upsample2(v, g_in, g_out) * cw))(x)
    # the kernel's VJP filters guard/pad cotangent junk by construction;
    # compare on the body (both grads are body tensors of real pixels)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), atol=1e-5)


EPI_CASES = [
    # (act, lrn_size, cin, cout, kh, kw, d)
    ("relu", 8, 16, 8, 1, 1, 1),     # couple-conv shape: 1x1 + relu
    (None, 8, 8, 8, 3, 3, 1),        # dil-conv shape: LRN only
    (None, 16, 8, 16, 3, 3, 2),      # dilated rate-2 + LRN
    ("elu", None, 8, 8, 3, 3, 1),    # act only
    ("relu", 8, 8, 8, 3, 3, 1),      # act + LRN
]


def _epi_oracle(xb, wk, b, geom, act, lrn_size, d):
    """Unfused composition: oracle conv -> XLA act -> body_lrn."""
    y = flat_conv2d_reference(xb, wk, b, geom, dilation=d)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "elu":
        y = jax.nn.elu(y)
    if lrn_size:
        y = body_lrn(y, lrn_size)
    from msau_tpu.ops.flatconv import body_mask

    return body_mask(y, geom)


@pytest.mark.parametrize("act,lrn,cin,cout,kh,kw,d", EPI_CASES)
def test_fused_epilogue_matches_composition(act, lrn, cin, cout, kh, kw, d):
    """conv+act+LRN fused into the kernel == the unfused composition,
    forward and all three grads (the backward recomputes the conv and
    routes the cotangent through the LRN/act chain in one kernel)."""
    geom = choose_geom(32, 48)
    xb = _mk(geom, cin, jax.random.PRNGKey(11))
    wk = jax.random.normal(jax.random.PRNGKey(12), (kh, kw, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(13), (cout,)) * 0.1

    got = flat_conv2d(xb, wk, b, geom, dilation=d, act=act, lrn_size=lrn)
    ref = _epi_oracle(xb, wk, b, geom, act, lrn, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
    # body invariant: guards and pad columns exactly zero
    from msau_tpu.ops.flatconv import body_mask
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(body_mask(got, geom)))

    cw = jax.random.normal(jax.random.PRNGKey(14), (2, cout, geom.LB))

    def f_fused(xb, wk, b):
        return jnp.sum(
            flat_conv2d(xb, wk, b, geom, dilation=d, act=act, lrn_size=lrn)
            * cw)

    def f_ref(xb, wk, b):
        return jnp.sum(_epi_oracle(xb, wk, b, geom, act, lrn, d) * cw)

    g_got = jax.grad(f_fused, argnums=(0, 1, 2))(xb, wk, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(xb, wk, b)
    for got_g, ref_g, name in zip(g_got, g_ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(ref_g), rtol=4e-4, atol=4e-4,
            err_msg=f"grad wrt {name} (act={act}, lrn={lrn})",
        )


def test_fused_epilogue_chunked_fallback():
    """Wide-cin chunked convs apply the epilogue as XLA ops — same result."""
    geom = choose_geom(32, 48)
    cin, cout = 32, 8
    budget = 3 * geom.tile_h * geom.Wp * 4 * 7  # force chunking (cmax 7)
    xb = _mk(geom, cin, jax.random.PRNGKey(15))
    wk = jax.random.normal(jax.random.PRNGKey(16), (3, 3, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(17), (cout,)) * 0.1
    got = flat_conv2d(xb, wk, b, geom, vmem_budget=budget, act="relu",
                      lrn_size=cout)
    ref = _epi_oracle(xb, wk, b, geom, "relu", cout, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_to_body_nhwc_fused_matches_xla():
    """One-pass entry conversion == to_body(transpose), values and grads."""
    from msau_tpu.ops.flatconv import FlatGeom, to_body, to_body_nhwc_fused

    geom = FlatGeom(64, 128, 64, 8)  # Wp = 256, aligned
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128, 16))
    y1 = to_body_nhwc_fused(x, geom)
    y2 = to_body(jnp.transpose(x, (0, 3, 1, 2)), geom)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(
        to_body_nhwc_fused(x, geom))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(
        to_body(jnp.transpose(x, (0, 3, 1, 2)), geom))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    # shape gate: non-128-multiple W falls back to None
    assert to_body_nhwc_fused(
        jax.random.normal(jax.random.PRNGKey(1), (1, 32, 48, 8)),
        FlatGeom(32, 48, 2, 32)) is None


# ---------------------------------------------------------------------------
# Fused concat + KxK conv (the up-tower skip-merge pattern)


CAT_CASES = [
    # (h, w, ca, cb, cout, kh, kw)
    (32, 48, 8, 8, 8, 3, 3),      # scale-0 merge shape
    (24, 40, 16, 16, 16, 3, 3),   # scale-1 merge
    (32, 48, 8, 16, 8, 3, 3),     # asymmetric split
    (32, 64, 8, 8, 8, 3, 3),      # lane-aligned geometry
]


def _cat_geom(h, w):
    if w % 64 == 0:
        return _aligned_geom(h, w)
    return choose_geom(h, w)


@pytest.mark.parametrize("h,w,ca,cb,cout,kh,kw", CAT_CASES)
def test_concat_conv2d_matches_oracle(h, w, ca, cb, cout, kh, kw):
    from msau_tpu.ops.flatconv import flat_concat_conv2d

    geom = _cat_geom(h, w)
    a = _mk(geom, ca, jax.random.PRNGKey(0))
    b = _mk(geom, cb, jax.random.PRNGKey(1))
    wk = jax.random.normal(jax.random.PRNGKey(2),
                           (kh, kw, ca + cb, cout)) * 0.3
    bias = jax.random.normal(jax.random.PRNGKey(3), (cout,))
    got = flat_concat_conv2d(a, b, wk, bias, geom)
    ref = flat_conv2d_reference(jnp.concatenate([a, b], axis=1), wk, bias,
                                geom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    from msau_tpu.ops.flatconv import body_mask
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(body_mask(got, geom)))


@pytest.mark.parametrize("h,w,ca,cb,cout,kh,kw", CAT_CASES[:2])
def test_concat_conv2d_grads_match_oracle(h, w, ca, cb, cout, kh, kw):
    from msau_tpu.ops.flatconv import flat_concat_conv2d

    geom = _cat_geom(h, w)
    a = _mk(geom, ca, jax.random.PRNGKey(4))
    b = _mk(geom, cb, jax.random.PRNGKey(5))
    wk = jax.random.normal(jax.random.PRNGKey(6),
                           (kh, kw, ca + cb, cout)) * 0.3
    bias = jax.random.normal(jax.random.PRNGKey(7), (cout,))
    cw = jax.random.normal(jax.random.PRNGKey(8), (2, cout, geom.LB))

    def loss_fused(a, b, wk, bias):
        return jnp.sum(flat_concat_conv2d(a, b, wk, bias, geom) * cw)

    def loss_ref(a, b, wk, bias):
        cat = jnp.concatenate([a, b], axis=1)
        return jnp.sum(flat_conv2d_reference(cat, wk, bias, geom) * cw)

    g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(a, b, wk, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(a, b, wk, bias)
    for got, ref, name in zip(g_got, g_ref, "a b w bias".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3,
            err_msg=f"grad wrt {name}")


def test_concat_conv2d_wide_fallback():
    """cin beyond the VMEM cap takes the materialized-concat chunked path."""
    from msau_tpu.ops.flatconv import flat_concat_conv2d, max_flat_cin

    geom = choose_geom(16, 24)
    ca = cb = max_flat_cin(3, 3, geom, 4) // 2 + 4
    a = _mk(geom, ca, jax.random.PRNGKey(9))
    b = _mk(geom, cb, jax.random.PRNGKey(10))
    wk = jax.random.normal(jax.random.PRNGKey(11),
                           (3, 3, ca + cb, 8)) * 0.1
    bias = jnp.zeros((8,))
    got = flat_concat_conv2d(a, b, wk, bias, geom)
    ref = flat_conv2d_reference(jnp.concatenate([a, b], axis=1), wk, bias,
                                geom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Fused stride-2 transposed conv (upsample + 3x3 conv in one kernel)


DC_CASES = [
    # (h_in, w_in, cin, cout) -> geom_out at (2h, 2w)
    (32, 64, 8, 8),
    (32, 64, 16, 8),
    (32, 96, 8, 16),
]


def _dc_geoms(h, w):
    gi = choose_geom(h, w, wp_mod=8)
    # flat_deconv2 gates on lane-aligned outputs (measured: it loses on
    # unaligned Wp_out); small test resolutions need the guard tile
    # forced to 32 for a feasible (t_out, t_in) pair, like the flagship
    wo = 2 * w
    p = ((-(-wo // 128) + (1 if wo % 128 == 0 else 0)) * 128 - wo) // 2
    go = FlatGeom(2 * h, wo, p, 32)
    assert go.Wp % 128 == 0 and (2 * h) % 32 == 0
    return gi, go


@pytest.mark.parametrize("h,w,cin,cout", DC_CASES)
def test_flat_deconv2_matches_two_op_path(h, w, cin, cout):
    from msau_tpu.ops.flatconv import (
        body_upsample2,
        flat_deconv2,
    )

    gi, go = _dc_geoms(h, w)
    x = _mk(gi, cin, jax.random.PRNGKey(0))
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))
    got = flat_deconv2(x, wk, b, gi, go)
    if got is None:
        pytest.skip(f"no fused tiling for {gi} -> {go}")
    up = body_upsample2(x, gi, go)
    ref = flat_conv2d_reference(up, wk, b, go)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    from msau_tpu.ops.flatconv import body_mask
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(body_mask(got, go)))


@pytest.mark.parametrize("h,w,cin,cout", DC_CASES[:2])
def test_flat_deconv2_grads_match(h, w, cin, cout):
    from msau_tpu.ops.flatconv import (
        body_mask,
        body_upsample2,
        flat_deconv2,
    )

    gi, go = _dc_geoms(h, w)
    x = _mk(gi, cin, jax.random.PRNGKey(3))
    wk = jax.random.normal(jax.random.PRNGKey(4), (3, 3, cin, cout)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(5), (cout,))
    if flat_deconv2(x, wk, b, gi, go) is None:
        pytest.skip(f"no fused tiling for {gi} -> {go}")
    # the fused VJP assumes the body invariant on the cotangent (the model
    # wiring guarantees it) — use a body-masked cotangent weight
    cw = body_mask(
        jax.random.normal(jax.random.PRNGKey(6), (2, cout, go.LB)), go)

    def loss_fused(x, wk, b):
        return jnp.sum(flat_deconv2(x, wk, b, gi, go) * cw)

    def loss_ref(x, wk, b):
        up = body_upsample2(x, gi, go)
        return jnp.sum(flat_conv2d_reference(up, wk, b, go) * cw)

    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wk, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wk, b)
    for got, ref, name in zip(g_got, g_ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3,
            err_msg=f"grad wrt {name}")


# ---------------------------------------------------------------------------
# Fused Pallas 2x2 maxpool


def _pool_geoms(h, w):
    gi = choose_geom(h, w)
    go = choose_geom(h // 2, w // 2, wp_mod=8)
    return gi, go


@pytest.mark.parametrize("h,w,c", [(32, 64, 8), (16, 48, 16)])
def test_flat_maxpool2_matches_xla_path(h, w, c):
    from msau_tpu.ops.flatconv import (
        _flat_maxpool2_prim,
        _pool2_even,
        _pool_tiles,
    )

    gi, go = _pool_geoms(h, w)
    if _pool_tiles(gi, go) is None:
        pytest.skip(f"no fused pool tiling for {gi} -> {go}")
    x = _mk(gi, c, jax.random.PRNGKey(0))
    got = _flat_maxpool2_prim(x, gi, go)
    want = _pool2_even(x, gi, go)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_flat_maxpool2_grads_match_xla_path():
    from msau_tpu.ops.flatconv import (
        _flat_maxpool2_prim,
        _pool2_even,
        _pool_tiles,
        body_mask,
    )

    gi, go = _pool_geoms(32, 64)
    if _pool_tiles(gi, go) is None:
        pytest.skip(f"no fused pool tiling for {gi} -> {go}")
    c = 8
    # duplicate values across pool windows exercise the tie rules
    x = _mk(gi, c, jax.random.PRNGKey(1))
    x = jnp.round(x * 2) / 2
    cw = body_mask(
        jax.random.normal(jax.random.PRNGKey(2), (2, c, go.LB)), go)

    g_got = jax.grad(
        lambda x: jnp.sum(_flat_maxpool2_prim(x, gi, go) * cw))(x)
    g_ref = jax.grad(
        lambda x: jnp.sum(_pool2_even(x, gi, go) * cw))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
