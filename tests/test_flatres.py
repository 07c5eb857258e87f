"""Fused residual block vs flat_conv2d composition oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msau_tpu.ops.flatconv import choose_geom, to_body
from msau_tpu.ops.flatres import (
    flat_res_block,
    flat_res_block_reference,
    fused_res_supported,
)


def _setup(h, w, c, act, key=0, aligned=False):
    if aligned:
        # lane-aligned geometry (Wp % 128 == 0) exercises the _al kernels
        from msau_tpu.ops.flatconv import FlatGeom

        p = ((-(-w // 128) + (1 if w % 128 == 0 else 0)) * 128 - w) // 2
        geom = FlatGeom(h, w, p, min(8, h))
        assert geom.Wp % 128 == 0
    else:
        geom = choose_geom(h, w)
    assert fused_res_supported(geom, c, 3, 2, act)
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    x = to_body(jax.random.normal(ks[0], (2, c, h, w)), geom)
    w1 = jax.random.normal(ks[1], (3, 3, c, c)) * 0.3
    b1 = jax.random.normal(ks[2], (c,)) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, c, c)) * 0.3
    b2 = jax.random.normal(ks[4], (c,)) * 0.1
    return geom, x, w1, b1, w2, b2


@pytest.mark.parametrize("h,w,c,act,aligned", [
    (32, 48, 8, "relu", False),
    (32, 48, 8, "elu", False),
    (64, 96, 16, "relu", False),
    (32, 64, 8, "relu", True),
    (32, 64, 8, "elu", True),
    (64, 128, 16, "relu", True),
])
def test_fused_forward_matches_composition(h, w, c, act, aligned):
    geom, x, w1, b1, w2, b2 = _setup(h, w, c, act, aligned=aligned)
    got = flat_res_block(x, w1, b1, w2, b2, geom, act)
    ref = flat_res_block_reference(x, w1, b1, w2, b2, geom, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("h,w,c,act,aligned", [
    (32, 48, 8, "relu", False),
    (32, 48, 8, "elu", False),
    (32, 64, 8, "relu", True),
    (32, 64, 8, "elu", True),
])
def test_fused_grads_match_composition(h, w, c, act, aligned):
    geom, x, w1, b1, w2, b2 = _setup(h, w, c, act, key=7, aligned=aligned)
    cw = jax.random.normal(jax.random.PRNGKey(9), (2, c, geom.LB))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, geom, act) * cw)

    g_got = jax.grad(loss(flat_res_block), argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    g_ref = jax.grad(loss(flat_res_block_reference), argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    for got, ref, name in zip(g_got, g_ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3,
            err_msg=f"grad wrt {name}",
        )


def test_fused_gate_calibration(monkeypatch):
    """The fused-kernel gate tracks the on-chip scoped-VMEM measurements.

    Measured Mosaic compile outcomes (v5e, jax 0.9): bf16@512^2 fits at
    tile 32; f32@512^2 OOMs at every valid tile (17.19M scoped at t=16);
    bf16@1024^2 OOMs at t=32 but its geometry admits t=16.  Rejected
    shapes must fall back to the two-conv path, so the gate returning
    False is load-bearing, not an optimization detail.
    """
    import msau_tpu.ops.flatres as fr
    from msau_tpu.ops.flatconv import choose_geom

    monkeypatch.setattr(fr, "_use_interpret", lambda: False)
    g_bf16_512 = choose_geom(512, 512, itemsize=2, max_cin=17)
    g_f32_512 = choose_geom(512, 512, itemsize=4, max_cin=17)
    g_bf16_1024 = choose_geom(1024, 1024, itemsize=2, max_cin=17)
    assert fr.fused_res_supported(g_bf16_512, 8, 3, 2, "relu", 2)
    assert not fr.fused_res_supported(g_f32_512, 8, 3, 2, "relu", 4)
    # 1024^2 bf16 is admitted only because its geometry (P=4) allows the
    # 16-row tile; the t=32-only P=2 geometry would be rejected
    assert fr.fused_res_supported(g_bf16_1024, 8, 3, 2, "relu", 2)
    bwd = fr._FusedPlan(g_bf16_1024, 8, 2, halo=4)
    assert bwd.tile == 16
