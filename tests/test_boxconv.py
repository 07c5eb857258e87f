"""Box convolution tests: parity vs naive box sums, coordinate gradients,
BMSAU model forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msau_tpu.ops.boxconv import box_conv2d, integral_image


def naive_box_filter(x, y1, y2, x1, x2, normalize=True):
    """O(HW * boxarea) reference for integer box coords, zero padding."""
    n, h, w, c = x.shape
    b = y1.shape[1]
    out = np.zeros((n, h, w, c * b), np.float32)
    for ci in range(c):
        for bi in range(b):
            a1, a2 = int(y1[ci, bi]), int(y2[ci, bi])
            b1, b2 = int(x1[ci, bi]), int(x2[ci, bi])
            for i in range(h):
                for j in range(w):
                    i1, i2 = max(i + a1, 0), min(i + a2, h - 1)
                    j1, j2 = max(j + b1, 0), min(j + b2, w - 1)
                    s = 0.0
                    if i1 <= i2 and j1 <= j2:
                        s = x[:, i1 : i2 + 1, j1 : j2 + 1, ci].sum(axis=(1, 2))
                    if normalize:
                        s = s / ((a2 - a1 + 1) * (b2 - b1 + 1))
                    out[:, i, j, ci * b + bi] = s
    return out


class TestIntegralImage:
    def test_exclusive_prefix(self, rng):
        x = rng.random((1, 5, 7, 2)).astype(np.float32)
        ii = np.asarray(integral_image(jnp.asarray(x)))
        assert ii.shape == (1, 6, 8, 2)
        np.testing.assert_allclose(ii[0, 0], 0)
        np.testing.assert_allclose(ii[0, :, 0], 0)
        np.testing.assert_allclose(ii[0, 5, 7, 0], x[0, :, :, 0].sum(), rtol=1e-5)
        np.testing.assert_allclose(ii[0, 3, 2, 1], x[0, :3, :2, 1].sum(), rtol=1e-5)


class TestBoxConv:
    def test_matches_naive_integer_boxes(self, rng):
        n, h, w, c, b = 2, 10, 12, 3, 2
        x = rng.random((n, h, w, c)).astype(np.float32)
        y1 = rng.integers(-3, 0, (c, b)).astype(np.float32)
        y2 = rng.integers(0, 4, (c, b)).astype(np.float32)
        x1 = rng.integers(-3, 0, (c, b)).astype(np.float32)
        x2 = rng.integers(0, 4, (c, b)).astype(np.float32)
        want = naive_box_filter(x, y1, y2, x1, x2)
        got = np.asarray(
            box_conv2d(
                jnp.asarray(x), jnp.asarray(y1), jnp.asarray(y2),
                jnp.asarray(x1), jnp.asarray(x2), max_h=6, max_w=6,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_gradient_wrt_box_coords(self, rng):
        """Finite-difference check of d(loss)/d(y_max): the analytic gradient
        through bilinear blending must match the boundary-integral value."""
        n, h, w, c, b = 1, 8, 8, 1, 1
        x = jnp.asarray(rng.random((n, h, w, c)), jnp.float32)
        y1 = jnp.asarray([[-1.0]]); x1 = jnp.asarray([[-1.0]]); x2 = jnp.asarray([[1.0]])

        def loss(y2v):
            out = box_conv2d(x, y1, jnp.asarray([[y2v]]), x1, x2,
                             max_h=4, max_w=4, normalize=False)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(1.3)
        eps = 1e-3
        fd = (loss(1.3 + eps) - loss(1.3 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)

    def test_input_gradient_flows(self, rng):
        x = jnp.asarray(rng.random((1, 6, 6, 2)), jnp.float32)
        y1 = jnp.asarray([[-1.0], [0.0]]); y2 = jnp.asarray([[1.0], [1.5]])
        x1 = jnp.asarray([[-1.0], [-2.0]]); x2 = jnp.asarray([[1.0], [0.5]])

        g = jax.grad(
            lambda x: jnp.sum(
                box_conv2d(x, y1, y2, x1, x2, max_h=4, max_w=4) ** 2
            )
        )(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestBMSAU:
    @pytest.mark.slow
    def test_forward_and_grad(self, rng):
        from msau_tpu.config import ModelConfig
        from msau_tpu.models.msau import build_model

        cfg = ModelConfig(
            model="msau_box", img_channels=5, n_class=4, scale_space_num=2,
            res_depth=1, feat_root=4, num_blocks=2,
            num_box_convs=1, num_box_per_channel=2, max_box_size=6,
        )
        model = build_model(cfg)
        x = jnp.asarray(rng.random((1, 16, 16, 5)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        probs, logits, aux = model.apply(params, x)
        assert logits.shape == (1, 16, 16, 4)
        # box params exist and receive gradients
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x)[1] ** 2))(params)
        leaves = jax.tree_util.tree_flatten_with_path(g)[0]
        box_grads = [v for k, v in leaves if "box_conv" in jax.tree_util.keystr(k) and ("ybox" in jax.tree_util.keystr(k) or "xbox" in jax.tree_util.keystr(k))]
        assert box_grads, "no box coordinate gradients found"
        assert any(np.abs(np.asarray(v)).max() > 0 for v in box_grads)
