"""Unit tests for the layer library: SAME padding semantics, LRN, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msau_tpu.models import layers


class TestSamePadding:
    """XLA 'SAME' must reproduce TF-SAME (reference model/layers/utils.py:5-28)."""

    @pytest.mark.parametrize("h,w", [(17, 23), (16, 16), (31, 7)])
    @pytest.mark.parametrize("k", [3, 4])
    def test_conv_same_output_shape(self, h, w, k):
        x = jnp.zeros((1, h, w, 3))
        m = layers.ConvBnLrnDrop(features=5, kernel_size=(k, k), activation=None)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, h, w, 5)

    @pytest.mark.parametrize("h,w,rate", [(20, 20, 2), (17, 23, 4), (9, 9, 8)])
    def test_dilated_same_output_shape(self, h, w, rate):
        x = jnp.zeros((1, h, w, 3))
        m = layers.DilConvBnLrnDrop(features=4, rate=rate, activation=None, use_lrn=False)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, h, w, 4)

    def test_same_pad_asymmetry_even_kernel(self):
        """For k=4 stride=1, TF pads (1 top, 2 bottom): a delta at [0,0] must
        see kernel taps consistent with pad_top=1."""
        # build a conv with identity-like kernel to probe padding placement
        x = np.zeros((1, 5, 5, 1), np.float32)
        x[0, 0, 0, 0] = 1.0
        m = layers.ConvBnLrnDrop(features=1, kernel_size=(4, 4), activation=None)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # one-hot kernel at tap (0,0): output[i,j] = x[i-1, j-1] (pad_top=1)
        kernel = np.zeros((4, 4, 1, 1), np.float32)
        kernel[0, 0, 0, 0] = 1.0
        params = jax.tree_util.tree_map(lambda a: a, params)
        params = {
            "params": {
                "Conv_0": {
                    "kernel": jnp.asarray(kernel),
                    "bias": jnp.zeros((1,)),
                }
            }
        }
        y = np.asarray(m.apply(params, jnp.asarray(x)))
        # x[i-1, j-1] => delta moves to (1, 1)
        assert y[0, 1, 1, 0] == 1.0
        assert y.sum() == 1.0


class TestLRN:
    def test_matches_torch_lrn(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
        got = np.asarray(layers.local_response_norm(jnp.asarray(x), size=8))
        x_t = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        want = torch.nn.LocalResponseNorm(8)(x_t).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_matches_torch_lrn_partial_window(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 4, 4, 16)).astype(np.float32) * 3
        got = np.asarray(layers.local_response_norm(jnp.asarray(x), size=5))
        x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.nn.LocalResponseNorm(5)(x_t).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestResidualBlock:
    def test_shape_and_residual(self):
        x = jnp.ones((1, 8, 8, 4))
        m = layers.MultiConvResidualBlock(res_depth=2, filter_size=3, channels=4)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        # relu output must be non-negative
        assert np.asarray(y).min() >= 0.0


class TestDeconv:
    @pytest.mark.parametrize("in_hw,target", [((8, 8), (16, 16)), ((9, 8), (17, 15))])
    def test_exact_target_shape(self, in_hw, target):
        x = jnp.zeros((1, *in_hw, 6))
        m = layers.DeconvBnLrnDrop(features=3)
        params = m.init(jax.random.PRNGKey(0), x, target)
        y = m.apply(params, x, target)
        assert y.shape == (1, *target, 3)
