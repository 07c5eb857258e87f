"""Tests for SparseConv, CSPN propagation, separable RNN, corner targets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msau_tpu.models.extras import (
    SeparableRNNBlock,
    SparseConv,
    affinity_propagate,
)
from msau_tpu.data import corners


class TestSparseConv:
    def test_masked_normalization(self, rng):
        x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
        mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
        m = SparseConv(features=4)
        params = m.init(jax.random.PRNGKey(0), x, mask)
        out, new_mask = m.apply(params, x, mask)
        assert out.shape == (1, 8, 8, 4)
        assert new_mask.shape == (1, 8, 8, 1)
        # mask dilates under maxpool-forward
        assert float(new_mask.sum()) >= float(mask.sum())

    def test_scale_invariance_to_sparsity(self, rng):
        """With a uniform kernel and constant input, the count-normalized
        output on valid pixels is independent of how many neighbors are
        masked (the sparsity-invariance property)."""
        x = jnp.ones((1, 9, 9, 1))
        m = SparseConv(features=1)
        full = jnp.ones((1, 9, 9, 1))
        sparse = jnp.zeros((1, 9, 9, 1)).at[:, ::2, ::2].set(1.0)
        params = m.init(jax.random.PRNGKey(1), x, full)
        params = jax.tree_util.tree_map(jnp.ones_like, params)  # uniform kernel
        out_full, _ = m.apply(params, x, full)
        out_sparse, _ = m.apply(params, x * sparse, sparse)
        np.testing.assert_allclose(
            np.asarray(out_full[0, 4, 4]), np.asarray(out_sparse[0, 4, 4]), rtol=1e-5
        )

    def test_auto_mask(self, rng):
        x = jnp.asarray(rng.random((1, 6, 6, 2)), jnp.float32)
        m = SparseConv(features=3)
        params = m.init(jax.random.PRNGKey(0), x)
        out, mask = m.apply(params, x)
        assert mask.shape == (1, 6, 6, 1)


class TestCSPN:
    def test_propagation_smooths_toward_guided_neighbors(self, rng):
        g = jnp.asarray(rng.random((1, 10, 10, 8)), jnp.float32)
        blur = jnp.asarray(rng.random((1, 10, 10, 1)), jnp.float32)
        out = affinity_propagate(g, blur, num_layers=4)
        assert out.shape == blur.shape
        assert bool(jnp.isfinite(out).all())

    def test_sparse_anchors_preserved(self, rng):
        g = jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)
        blur = jnp.zeros((1, 8, 8, 1))
        sparse = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(5.0)
        out = affinity_propagate(g, blur, sparse, num_layers=3)
        assert float(out[0, 3, 3, 0]) == 5.0  # anchor re-blended each step


class TestSeparableRNN:
    def test_identity_default(self, rng):
        x = jnp.asarray(rng.random((1, 4, 6, 3)), jnp.float32)
        m = SeparableRNNBlock(features=3)
        params = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(m.apply(params, x)), np.asarray(x))

    def test_real_rnn_shapes(self, rng):
        x = jnp.asarray(rng.random((2, 4, 5, 3)), jnp.float32)
        m = SeparableRNNBlock(features=6, identity=False)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 4, 5, 6)


class TestCorners:
    def test_gaussian_radius_positive(self):
        assert corners.gaussian_radius((10, 20), 0.7) > 0

    def test_draw_gaussian_peak(self):
        hm = np.zeros((20, 20), np.float32)
        corners.draw_gaussian(hm, (10, 5), 2)
        assert hm[5, 10] == 1.0
        assert hm[5, 12] < 1.0
        # max-blend: drawing twice keeps peak at 1
        corners.draw_gaussian(hm, (10, 5), 2)
        assert hm.max() == 1.0

    def test_corner_targets(self):
        boxes = {
            0: ([10, 10, 50, 30], 1, "a", None, [[0, 1]]),
            1: ([60, 10, 100, 30], 2, "b", None, [[0, 1]]),
        }
        out = corners.corner_targets(boxes, (100, 120), (50, 60))
        assert out["heat_tl"].shape == (50, 60, 3)
        assert out["heat_tl"].max() == 1.0
        # edge (0,1) yields one tag from box 0; box 1's copy self-targets
        assert out["tag_len"] == 1
        assert out["tags_mask"].sum() == 1
        # tags index flattened positions within bounds
        assert out["tags_tl"].max() < 50 * 60
