"""Morphology + CCL parity tests against scipy (the reference's backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from msau_tpu.ops import morphology as mm
from msau_tpu.ops.ccl import connected_components_jax, component_stats, top_k_components

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def rand_mask(rng, h=40, w=56, p=0.35):
    return (rng.random((h, w)) < p)


class TestMorphology:
    @pytest.mark.parametrize("size", [(1, 3), (3, 3), (2, 4), 3])
    def test_dilation_matches_scipy(self, rng, size):
        img = rng.random((30, 41)).astype(np.float32)
        want = scipy_ndimage.maximum_filter(img, size, mode="constant")
        got = np.asarray(mm.r_dilation(jnp.asarray(img), size))
        np.testing.assert_allclose(got, want)

    @pytest.mark.parametrize("size", [(1, 3), (3, 3), (2, 4)])
    def test_erosion_matches_scipy(self, rng, size):
        img = rng.random((23, 37)).astype(np.float32)
        want = scipy_ndimage.minimum_filter(img, size, mode="constant")
        got = np.asarray(mm.r_erosion(jnp.asarray(img), size))
        np.testing.assert_allclose(got, want)

    def test_closing_bool_matches_reference_def(self, rng):
        """r_closing = dilation then erosion, both origin 0 (morph_util.py:81-84)."""
        img = rand_mask(rng)
        want = scipy_ndimage.minimum_filter(
            scipy_ndimage.maximum_filter(img, (1, 3), mode="constant"),
            (1, 3),
            mode="constant",
        )
        got = np.asarray(mm.r_closing(jnp.asarray(img), (1, 3)))
        np.testing.assert_array_equal(got, want)

    def test_opening(self, rng):
        img = rand_mask(rng)
        want = scipy_ndimage.maximum_filter(
            scipy_ndimage.minimum_filter(img, (3, 3), mode="constant"),
            (3, 3),
            mode="constant",
        )
        got = np.asarray(mm.r_opening(jnp.asarray(img), (3, 3)))
        np.testing.assert_array_equal(got, want)


class TestCCL:
    def _check_equivalent(self, mask):
        """Same partition into components + same raster ordering as scipy."""
        got = np.asarray(connected_components_jax(jnp.asarray(mask)))
        want, n = scipy_ndimage.label(mask)  # 4-connectivity default
        assert (got > 0).sum() == (want > 0).sum()
        # bijection between label sets
        pairs = set(zip(got[mask].tolist(), want[mask].tolist()))
        assert len({g for g, _ in pairs}) == n
        assert len({w for _, w in pairs}) == n
        assert len(pairs) == n
        # our roots sorted ascending = scipy label order (raster-first pixel)
        order = sorted(pairs)
        assert [w for _, w in order] == list(range(1, n + 1))

    def test_random_masks(self, rng):
        for p in (0.2, 0.45, 0.7):
            self._check_equivalent(rand_mask(rng, 48, 64, p))

    def test_spiral_component(self):
        """A spiral needs multiple sweeps — exercises the while_loop."""
        h = w = 21
        mask = np.zeros((h, w), bool)
        mask[0, :] = True
        mask[:, -1] = True
        mask[-1, :] = True
        mask[2:, 0] = True
        mask[2, 2 : w - 2] = True
        mask[2 : h - 2, 2] = True
        self._check_equivalent(mask)

    def test_empty_and_full(self):
        self._check_equivalent(np.zeros((8, 8), bool))
        self._check_equivalent(np.ones((8, 8), bool))

    def test_dense_spiral_converges_within_log_iters(self):
        """A full-size boustrophedon snake has O(H) geodesic turns — scan
        sweeps alone would blow past any reasonable cap; the periodic
        pointer jump must still reach the exact scipy fixpoint within the
        default max_iters."""
        h = w = 96
        mask = np.ones((h, w), bool)
        # serpentine walls: every other row is cut on alternating sides,
        # leaving ONE snake component with ~h/2 turns
        for r in range(1, h, 2):
            if (r // 2) % 2 == 0:
                mask[r, : w - 1] = False
            else:
                mask[r, 1:] = False
        self._check_equivalent(mask)

    def test_multiclass_maze_converges(self, rng):
        """Maze-like multiclass map (untrained-argmax worst case): exact
        scipy partition per class within default max_iters."""
        from msau_tpu.ops.ccl import connected_components_multiclass

        cls = rng.integers(0, 3, (96, 96)).astype(np.int32)
        got = np.asarray(connected_components_multiclass(jnp.asarray(cls)))
        for c in (1, 2):
            m = cls == c
            want, n = scipy_ndimage.label(m)
            pairs = set(zip(got[m].tolist(), want[m].tolist()))
            assert len(pairs) == n
            assert len({g for g, _ in pairs}) == n

    def test_multiclass_matches_per_class_scipy(self, rng):
        """One shared labeling == per-class scipy labelings (partitions and
        raster-first root convention)."""
        from msau_tpu.ops.ccl import connected_components_multiclass

        for p in (0.3, 0.6):
            cls = np.where(
                rng.random((48, 64)) < p, rng.integers(1, 5, (48, 64)), 0
            ).astype(np.int32)
            got = np.asarray(connected_components_multiclass(jnp.asarray(cls)))
            assert (got[cls == 0] == 0).all()
            for c in range(1, 5):
                m = cls == c
                want, n = scipy_ndimage.label(m)
                pairs = set(zip(got[m].tolist(), want[m].tolist()))
                assert len(pairs) == n
                assert len({g for g, _ in pairs}) == n
                # touching different-class pixels never merge
                assert set(np.unique(got[m])) .isdisjoint(np.unique(got[(cls > 0) & ~m]))

    def test_multiclass_adjacent_classes_stay_separate(self):
        from msau_tpu.ops.ccl import connected_components_multiclass

        cls = np.zeros((6, 10), np.int32)
        cls[:, :5] = 1
        cls[:, 5:] = 2
        got = np.asarray(connected_components_multiclass(jnp.asarray(cls)))
        assert len(np.unique(got[cls == 1])) == 1
        assert len(np.unique(got[cls == 2])) == 1
        assert got[0, 0] != got[0, 9]

    def test_stats_match_find_objects(self, rng):
        mask = rand_mask(rng, 32, 32, 0.4)
        labels = np.asarray(connected_components_jax(jnp.asarray(mask)))
        stats = {k: np.asarray(v) for k, v in component_stats(jnp.asarray(labels)).items()}
        want_labels, n = scipy_ndimage.label(mask)
        objects = scipy_ndimage.find_objects(want_labels)
        roots = sorted(set(labels[mask].tolist()))
        assert len(roots) == n
        for scipy_id, root in enumerate(roots, start=1):
            sl = objects[scipy_id - 1]
            assert stats["y1"][root] == sl[0].start
            assert stats["y2"][root] == sl[0].stop
            assert stats["x1"][root] == sl[1].start
            assert stats["x2"][root] == sl[1].stop
            assert stats["count"][root] == (want_labels == scipy_id).sum()
            assert stats["bbox_area"][root] == (
                (sl[0].stop - sl[0].start) * (sl[1].stop - sl[1].start)
            )

    def test_top_k(self, rng):
        mask = np.zeros((20, 20), bool)
        mask[1:3, 1:10] = True    # bbox area 18
        mask[6:12, 2:5] = True    # bbox area 18
        mask[15:16, 15:16] = True # bbox area 1
        labels = connected_components_jax(jnp.asarray(mask))
        top = {k: np.asarray(v) for k, v in top_k_components(component_stats(labels), k=4).items()}
        assert top["valid"].sum() == 3
        assert list(top["bbox_area"][:3]) == [18, 18, 1]


def test_fused_masked_ce_matches_generic():
    """ops/ce_loss.py fused path == the generic log-softmax path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msau_tpu.train.loss import masked_cross_entropy

    n, c, L = 2, 5, 1536
    logits = jax.random.normal(jax.random.PRNGKey(0), (n, c, L))
    aux = jax.random.normal(jax.random.PRNGKey(1), (n, c, L))
    labels = jax.random.randint(jax.random.PRNGKey(2), (n, L), 0, c)
    valid = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (n, L))

    loss1, m1 = masked_cross_entropy(logits, aux, labels, valid,
                                     channel_axis=1)
    # oracle: same math through the generic 4-D branch
    loss2, m2 = masked_cross_entropy(
        logits[..., None], aux[..., None], labels[..., None],
        valid[..., None], channel_axis=1)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    np.testing.assert_allclose(float(m1["accuracy"]),
                               float(m2["accuracy"]), rtol=1e-6)

    g1 = jax.grad(lambda lg: masked_cross_entropy(
        lg, aux, labels, valid, channel_axis=1)[0])(logits)
    g2 = jax.grad(lambda lg: masked_cross_entropy(
        lg[..., None], aux[..., None], labels[..., None],
        valid[..., None], channel_axis=1)[0])(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_ccl_multiclass_pallas_matches_xla():
    """VMEM-resident CCL kernel vs the XLA while_loop path."""
    import numpy as np

    from msau_tpu.ops.ccl import (
        connected_components_multiclass,
        connected_components_multiclass_pallas,
    )

    rng = np.random.default_rng(0)
    for h, w in ((64, 128), (32, 256)):
        # blobby multi-class map: upsampled random classes
        coarse = rng.integers(0, 4, (h // 8, w // 8))
        cls = jnp.asarray(np.repeat(np.repeat(coarse, 8, 0), 8, 1),
                          jnp.int32)
        a = np.asarray(connected_components_multiclass(cls, max_iters=64))
        b = np.asarray(
            connected_components_multiclass_pallas(cls, max_iters=64))
        np.testing.assert_array_equal(a, b)
        # noisy map (many small components)
        cls2 = jnp.asarray(rng.integers(0, 3, (h, w)), jnp.int32)
        a2 = np.asarray(connected_components_multiclass(cls2,
                                                        max_iters=128))
        b2 = np.asarray(
            connected_components_multiclass_pallas(cls2, max_iters=128))
        np.testing.assert_array_equal(a2, b2)
