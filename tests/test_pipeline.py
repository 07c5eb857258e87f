"""Pipeline + augmentation tests."""

import os
import time

import numpy as np
import jax.numpy as jnp
import pytest

from msau_tpu.config import DataConfig
from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import load_funsd_page
from msau_tpu.data.pipeline import ChargridProvider
from msau_tpu.data import augment

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "funsd_sample.json")


class TestProvider:
    def test_produces_batches_and_stops_cleanly(self):
        page = load_funsd_page(FIXTURE)
        cs = Charset.from_corpus(page.corpus())
        cfg = DataConfig(buckets=(256,), num_workers=2, prefetch=1)
        with ChargridProvider([FIXTURE] * 4, [FIXTURE], cs, cfg) as prov:
            assert prov.size_val == 1
            b = prov.next_data("train")
            assert b["input"].shape[0] == 1
            assert b["input"].shape[1:3] == (256, 256)
            assert b["input"].shape[-1] == cs.n_token + 2
            v = prov.next_data("val")
            assert v is not None
            # a few more pulls to exercise queue cycling
            for _ in range(3):
                assert prov.next_data("train") is not None
        # after context exit, all workers joined
        import threading

        assert not any(t.name.startswith("chargrid-") and t.is_alive()
                       for t in threading.enumerate())

    def test_malformed_page_skipped(self, tmp_path):
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        page = load_funsd_page(FIXTURE)
        cs = Charset.from_corpus(page.corpus())
        cfg = DataConfig(buckets=(256,), num_workers=1, prefetch=1)
        with ChargridProvider([str(bad), FIXTURE], None, cs, cfg) as prov:
            got = prov.next_data("train")
            assert got is not None  # served the good page despite the bad one


class TestAugment:
    def test_identity_affine_is_noop(self, rng):
        stack = (rng.random((40, 40, 4)) > 0.7).astype(np.float32)
        m = np.float32([[1, 0, 0], [0, 1, 0]])
        out = np.asarray(augment.apply_affine(jnp.asarray(stack), jnp.asarray(m)))
        np.testing.assert_allclose(out, stack, atol=1e-6)

    def test_affine_preserves_mass_roughly(self, rng):
        stack = np.zeros((64, 64, 2), np.float32)
        stack[20:40, 20:40, 1] = 1.0
        out = augment.augment_stack(
            jnp.asarray(stack), np.random.default_rng(0),
            affine=True, affine_value=0.02,
        )
        out = np.asarray(out)
        assert 0.5 * stack[..., 1].sum() < out[..., 1].sum() < 2.0 * stack[..., 1].sum()

    def test_elastic_runs_and_binarizes(self, rng):
        stack = (rng.random((50, 60, 3)) > 0.5).astype(np.float32)
        out = np.asarray(
            augment.augment_stack(
                jnp.asarray(stack), np.random.default_rng(1),
                elastic=True, elastic_value_x=0.002, elastic_value_y=0.002,
            )
        )
        assert set(np.unique(out)).issubset({0.0, 1.0})

    def test_rebinarize_one_hot_exclusive(self, rng):
        t = rng.random((16, 16, 4)).astype(np.float32)
        out = np.asarray(augment.rebinarize_one_hot(jnp.asarray(t), 1))
        sums = out.sum(-1)
        np.testing.assert_array_equal(np.unique(sums), [1.0])
        # dominating channel kept wherever it was above threshold
        dom = t[..., 1] > augment.BINARIZE_THRESHOLD
        np.testing.assert_array_equal(out[..., 1] > 0, dom)
