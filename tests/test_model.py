"""Model topology tests: shapes, coupling, aux head, attention semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msau_tpu.config import ModelConfig
from msau_tpu.models.attention import self_attention_xla, self_attention_pallas
from msau_tpu.models.msau import MSAUWrapper, build_model


def tiny_config(**kw):
    base = dict(
        img_channels=7,
        n_class=5,
        scale_space_num=3,
        res_depth=1,
        feat_root=4,
        filter_size=3,
        pool_size=2,
        final_act="softmax",
        num_blocks=3,
    )
    base.update(kw)
    return ModelConfig(**base)


class TestMSAUShapes:
    @pytest.mark.parametrize("hw", [(32, 32), (40, 24)])
    def test_forward_shapes(self, hw):
        cfg = tiny_config()
        model = build_model(cfg)
        x = jnp.zeros((1, *hw, cfg.img_channels))
        params = model.init(jax.random.PRNGKey(0), x)
        probs, logits, aux = model.apply(params, x)
        assert probs.shape == (1, *hw, cfg.n_class)
        assert logits.shape == (1, *hw, cfg.n_class)
        assert aux.shape == (1, *hw, cfg.n_class)
        # softmax head sums to 1
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    def test_odd_resolution(self):
        """Non-power-of-two inputs must round-trip through pool/deconv exactly."""
        cfg = tiny_config(scale_space_num=4)
        model = build_model(cfg)
        x = jnp.zeros((1, 37, 51, cfg.img_channels))
        params = model.init(jax.random.PRNGKey(0), x)
        _, logits, _ = model.apply(params, x)
        assert logits.shape == (1, 37, 51, cfg.n_class)

    def test_funsd_entrypoint_config(self):
        """The entry-A configuration (train_chargrid_funsd_msau.py:211-214)."""
        cfg = tiny_config(scale_space_num=4, res_depth=2, feat_root=8)
        model = build_model(cfg)
        x = jnp.zeros((1, 64, 64, cfg.img_channels))
        params = model.init(jax.random.PRNGKey(0), x)
        probs, logits, aux = model.apply(params, x)
        assert logits.shape == (1, 64, 64, cfg.n_class)

    def test_aux_is_penultimate_stage(self):
        """aux logits come from stage num_blocks-2, so with num_blocks=2 the
        aux head is stage 0's output and must differ from the final logits."""
        cfg = tiny_config(num_blocks=2)
        model = build_model(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, cfg.img_channels))
        params = model.init(jax.random.PRNGKey(0), x)
        _, logits, aux = model.apply(params, x)
        assert not np.allclose(np.asarray(logits), np.asarray(aux))

    def test_single_block_unet(self):
        cfg = tiny_config(num_blocks=1)
        model = build_model(cfg)
        x = jnp.zeros((1, 16, 16, cfg.img_channels))
        params = model.init(jax.random.PRNGKey(0), x)
        _, logits, aux = model.apply(params, x)
        assert logits.shape == aux.shape == (1, 16, 16, cfg.n_class)

    def test_grad_flows(self):
        cfg = tiny_config(scale_space_num=2, num_blocks=2)
        model = build_model(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cfg.img_channels))
        params = model.init(jax.random.PRNGKey(0), x)

        def loss_fn(p):
            _, logits, aux = model.apply(p, x)
            return jnp.sum(logits ** 2) + jnp.sum(aux ** 2)

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # at least one grad is non-zero
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


class TestAttention:
    def test_pallas_path_matches_xla(self):
        rng = np.random.default_rng(0)
        n, t, cb, c = 2, 1024, 4, 32
        f = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
        want = np.asarray(self_attention_xla(f, g, h))
        got = np.asarray(self_attention_pallas(f, g, h, block_q=256))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_transposed_softmax_semantics(self):
        """Reference semantics: softmax over f-axis; out = beta^T @ h."""
        n, t, cb, c = 1, 4, 2, 3
        rng = np.random.default_rng(1)
        f = rng.standard_normal((n, t, cb)).astype(np.float32)
        g = rng.standard_normal((n, t, cb)).astype(np.float32)
        h = rng.standard_normal((n, t, c)).astype(np.float32)
        s = np.einsum("nic,njc->nij", g, f)
        beta = np.exp(s - s.max(-1, keepdims=True))
        beta = beta / beta.sum(-1, keepdims=True)
        want = np.einsum("nij,nic->njc", beta, h)
        got = np.asarray(self_attention_xla(jnp.asarray(f), jnp.asarray(g), jnp.asarray(h)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestConfigRoundTrip:
    def test_model_kwargs_compat(self):
        ref_kwargs = dict(
            model="msau", final_act="softmax", featRoot=8, scale_space_num=4,
            res_depth=2, n_class=5, img_channels=100, use_auxiliary_loss=False,
        )
        cfg = ModelConfig.from_model_kwargs(ref_kwargs)
        assert cfg.feat_root == 8
        assert cfg.scale_space_num == 4
        assert cfg.n_class == 5
        out = cfg.to_model_kwargs()
        for k, v in ref_kwargs.items():
            assert out[k] == v

    def test_full_config_json(self, tmp_path):
        from msau_tpu.config import Config

        cfg = Config()
        cfg.model.feat_root = 16
        p = tmp_path / "config.json"
        cfg.save(str(p))
        cfg2 = Config.load(str(p))
        assert cfg2.model.feat_root == 16
        assert cfg2.data.buckets == cfg.data.buckets
