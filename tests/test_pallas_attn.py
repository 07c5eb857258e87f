"""Fused Pallas attention parity with the XLA einsum path (interpret mode)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from msau_tpu.models.attention import self_attention_xla
from msau_tpu.ops.pallas_attn import fused_attention


class TestFusedAttention:
    @pytest.mark.parametrize("t,cb,c", [(512, 8, 64), (256, 4, 16)])
    def test_matches_xla(self, rng, t, cb, c):
        n = 2
        f = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
        want = np.asarray(self_attention_xla(f, g, h))
        got = np.asarray(fused_attention(f, g, h, block=256, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_gradients_match_xla(self, rng):
        """Custom VJP vs autodiff through the einsum reference."""
        import jax

        n, t, cb, c = 1, 512, 4, 8
        f = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)

        def loss_fused(f, g, h):
            return jnp.sum(fused_attention(f, g, h, block=256, interpret=True) ** 2)

        def loss_xla(f, g, h):
            return jnp.sum(self_attention_xla(f, g, h) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(f, g, h)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(f, g, h)
        for a, b, name in zip(gf, gx, "fgh"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                err_msg=f"grad d{name}",
            )

    def test_large_logits_stable(self, rng):
        """Online softmax must survive large score magnitudes."""
        n, t, cb, c = 1, 256, 4, 8
        f = jnp.asarray(rng.standard_normal((n, t, cb)) * 30, jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)) * 30, jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
        got = np.asarray(fused_attention(f, g, h, block=256, interpret=True))
        assert np.isfinite(got).all()
        want = np.asarray(self_attention_xla(f, g, h))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestResidentAttention:
    """Whole-operand VMEM-resident exact-softmax kernel (v2)."""

    @pytest.mark.parametrize("t,cb,c", [(256, 4, 8), (512, 8, 64)])
    def test_matches_xla(self, rng, t, cb, c):
        from msau_tpu.ops.pallas_attn import resident_attention

        n = 2
        f = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
        got = np.asarray(resident_attention(f, g, h, interpret=True))
        want = np.asarray(self_attention_xla(f, g, h))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_gradients_match_xla(self, rng):
        from msau_tpu.ops.pallas_attn import resident_attention

        n, t, cb, c = 1, 512, 4, 8
        f = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)

        def loss_res(f, g, h):
            return jnp.sum(resident_attention(f, g, h, interpret=True) ** 2)

        def loss_xla(f, g, h):
            return jnp.sum(self_attention_xla(f, g, h) ** 2)

        gr = jax.grad(loss_res, argnums=(0, 1, 2))(f, g, h)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(f, g, h)
        for a, b, name in zip(gr, gx, "fgh"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                err_msg=f"grad d{name}")

    def test_large_logits_stable(self, rng):
        from msau_tpu.ops.pallas_attn import resident_attention

        n, t, cb, c = 1, 256, 4, 8
        f = jnp.asarray(rng.standard_normal((n, t, cb)) * 30, jnp.float32)
        g = jnp.asarray(rng.standard_normal((n, t, cb)) * 30, jnp.float32)
        h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
        got = np.asarray(resident_attention(f, g, h, interpret=True))
        assert np.isfinite(got).all()
        want = np.asarray(self_attention_xla(f, g, h))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
