"""Pallas kernel tests in interpreter mode (CPU CI; the same kernels are
benchmarked on hardware — see BENCHNOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmdx.kernels.attention import _xla_attention, dot_product_attention
from gmdx.kernels.flash_attention import flash_attention
from gmdx.kernels.groupnorm import fused_group_norm_silu


class TestFlashAttention:
    def test_self_attention_matches_xla(self):
        q = jax.random.normal(jax.random.key(0), (2, 256, 4, 40))
        out = flash_attention(q, q, q, interpret=True)
        ref = _xla_attention(q, q, q, 40**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_cross_attention_masked_tail(self):
        """Sk=77 needs key masking (padded to 128); parity with XLA."""
        q = jax.random.normal(jax.random.key(0), (1, 64, 2, 40))
        k = jax.random.normal(jax.random.key(1), (1, 77, 2, 40))
        v = jax.random.normal(jax.random.key(2), (1, 77, 2, 40))
        out = flash_attention(q, k, v, interpret=True)
        ref = _xla_attention(q, k, v, 40**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_multiblock_k(self):
        """Sk spanning several 1024-wide key blocks exercises the online
        softmax correction."""
        q = jax.random.normal(jax.random.key(0), (1, 128, 2, 64))
        k = jax.random.normal(jax.random.key(1), (1, 2048, 2, 64)) * 4.0
        v = jax.random.normal(jax.random.key(2), (1, 2048, 2, 64))
        out = flash_attention(q, k, v, interpret=True)
        ref = _xla_attention(q, k, v, 64**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_grad_flows_through_dispatch(self):
        q = jax.random.normal(jax.random.key(0), (1, 32, 2, 8))

        def loss(q):
            return jnp.sum(dot_product_attention(q, q, q) ** 2)

        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestFlashAttentionBackward:
    """Pallas backward kernels (dQ / dK / dV) vs XLA autodiff grads."""

    @staticmethod
    def _grads(fn, q, k, v, g):
        out, vjp = jax.vjp(fn, q, k, v)
        return out, vjp(g)

    @pytest.mark.parametrize(
        "sq,sk,h,d",
        [
            (256, 256, 2, 40),  # block-aligned self-attention
            (300, 300, 2, 40),  # misaligned q and k (pad + mask paths)
            (128, 77, 2, 40),  # cross-attention with masked key tail
            (64, 2048, 1, 64),  # multi-block k (sequential dq accumulation)
            (640, 128, 2, 32),  # multi-block q (sequential dkv accumulation)
        ],
    )
    def test_matches_xla_grads(self, sq, sk, h, d):
        q = jax.random.normal(jax.random.key(0), (2, sq, h, d))
        k = jax.random.normal(jax.random.key(1), (2, sk, h, d))
        v = jax.random.normal(jax.random.key(2), (2, sk, h, d))
        g = jax.random.normal(jax.random.key(3), (2, sq, h, d))
        scale = d**-0.5

        out, (dq, dk, dv) = self._grads(
            lambda q, k, v: flash_attention(q, k, v, interpret=True), q, k, v, g
        )
        ref_out, (rdq, rdk, rdv) = self._grads(
            lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v, g
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), rtol=2e-3, atol=2e-3
        )
        for got, want, name in [(dq, rdq, "dq"), (dk, rdk, "dk"), (dv, rdv, "dv")]:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3,
                err_msg=name,
            )

    def test_xla_recompute_fallback_env(self, monkeypatch):
        """GMDX_FLASH_BWD=0 routes the backward through XLA recompute."""
        monkeypatch.setenv("GMDX_FLASH_BWD", "0")
        q = jax.random.normal(jax.random.key(0), (1, 128, 2, 40))
        g = jax.random.normal(jax.random.key(1), (1, 128, 2, 40))
        _, (dq, dk, dv) = self._grads(
            lambda q, k, v: flash_attention(q, k, v, interpret=True), q, q, q, g
        )
        _, (rdq, rdk, rdv) = self._grads(
            lambda q, k, v: _xla_attention(q, k, v, 40**-0.5), q, q, q, g
        )
        np.testing.assert_allclose(
            np.asarray(dq), np.asarray(rdq), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(dv), np.asarray(rdv), rtol=2e-3, atol=2e-3
        )


class TestFusedGroupNorm:
    @staticmethod
    def _ref(x, scale, bias, G, eps=1e-5, act=True):
        b, h, w, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, h * w, G, c // G)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
        y = y * scale + bias
        if act:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)

    @pytest.mark.parametrize(
        "shape,groups",
        [
            ((2, 8, 8, 128), 32),
            ((1, 16, 16, 256), 32),
            ((1, 8, 8, 1280), 32),
            # non-128-aligned channels: SD-1.5's 320-ch top level
            ((2, 8, 8, 320), 32),
        ],
    )
    def test_matches_reference(self, shape, groups):
        x = jax.random.normal(jax.random.key(0), shape) * 3 + 1
        scale = jax.random.normal(jax.random.key(1), (shape[-1],))
        bias = jax.random.normal(jax.random.key(2), (shape[-1],))
        got = fused_group_norm_silu(
            x, scale, bias, num_groups=groups, interpret=True
        )
        want = self._ref(x, scale, bias, groups)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_no_activation(self):
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 128))
        s, b = jnp.ones(128), jnp.zeros(128)
        got = fused_group_norm_silu(
            x, s, b, num_groups=32, activate=False, interpret=True
        )
        want = self._ref(x, s, b, 32, act=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_unsupported_shapes_fall_back(self):
        # 100 channels: not a lane multiple -> None (jnp path).
        assert fused_group_norm_silu(
            jnp.zeros((1, 4, 4, 100)), jnp.ones(100), jnp.zeros(100)
        ) is None


class TestGroupNormVJP:
    def test_grad_matches_jnp(self):
        """Fused GN is default-on in models now, so it must differentiate:
        backward recomputes through the jnp mirror."""
        from gmdx.kernels.groupnorm import _gn_silu_reference

        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 128))
        s = jax.random.normal(jax.random.key(1), (128,)) * 0.1 + 1.0
        b = jax.random.normal(jax.random.key(2), (128,)) * 0.1

        def loss_pallas(x, s, b):
            out = fused_group_norm_silu(
                x, s, b, num_groups=32, interpret=True
            )
            return jnp.sum(out ** 2)

        def loss_ref(x, s, b):
            return jnp.sum(_gn_silu_reference(x, s, b, 32, 1e-5, True) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, s, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
        for a, e in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-5
            )


class TestGroupNormPallasBackward:
    """The Pallas GN backward (reduce + apply kernels) vs jnp autodiff."""

    @pytest.mark.parametrize(
        "shape,activate",
        [
            ((2, 8, 8, 128), True),
            ((2, 8, 8, 320), True),  # non-lane-aligned channels
            ((1, 16, 16, 256), False),  # plain GN, no SiLU
            ((1, 4, 10, 1280), True),  # hw not a power of two
        ],
    )
    def test_grads_match_jnp(self, shape, activate):
        from gmdx.kernels.groupnorm import _gn_silu_reference

        x = jax.random.normal(jax.random.key(0), shape) * 2 + 0.5
        s = jax.random.normal(jax.random.key(1), (shape[-1],)) * 0.2 + 1.0
        b = jax.random.normal(jax.random.key(2), (shape[-1],)) * 0.2
        g = jax.random.normal(jax.random.key(3), shape)

        def out_pallas(x, s, b):
            return fused_group_norm_silu(
                x, s, b, num_groups=32, activate=activate, interpret=True
            )

        def out_ref(x, s, b):
            return _gn_silu_reference(x, s, b, 32, 1e-5, activate)

        _, vjp_p = jax.vjp(out_pallas, x, s, b)
        _, vjp_r = jax.vjp(out_ref, x, s, b)
        for got, want, name in zip(vjp_p(g), vjp_r(g), ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_xla_fallback_env(self, monkeypatch):
        from gmdx.kernels.groupnorm import _gn_silu_reference

        monkeypatch.setenv("GMDX_FUSED_GN_BWD", "0")
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 128))
        s, b = jnp.ones(128), jnp.zeros(128)
        g = jax.random.normal(jax.random.key(1), (1, 8, 8, 128))
        _, vjp = jax.vjp(
            lambda x: fused_group_norm_silu(
                x, s, b, num_groups=32, interpret=True
            ), x,
        )
        _, vjp_r = jax.vjp(
            lambda x: _gn_silu_reference(x, s, b, 32, 1e-5, True), x
        )
        np.testing.assert_allclose(
            np.asarray(vjp(g)[0]), np.asarray(vjp_r(g)[0]),
            rtol=1e-4, atol=1e-4,
        )
