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


class TestAttentionKVResident:
    """Exact-softmax KV-resident kernel vs the XLA reference."""

    @pytest.mark.parametrize(
        "sq,sk,h,d",
        [(256, 256, 4, 40), (300, 300, 2, 40), (128, 77, 2, 40)],
    )
    def test_matches_xla(self, sq, sk, h, d):
        from gmdx.kernels.flash_attention import attention_kv_resident

        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (2, sq, h * d))
        k = jax.random.normal(ks[1], (2, sk, h * d))
        v = jax.random.normal(ks[2], (2, sk, h * d))
        out = attention_kv_resident(q, k, v, h, interpret=True)
        ref = _xla_attention(
            q.reshape(2, sq, h, d), k.reshape(2, sk, h, d),
            v.reshape(2, sk, h, d), d**-0.5,
        ).reshape(2, sq, h * d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_grads_route_through_flash(self):
        """Differentiation must work (flattened flash fwd/bwd) and match
        XLA autodiff."""
        from gmdx.kernels.flash_attention import attention_kv_resident

        q = jax.random.normal(jax.random.key(1), (1, 128, 80))

        def loss_kvres(q):
            return jnp.sum(
                attention_kv_resident(q, q, q, 2, interpret=True) ** 2
            )

        def loss_ref(q):
            q4 = q.reshape(1, 128, 2, 40)
            return jnp.sum(
                _xla_attention(q4, q4, q4, 40**-0.5).reshape(1, 128, 80)
                ** 2
            )

        g = jax.grad(loss_kvres)(q)
        gr = jax.grad(loss_ref)(q)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=2e-3, atol=2e-3
        )


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

    def test_onepass_matches_blocked(self, monkeypatch):
        """The whole-image one-pass kernel and the blocked two-pass kernels
        must agree (same input, same stats residual for the backward)."""
        from gmdx.kernels import groupnorm as gnmod

        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 320)) * 2 + 1
        s = jax.random.normal(jax.random.key(1), (320,)) * 0.1 + 1.0
        b = jax.random.normal(jax.random.key(2), (320,)) * 0.1
        one = fused_group_norm_silu(x, s, b, num_groups=32, interpret=True)
        monkeypatch.setattr(gnmod, "_ONEPASS_BUDGET", 0)  # force blocked
        blocked = fused_group_norm_silu(
            x, s, b, num_groups=32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(one), np.asarray(blocked), rtol=1e-5, atol=1e-5
        )

    def test_pad_output_matches_pad_of_reference(self):
        """pad_output=True must equal GN(+SiLU) followed by a 1-px zero
        pad — the layout the Winograd conv kernel consumes directly."""
        from gmdx.kernels.groupnorm import (
            _gn_silu_reference,
            fused_group_norm_silu,
        )

        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 64))
        s = 1 + 0.1 * jax.random.normal(jax.random.key(1), (64,))
        b = 0.1 * jax.random.normal(jax.random.key(2), (64,))
        out = fused_group_norm_silu(
            x, s, b, num_groups=32, interpret=True, pad_output=True
        )
        ref = jnp.pad(
            _gn_silu_reference(x, s, b, 32, 1e-5, True),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        assert out.shape == (2, 18, 18, 64)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_pad_output_grads(self):
        """The padded border is constant: cotangents must flow only from
        the interior (custom-VJP slices g)."""
        from gmdx.kernels.groupnorm import (
            _gn_silu_reference,
            fused_group_norm_silu,
        )

        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 64))
        s = 1 + 0.1 * jax.random.normal(jax.random.key(1), (64,))
        b = 0.1 * jax.random.normal(jax.random.key(2), (64,))
        g = jax.random.normal(jax.random.key(3), (1, 10, 10, 64))

        def f(x, s, b):
            return jnp.sum(
                fused_group_norm_silu(
                    x, s, b, num_groups=32, interpret=True, pad_output=True
                )
                * g
            )

        def fr(x, s, b):
            return jnp.sum(
                jnp.pad(
                    _gn_silu_reference(x, s, b, 32, 1e-5, True),
                    ((0, 0), (1, 1), (1, 1), (0, 0)),
                )
                * g
            )

        ga = jax.grad(f, argnums=(0, 1, 2))(x, s, b)
        gr = jax.grad(fr, argnums=(0, 1, 2))(x, s, b)
        for a, r in zip(ga, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4
            )

    def test_onepass_pallas_backward_matches(self, monkeypatch):
        """dx/dscale/dbias from the Pallas backward must be identical
        whichever forward produced the stats residual."""
        from gmdx.kernels import groupnorm as gnmod

        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 128))
        s = jax.random.normal(jax.random.key(1), (128,)) * 0.1 + 1.0
        b = jax.random.normal(jax.random.key(2), (128,)) * 0.1

        def loss(x, s, b):
            return jnp.sum(
                fused_group_norm_silu(
                    x, s, b, num_groups=32, interpret=True
                )
                ** 2
            )

        g_one = jax.grad(loss, argnums=(0, 1, 2))(x, s, b)
        monkeypatch.setattr(gnmod, "_ONEPASS_BUDGET", 0)
        g_blk = jax.grad(loss, argnums=(0, 1, 2))(x, s, b)
        for a, e in zip(g_one, g_blk):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5
            )


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


class TestFusedGEGLUFF:
    """gmdx/kernels/geglu_ff.py vs the jnp reference, interpreter mode."""

    def _make(self, key, n, c, mult=4, dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        inner = c * mult
        x = jax.random.normal(ks[0], (2, n, c), dtype)
        res = jax.random.normal(ks[1], (2, n, c), dtype)
        w1 = jax.random.normal(ks[2], (c, inner * 2), dtype) * c**-0.5
        b1 = jax.random.normal(ks[3], (inner * 2,), dtype) * 0.1
        w2 = jax.random.normal(ks[4], (inner, c), dtype) * inner**-0.5
        b2 = jax.random.normal(ks[5], (c,), dtype) * 0.1
        return x, res, w1, b1, w2, b2

    def test_matches_reference_dim320(self):
        from gmdx.kernels.geglu_ff import _ff_fused, _ff_reference

        args = self._make(jax.random.key(0), 300, 320)  # 300: pad path
        out = _ff_fused(*args, interpret=True)
        ref = _ff_reference(args[0], args[1], *args[2:])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_matches_reference_dim640_bf16(self):
        from gmdx.kernels.geglu_ff import _ff_fused, _ff_reference

        args = self._make(jax.random.key(1), 128, 640, dtype=jnp.bfloat16)
        out = _ff_fused(*args, interpret=True)
        # fp32 reference; bf16 kernel accumulates in fp32
        ref = _ff_reference(
            args[0].astype(jnp.float32), args[1].astype(jnp.float32),
            *[a.astype(jnp.float32) for a in args[2:]],
        )
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref),
            rtol=3e-2, atol=3e-2,
        )

    def test_grads_match_reference(self):
        from gmdx.kernels.geglu_ff import _ff_fused, _ff_reference

        args = self._make(jax.random.key(2), 128, 320)
        g = jax.random.normal(jax.random.key(3), args[0].shape)

        _, vjp_p = jax.vjp(
            lambda *a: _ff_fused(*a, interpret=True), *args
        )
        _, vjp_r = jax.vjp(_ff_reference, *args)
        names = ("dx", "dres", "dw1", "db1", "dw2", "db2")
        for got, want, name in zip(vjp_p(g), vjp_r(g), names):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_dispatch_fallback_unsupported_dim(self):
        """dim 1280 (no VMEM budget) must take the jnp path, not error."""
        from gmdx.kernels.geglu_ff import geglu_ff

        c = 1280
        x = jax.random.normal(jax.random.key(0), (1, 16, c))
        res = jnp.zeros_like(x)
        w1 = jax.random.normal(jax.random.key(1), (c, 2 * 4 * c)) * c**-0.5
        b1 = jnp.zeros((2 * 4 * c,))
        w2 = jax.random.normal(jax.random.key(2), (4 * c, c)) * (4 * c) ** -0.5
        b2 = jnp.zeros((c,))
        out = geglu_ff(x, res, w1, b1, w2, b2)
        assert out.shape == x.shape


class TestFusedLNGEGLUFF:
    """LN-fused FF kernel (geglu_ff_ln) vs the jnp LN+FF reference."""

    def _make(self, key, n, c, mult=4, dtype=jnp.float32):
        ks = jax.random.split(key, 7)
        inner = c * mult
        x = jax.random.normal(ks[0], (2, n, c), dtype)
        gamma = (1.0 + 0.1 * jax.random.normal(ks[1], (c,))).astype(dtype)
        beta = (0.1 * jax.random.normal(ks[2], (c,))).astype(dtype)
        w1 = jax.random.normal(ks[3], (c, inner * 2), dtype) * c**-0.5
        b1 = jax.random.normal(ks[4], (inner * 2,), dtype) * 0.1
        w2 = jax.random.normal(ks[5], (inner, c), dtype) * inner**-0.5
        b2 = jax.random.normal(ks[6], (c,), dtype) * 0.1
        return x, gamma, beta, w1, b1, w2, b2

    def test_matches_reference_dim320(self):
        from gmdx.kernels.geglu_ff import _ff_ln_fused, _ff_ln_reference

        args = self._make(jax.random.key(0), 300, 320)  # 300: pad path
        out = _ff_ln_fused(*args, 1e-5, interpret=True)
        ref = _ff_ln_reference(*args, 1e-5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_matches_reference_dim640_bf16(self):
        from gmdx.kernels.geglu_ff import _ff_ln_fused, _ff_ln_reference

        args = self._make(jax.random.key(1), 128, 640, dtype=jnp.bfloat16)
        out = _ff_ln_fused(*args, 1e-5, interpret=True)
        ref = _ff_ln_reference(
            *[a.astype(jnp.float32) for a in args], 1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref),
            rtol=3e-2, atol=3e-2,
        )

    def test_grads_match_reference(self):
        from gmdx.kernels.geglu_ff import _ff_ln_fused, _ff_ln_reference

        args = self._make(jax.random.key(2), 128, 320)
        g = jax.random.normal(jax.random.key(3), args[0].shape)

        _, vjp_p = jax.vjp(
            lambda *a: _ff_ln_fused(*a, 1e-5, interpret=True), *args
        )
        _, vjp_r = jax.vjp(lambda *a: _ff_ln_reference(*a, 1e-5), *args)
        names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
        for got, want, name in zip(vjp_p(g), vjp_r(g), names):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_add_fold_matches_outside_add(self):
        """geglu_ff_ln(x, add=a) == geglu_ff_ln(x + a): the prologue fold
        rounds the sum to the compute dtype, so bit parity is exact."""
        from gmdx.kernels.geglu_ff import _ff_add_ln_fused, _ff_ln_fused

        args = self._make(jax.random.key(5), 300, 320, dtype=jnp.bfloat16)
        x = args[0]
        a = jax.random.normal(jax.random.key(6), x.shape, x.dtype)
        out = _ff_add_ln_fused(x, a, *args[1:], 1e-5, interpret=True)
        ref = _ff_ln_fused((x + a).astype(x.dtype), *args[1:], 1e-5,
                           interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_add_fold_grads_match_reference(self):
        from gmdx.kernels.geglu_ff import (
            _ff_add_ln_fused,
            _ff_add_ln_reference,
        )

        args = self._make(jax.random.key(7), 128, 320)
        x = args[0]
        a = jax.random.normal(jax.random.key(8), x.shape, x.dtype)
        g = jax.random.normal(jax.random.key(9), x.shape)
        _, vjp_p = jax.vjp(
            lambda *z: _ff_add_ln_fused(*z, 1e-5, interpret=True),
            x, a, *args[1:],
        )
        _, vjp_r = jax.vjp(
            lambda *z: _ff_add_ln_reference(*z, 1e-5), x, a, *args[1:]
        )
        for got, want in zip(vjp_p(g), vjp_r(g)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
            )

    def test_residual_is_prenorm_input(self):
        """Zero FF weights: output must equal x exactly (x is the residual)."""
        from gmdx.kernels.geglu_ff import geglu_ff_ln

        c = 320
        x = jax.random.normal(jax.random.key(0), (1, 256, c))
        gamma = jnp.ones((c,))
        beta = jnp.zeros((c,))
        w1 = jnp.zeros((c, 8 * c))
        b1 = jnp.zeros((8 * c,))
        w2 = jnp.zeros((4 * c, c))
        b2 = jnp.zeros((c,))
        out = geglu_ff_ln(x, gamma, beta, w1, b1, w2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_dispatch_fallback_unsupported_dim(self):
        """dim 1280 (no VMEM budget) must take the jnp path, not error."""
        from gmdx.kernels.geglu_ff import geglu_ff_ln

        c = 1280
        x = jax.random.normal(jax.random.key(0), (1, 16, c))
        gamma = jnp.ones((c,))
        beta = jnp.zeros((c,))
        w1 = jax.random.normal(jax.random.key(1), (c, 2 * 4 * c)) * c**-0.5
        b1 = jnp.zeros((2 * 4 * c,))
        w2 = jax.random.normal(jax.random.key(2), (4 * c, c)) * (4 * c) ** -0.5
        b2 = jnp.zeros((c,))
        out = geglu_ff_ln(x, gamma, beta, w1, b1, w2, b2)
        assert out.shape == x.shape


class TestAddLayerNorm:
    """Fused residual-add + LayerNorm (norm2 glue) vs the jnp mirror."""

    @pytest.mark.parametrize("n,c", [(300, 320), (128, 640), (64, 1280)])
    def test_matches_reference(self, n, c):
        from gmdx.kernels.geglu_ff import _add_ln_fused, _add_ln_reference

        ks = jax.random.split(jax.random.key(0), 4)
        x = jax.random.normal(ks[0], (2, n, c), jnp.bfloat16)
        y = jax.random.normal(ks[1], (2, n, c), jnp.bfloat16)
        gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (c,))
        beta = 0.1 * jax.random.normal(ks[3], (c,))
        s, h = _add_ln_fused(x, y, gamma, beta, 1e-5, interpret=True)
        s_r, h_r = _add_ln_reference(x, y, gamma, beta, 1e-5)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s_r))
        np.testing.assert_allclose(
            np.asarray(h, np.float32), np.asarray(h_r, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_grads_match_reference(self):
        from gmdx.kernels.geglu_ff import _add_ln_fused, _add_ln_reference

        ks = jax.random.split(jax.random.key(1), 6)
        x = jax.random.normal(ks[0], (1, 128, 320))
        y = jax.random.normal(ks[1], (1, 128, 320))
        gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (320,))
        beta = 0.1 * jax.random.normal(ks[3], (320,))
        gs = jax.random.normal(ks[4], x.shape)
        gh = jax.random.normal(ks[5], x.shape)
        _, vjp_p = jax.vjp(
            lambda *z: _add_ln_fused(*z, 1e-5, interpret=True),
            x, y, gamma, beta,
        )
        _, vjp_r = jax.vjp(
            lambda *z: _add_ln_reference(*z, 1e-5), x, y, gamma, beta
        )
        for got, want in zip(vjp_p((gs, gh)), vjp_r((gs, gh))):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
            )


class TestWinogradConv3x3:
    """Winograd F(2x2,3x3) kernel vs lax.conv_general_dilated.

    Comparisons run under pinned matmul precision (the CPU backend's
    default-precision fp32 dots are low-precision, see
    TestCrossAttentionShortK)."""

    @pytest.mark.parametrize(
        "b,hw,c,o",
        [(2, 16, 32, 16), (1, 32, 64, 32), (2, 16, 40, 24)],
    )
    def test_matches_direct_conv(self, b, hw, c, o, monkeypatch):
        from gmdx.kernels.winograd import (
            _conv3x3_reference,
            winograd_conv3x3,
        )

        monkeypatch.setenv("GMDX_WINOGRAD_M", "2")  # the F(2x2) path
        ks = jax.random.split(jax.random.key(0), 3)
        x = jax.random.normal(ks[0], (b, hw, hw, c), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, c, o)) * 0.1
        bias = jax.random.normal(ks[2], (o,)) * 0.1
        with jax.default_matmul_precision("highest"):
            out = winograd_conv3x3(x, k, bias, interpret=True)
            ref = _conv3x3_reference(x, k, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_grads_are_direct_conv_grads(self):
        """The VJP recomputes through lax.conv — must match it exactly."""
        from gmdx.kernels.winograd import (
            _conv3x3_reference,
            winograd_conv3x3,
        )

        ks = jax.random.split(jax.random.key(1), 4)
        x = jax.random.normal(ks[0], (1, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 16)) * 0.1
        bias = jax.random.normal(ks[2], (16,)) * 0.1
        g = jax.random.normal(ks[3], (1, 16, 16, 16))
        _, vjp_w = jax.vjp(
            lambda x_, k_, b_: winograd_conv3x3(x_, k_, b_, interpret=True),
            x, k, bias,
        )
        _, vjp_r = jax.vjp(_conv3x3_reference, x, k, bias)
        for a, r in zip(vjp_w(g), vjp_r(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r))

    def test_tile_row_split_matches(self):
        """The VMEM-pressure slab split (grid dim 2) must be numerically
        identical to the single-slab path."""
        from gmdx.kernels.winograd import _wino_conv

        ks = jax.random.split(jax.random.key(2), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 16)) * 0.1
        bias = jax.random.normal(ks[2], (16,)) * 0.1
        with jax.default_matmul_precision("highest"):
            one = _wino_conv(x, k, bias, 1, 1, False, True)
            two = _wino_conv(x, k, bias, 2, 1, False, True)
        np.testing.assert_allclose(
            np.asarray(one), np.asarray(two), rtol=1e-6, atol=1e-6
        )

    def test_output_chunking_matches(self):
        """Output-channel chunking (outermost grid dim, per-chunk weight
        transform) must match the unchunked path — this is the 1280-level
        coverage path."""
        from gmdx.kernels.winograd import _wino_conv

        ks = jax.random.split(jax.random.key(3), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 32)) * 0.1
        bias = jax.random.normal(ks[2], (32,)) * 0.1
        with jax.default_matmul_precision("highest"):
            one = _wino_conv(x, k, bias, 1, 1, False, True)
            four = _wino_conv(x, k, bias, 2, 4, False, True)
        # fp32-rounding tolerance: the slab/chunk tilings regroup sums.
        np.testing.assert_allclose(
            np.asarray(one), np.asarray(four), rtol=2e-5, atol=2e-5
        )

    def test_pre_padded_matches_same_conv(self, monkeypatch):
        """pre_padded=True over a zero-bordered input == SAME conv over
        the raw input (the pad-emitting GroupNorm handoff)."""
        from gmdx.kernels.winograd import (
            _conv3x3_reference,
            winograd_conv3x3,
        )

        monkeypatch.setenv("GMDX_WINOGRAD_M", "2")  # the F(2x2) path
        ks = jax.random.split(jax.random.key(4), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 16)) * 0.1
        bias = jax.random.normal(ks[2], (16,)) * 0.1
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        with jax.default_matmul_precision("highest"):
            out = winograd_conv3x3(xp, k, bias, pre_padded=True,
                                   interpret=True)
            ref = _conv3x3_reference(x, k, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("b,hw,c,o", [(2, 16, 32, 16), (1, 32, 40, 24)])
    def test_halfparity_matches_direct_conv(self, b, hw, c, o, monkeypatch):
        """GMDX_WINOGRAD_HALFPARITY=1: the column-parity deinterleave
        happens in-kernel via one-hot MXU matmuls instead of the XLA
        NHWC->parity-5D retile. One-hot selection is exact, so this must
        match the default path bit-for-bit (opt-in: measured ~equal cost
        to the retile on TPU, BENCHNOTES.md round 3)."""
        from gmdx.kernels.winograd import winograd_conv3x3

        monkeypatch.setenv("GMDX_WINOGRAD_M", "2")
        ks = jax.random.split(jax.random.key(7), 3)
        x = jax.random.normal(ks[0], (b, hw, hw, c), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, c, o)) * 0.1
        bias = jax.random.normal(ks[2], (o,)) * 0.1
        with jax.default_matmul_precision("highest"):
            monkeypatch.setenv("GMDX_WINOGRAD_HALFPARITY", "0")
            ref = winograd_conv3x3(x, k, bias, interpret=True)
            monkeypatch.setenv("GMDX_WINOGRAD_HALFPARITY", "1")
            out = winograd_conv3x3(x, k, bias, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_halfparity_chunked_and_split(self, monkeypatch):
        """Half-parity I/O under slab split + output chunking (the
        halfparity OUT write composes with chunked O lanes — that is its
        advantage over the parity-5D write)."""
        from gmdx.kernels.winograd import _wino_conv

        ks = jax.random.split(jax.random.key(8), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 32)) * 0.1
        bias = jax.random.normal(ks[2], (32,)) * 0.1
        with jax.default_matmul_precision("highest"):
            monkeypatch.setenv("GMDX_WINOGRAD_HALFPARITY", "0")
            ref = _wino_conv(x, k, bias, 1, 1, False, True)
            monkeypatch.setenv("GMDX_WINOGRAD_HALFPARITY", "1")
            one = _wino_conv(x, k, bias, 1, 1, False, True)
            chunked = _wino_conv(x, k, bias, 2, 4, False, True)
        np.testing.assert_array_equal(np.asarray(one), np.asarray(ref))
        # chunk/slab tilings regroup fp32 sums — tolerance, not equality
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_parity_io_matches_plain(self, monkeypatch):
        """parity_in / parity_out 5D I/O is the same map as the NHWC call
        (the layouts are pure relabelings — the in-kernel math is shared)."""
        from gmdx.kernels.winograd import (
            nhwc_to_parity5,
            parity5_to_nhwc,
            winograd_conv3x3,
            winograd_parity_io,
        )

        monkeypatch.setenv("GMDX_WINOGRAD_M", "2")
        ks = jax.random.split(jax.random.key(7), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 64), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 64, 64)) * 0.1
        bias = jax.random.normal(ks[2], (64,)) * 0.1
        assert winograd_parity_io((2, 16, 16, 64), 64, 4, interpret=True)
        xp5 = nhwc_to_parity5(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
        with jax.default_matmul_precision("highest"):
            base = winograd_conv3x3(x, k, bias, interpret=True)
            po = winograd_conv3x3(x, k, bias, parity_out=True,
                                  interpret=True)
            pi = winograd_conv3x3(xp5, k, bias, parity_in=True,
                                  interpret=True)
            pio = winograd_conv3x3(xp5, k, bias, parity_in=True,
                                   parity_out=True, interpret=True)
        assert po.shape == (2, 8, 2, 8, 128)
        np.testing.assert_allclose(
            np.asarray(parity5_to_nhwc(po)), np.asarray(base), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pi), np.asarray(base), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(parity5_to_nhwc(pio)), np.asarray(base), rtol=1e-6
        )

    def test_parity_io_grads(self, monkeypatch):
        """The VJP rules convert layouts around the direct-conv twin: grads
        through parity I/O must equal grads through the NHWC call."""
        from gmdx.kernels.winograd import (
            nhwc_to_parity5,
            winograd_conv3x3,
        )

        monkeypatch.setenv("GMDX_WINOGRAD_M", "2")
        ks = jax.random.split(jax.random.key(8), 3)
        x = jax.random.normal(ks[0], (1, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 32)) * 0.1
        bias = jax.random.normal(ks[2], (32,)) * 0.1

        def f_parity(x, k, b):
            x5 = nhwc_to_parity5(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
            out = winograd_conv3x3(x5, k, b, parity_in=True,
                                   parity_out=True, interpret=True)
            return jnp.sum(out**2)

        def f_plain(x, k, b):
            return jnp.sum(
                winograd_conv3x3(x, k, b, interpret=True) ** 2
            )

        with jax.default_matmul_precision("highest"):
            ga = jax.grad(f_parity, argnums=(0, 1, 2))(x, k, bias)
            gr = jax.grad(f_plain, argnums=(0, 1, 2))(x, k, bias)
        for a, r in zip(ga, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5
            )

    def test_unsupported_shapes_fall_back(self):
        from gmdx.kernels.winograd import winograd_conv3x3

        k = jnp.zeros((3, 3, 32, 32))
        b = jnp.zeros((32,))
        # odd spatial
        assert winograd_conv3x3(
            jnp.zeros((1, 17, 17, 32)), k, b, interpret=True
        ) is None
        # tiny spatial (matmuls cannot fill the MXU)
        assert winograd_conv3x3(
            jnp.zeros((1, 8, 8, 32)), k, b, interpret=True
        ) is None
        # non-square
        assert winograd_conv3x3(
            jnp.zeros((1, 16, 32, 32)), k, b, interpret=True
        ) is None

    def test_resnet_block_equivalence(self, monkeypatch):
        """ResnetBlock2D with Winograd on vs off (same params, same math)."""
        from gmdx.models.layers import ResnetBlock2D

        m = ResnetBlock2D(32)
        x = jax.random.normal(jax.random.key(0), (1, 16, 16, 32))
        temb = jax.random.normal(jax.random.key(1), (1, 64))
        p = m.init(jax.random.key(2), x, temb)
        with jax.default_matmul_precision("highest"):
            # CPU: dispatch falls back to the direct conv (not interpret).
            direct = m.apply(p, x, temb)
            from gmdx.kernels import winograd as wmod

            wino = wmod.winograd_conv3x3(
                x, p["params"]["conv1"]["kernel"],
                p["params"]["conv1"]["bias"], interpret=True,
            )
            ref = wmod._conv3x3_reference(
                jax.nn.silu(
                    _gn_ref32(x, p["params"]["norm1"])
                ),
                p["params"]["conv1"]["kernel"],
                p["params"]["conv1"]["bias"],
            )
        assert direct.shape == x.shape
        assert wino.shape == (1, 16, 16, 32)


class TestParityGroupNorm:
    """parity_gn_pad_silu (gmdx/kernels/groupnorm.py): fused
    (+temb) -> GN -> SiLU over the Winograd parity-5D layout emitting the
    padded parity layout — the resnet-tail chain's middle kernel."""

    @pytest.mark.parametrize("c", [64, 320])  # incl. non-128-aligned
    @pytest.mark.parametrize("with_temb", [False, True])
    def test_matches_mirror(self, c, with_temb):
        from gmdx.kernels.groupnorm import (
            _parity_gn_mirror,
            parity_gn_pad_silu,
        )
        from gmdx.kernels.winograd import nhwc_to_parity5

        ks = jax.random.split(jax.random.key(0), 4)
        x = jax.random.normal(ks[0], (2, 16, 16, c)) * 2 + 1
        x5 = nhwc_to_parity5(x)
        s = 1 + 0.1 * jax.random.normal(ks[1], (c,))
        b = 0.1 * jax.random.normal(ks[2], (c,))
        temb = jax.random.normal(ks[3], (2, c)) if with_temb else None
        got = parity_gn_pad_silu(x5, s, b, temb, num_groups=32,
                                 interpret=True)
        want = _parity_gn_mirror(x5, s, b, temb, 32, 1e-5, True)
        assert got.shape == (2, 9, 2, 9, 2 * c)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_feeds_parity_in_conv(self):
        """End-to-end chain piece: GN's padded-parity output into the
        parity_in Winograd conv equals the NHWC composition."""
        from gmdx.kernels.groupnorm import (
            _gn_silu_reference,
            parity_gn_pad_silu,
        )
        from gmdx.kernels.winograd import (
            _conv3x3_reference,
            nhwc_to_parity5,
            winograd_conv3x3,
        )

        ks = jax.random.split(jax.random.key(1), 5)
        x = jax.random.normal(ks[0], (1, 16, 16, 64))
        s = 1 + 0.1 * jax.random.normal(ks[1], (64,))
        b = 0.1 * jax.random.normal(ks[2], (64,))
        k = jax.random.normal(ks[3], (3, 3, 64, 64)) * 0.1
        cb = jax.random.normal(ks[4], (64,)) * 0.1
        with jax.default_matmul_precision("highest"):
            h5 = parity_gn_pad_silu(
                nhwc_to_parity5(x), s, b, num_groups=32, interpret=True
            )
            got = winograd_conv3x3(h5, k, cb, parity_in=True,
                                   interpret=True)
            want = _conv3x3_reference(
                _gn_silu_reference(x, s, b, 32, 1e-5, True), k, cb
            )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_grads_match_mirror(self):
        from gmdx.kernels.groupnorm import (
            _parity_gn_mirror,
            parity_gn_pad_silu,
        )
        from gmdx.kernels.winograd import nhwc_to_parity5

        ks = jax.random.split(jax.random.key(2), 4)
        x5 = nhwc_to_parity5(jax.random.normal(ks[0], (1, 8, 8, 64)))
        s = 1 + 0.1 * jax.random.normal(ks[1], (64,))
        b = 0.1 * jax.random.normal(ks[2], (64,))
        temb = jax.random.normal(ks[3], (1, 64))

        def f(x5, s, b, t):
            return jnp.sum(
                parity_gn_pad_silu(x5, s, b, t, num_groups=32,
                                   interpret=True) ** 2
            )

        def fr(x5, s, b, t):
            return jnp.sum(_parity_gn_mirror(x5, s, b, t, 32, 1e-5, True) ** 2)

        ga = jax.grad(f, argnums=(0, 1, 2, 3))(x5, s, b, temb)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3))(x5, s, b, temb)
        for a, r in zip(ga, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4
            )

    def test_resnet_parity_chain_equivalence(self, monkeypatch):
        """ResnetBlock2D with the parity chain forced (interpret kernels,
        spoofed TPU gates) vs the chain disabled — same params, same math."""
        import functools

        from gmdx.kernels import groupnorm as gnmod
        from gmdx.kernels import winograd as wmod
        from gmdx.models.layers import ResnetBlock2D

        m = ResnetBlock2D(64)
        x = jax.random.normal(jax.random.key(0), (1, 16, 16, 64))
        temb = jax.random.normal(jax.random.key(1), (1, 96))
        p = m.init(jax.random.key(2), x, temb)

        with jax.default_matmul_precision("highest"):
            monkeypatch.setenv("GMDX_PARITY_CHAIN", "0")
            base = m.apply(p, x, temb)  # CPU: direct-conv fallback path

            # Force the chain: spoof the backend gates and route every
            # kernel through interpret mode.
            monkeypatch.setenv("GMDX_PARITY_CHAIN", "1")
            monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
            monkeypatch.setattr(
                wmod, "winograd_conv3x3",
                functools.partial(wmod.winograd_conv3x3, interpret=True),
            )
            monkeypatch.setattr(
                gnmod, "parity_gn_pad_silu",
                functools.partial(gnmod.parity_gn_pad_silu, interpret=True),
            )
            monkeypatch.setattr(
                gnmod, "fused_group_norm_silu",
                functools.partial(
                    gnmod.fused_group_norm_silu, interpret=True
                ),
            )
            chained = m.apply(p, x, temb)
        np.testing.assert_allclose(
            np.asarray(chained), np.asarray(base), rtol=2e-4, atol=2e-4
        )


class TestWinogradStreaming:
    """The HBM-resident-input (streaming) F(2x2) variant: the padded image
    stays in ANY space and each grid step DMAs a row slab into VMEM —
    coverage for the shapes whose whole image cannot sit in VMEM (VAE
    decode at 128^2+, 1024^2 UNet levels)."""

    def test_stream_matches_direct(self):
        """Forced streaming at a small shape == direct conv exactly."""
        from gmdx.kernels.winograd import _conv3x3_reference, _wino_conv

        ks = jax.random.split(jax.random.key(0), 3)
        x = jax.random.normal(ks[0], (2, 32, 32, 16), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 16, 16)) * 0.1
        bias = jax.random.normal(ks[2], (16,)) * 0.1
        with jax.default_matmul_precision("highest"):
            ref = _conv3x3_reference(x, k, bias)
            # t_rows = 16, trs = 4 divides exactly -> no row padding
            out = _wino_conv(x, k, bias, 4, 1, False, True, 2, True, 4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_stream_row_padding(self):
        """trs that does NOT divide the tile rows: bottom rows are padded
        and sliced off — output still matches the direct conv."""
        from gmdx.kernels.winograd import _conv3x3_reference, _wino_conv

        ks = jax.random.split(jax.random.key(1), 3)
        x = jax.random.normal(ks[0], (1, 36, 36, 16), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 16, 24)) * 0.1
        bias = jax.random.normal(ks[2], (24,)) * 0.1
        with jax.default_matmul_precision("highest"):
            ref = _conv3x3_reference(x, k, bias)
            # t_rows = 18, trs = 4 -> split = 5, 2 padded tile rows
            out = _wino_conv(x, k, bias, 5, 1, False, True, 2, True, 4)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_stream_ochunked_pre_padded(self):
        """Streaming + output chunking + the pre-padded handoff."""
        from gmdx.kernels.winograd import _conv3x3_reference, _wino_conv

        ks = jax.random.split(jax.random.key(2), 3)
        x = jax.random.normal(ks[0], (1, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 32)) * 0.1
        bias = jax.random.normal(ks[2], (32,)) * 0.1
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        with jax.default_matmul_precision("highest"):
            ref = _conv3x3_reference(x, k, bias)
            out = _wino_conv(xp, k, bias, 2, 2, True, True, 2, True, 4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_large_image_dispatches_streaming(self, monkeypatch):
        """Shapes past the whole-image VMEM budget pick the streaming tier
        (opt-in: measured slower than the direct conv at these shapes,
        BENCHNOTES.md) instead of falling back to the direct conv."""
        from gmdx.kernels.winograd import _select_tiling

        monkeypatch.setenv("GMDX_WINOGRAD_STREAM", "1")
        # 256x256 @ 256ch (VAE decode level): whole image > VMEM budget.
        m, split, ochunks, stream, trs = _select_tiling(
            256, 256, 256, 256, 2, 2
        )
        assert m == 2 and stream and split * trs >= 128
        # 512x512 @ 128ch (VAE decode final level).
        m, split, ochunks, stream, trs = _select_tiling(
            512, 512, 128, 128, 2, 2
        )
        assert m == 2 and stream and split * trs >= 256
        # 128x128 @ 512ch still fits whole-image residency (o-chunking).
        m, split, ochunks, stream, trs = _select_tiling(
            128, 128, 512, 512, 2, 2
        )
        assert m == 2 and not stream
        # Small shapes keep the resident tier.
        m, split, ochunks, stream, trs = _select_tiling(
            64, 64, 320, 320, 2, 2
        )
        assert m == 2 and not stream


class TestWinograd4Conv3x3:
    """Winograd F(4x4,3x3) kernel (gmdx/kernels/winograd.py) vs
    lax.conv_general_dilated, same pinned-precision discipline as the
    F(2x2) tests above."""

    @pytest.mark.parametrize(
        "b,hw,c,o",
        [(2, 16, 32, 16), (1, 32, 64, 32), (2, 16, 40, 24)],
    )
    def test_matches_direct_conv(self, b, hw, c, o, monkeypatch):
        from gmdx.kernels.winograd import (
            _conv3x3_reference,
            winograd_conv3x3,
        )

        monkeypatch.setenv("GMDX_WINOGRAD_M", "4")
        ks = jax.random.split(jax.random.key(0), 3)
        x = jax.random.normal(ks[0], (b, hw, hw, c), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, c, o)) * 0.1
        bias = jax.random.normal(ks[2], (o,)) * 0.1
        with jax.default_matmul_precision("highest"):
            out = winograd_conv3x3(x, k, bias, interpret=True)
            ref = _conv3x3_reference(x, k, bias)
        # F(4x4) transform coefficients (1/6, 1/24, ±8) amplify fp32
        # rounding more than F(2x2)'s exact halves.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_tile_row_split_matches(self):
        from gmdx.kernels.winograd import _wino_conv

        ks = jax.random.split(jax.random.key(2), 3)
        x = jax.random.normal(ks[0], (2, 32, 32, 16), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 16, 16)) * 0.1
        bias = jax.random.normal(ks[2], (16,)) * 0.1
        with jax.default_matmul_precision("highest"):
            one = _wino_conv(x, k, bias, 1, 1, False, True, 4)
            two = _wino_conv(x, k, bias, 2, 1, False, True, 4)
        np.testing.assert_allclose(
            np.asarray(one), np.asarray(two), rtol=1e-5, atol=1e-5
        )

    def test_output_chunking_matches(self):
        from gmdx.kernels.winograd import _wino_conv

        ks = jax.random.split(jax.random.key(3), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 32)) * 0.1
        bias = jax.random.normal(ks[2], (32,)) * 0.1
        with jax.default_matmul_precision("highest"):
            one = _wino_conv(x, k, bias, 1, 1, False, True, 4)
            four = _wino_conv(x, k, bias, 1, 4, False, True, 4)
        np.testing.assert_allclose(
            np.asarray(one), np.asarray(four), rtol=2e-4, atol=2e-4
        )

    def test_pre_padded_matches_same_conv(self):
        """pre_padded carries the F(2x2) 1-px border contract; the m=4
        path re-pads to (1, 3) internally."""
        from gmdx.kernels.winograd import _conv3x3_reference, _wino_conv

        ks = jax.random.split(jax.random.key(4), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 32), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, 32, 16)) * 0.1
        bias = jax.random.normal(ks[2], (16,)) * 0.1
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        with jax.default_matmul_precision("highest"):
            out = _wino_conv(xp, k, bias, 1, 1, True, True, 4)
            ref = _conv3x3_reference(x, k, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_bf16_error_bounded(self):
        """bf16 transform-domain matmuls: the F(4x4) error must stay at
        the same order as the direct bf16 conv's own noise (both vs the
        fp32 direct conv)."""
        from gmdx.kernels.winograd import _conv3x3_reference, _wino_conv

        ks = jax.random.split(jax.random.key(5), 3)
        x32 = jax.random.normal(ks[0], (1, 32, 32, 64), jnp.float32)
        k32 = jax.random.normal(ks[1], (3, 3, 64, 32)) * 0.1
        b32 = jax.random.normal(ks[2], (32,)) * 0.1
        with jax.default_matmul_precision("highest"):
            ref = np.asarray(_conv3x3_reference(x32, k32, b32))
            direct_bf16 = np.asarray(
                _conv3x3_reference(
                    x32.astype(jnp.bfloat16), k32, b32
                ).astype(jnp.float32)
            )
            wino_bf16 = np.asarray(
                _wino_conv(
                    x32.astype(jnp.bfloat16), k32, b32, 1, 1, False, True, 4
                ).astype(jnp.float32)
            )
        scale = np.abs(ref).max()
        direct_err = np.abs(direct_bf16 - ref).max() / scale
        wino_err = np.abs(wino_bf16 - ref).max() / scale
        # Amplified by the larger transform coefficients, but must stay
        # within an order of magnitude of plain bf16 conv noise.
        assert wino_err < max(10 * direct_err, 5e-2), (wino_err, direct_err)

    def test_selection(self, monkeypatch):
        from gmdx.kernels.winograd import _select_tiling

        # default is F(2x2) — F(4x4) measured net-slower (BENCHNOTES.md)
        assert _select_tiling(64, 64, 320, 320, 2, 2)[0] == 2
        # opt-in m=4 where it tiles
        monkeypatch.setenv("GMDX_WINOGRAD_M", "4")
        assert _select_tiling(64, 64, 320, 320, 2, 2)[0] == 4
        # forced m=4 falls back to 2 when it cannot tile (h % 4 != 0)
        assert _select_tiling(18, 18, 32, 32, 4, 4)[0] == 2
        # explicit m=2
        monkeypatch.setenv("GMDX_WINOGRAD_M", "2")
        assert _select_tiling(64, 64, 320, 320, 2, 2)[0] == 2


def _gn_ref32(x, norm_params, groups=32, eps=1e-5):
    import numpy as _np

    scale = norm_params["norm"]["scale"]
    bias = norm_params["norm"]["bias"]
    sh = x.shape
    c = sh[-1]
    xf = x.astype(jnp.float32).reshape(sh[:-1] + (groups, c // groups))
    ax = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = xf.mean(axis=ax, keepdims=True)
    var = xf.var(axis=ax, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(sh)
    return y * scale + bias


class TestCrossAttentionShortK:
    """Single-k-block cross-attention kernel vs the XLA reference.

    Comparisons run under jax.default_matmul_precision("highest"): the CPU
    backend's default-precision fp32 dots are low-precision (oneDNN bf16
    fast path, ~5e-2 abs error on unit-scale 8-dim dots), which would
    otherwise dominate the kernel-vs-reference diff."""

    @pytest.mark.parametrize(
        "sq,sk,h,d",
        [(1024, 77, 8, 40), (1024, 128, 4, 64), (2000, 77, 2, 40)],
    )
    def test_matches_xla(self, sq, sk, h, d):
        from gmdx.kernels.flash_attention import cross_attention_shortk

        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (2, sq, h * d))
        k = jax.random.normal(ks[1], (2, sk, h * d))
        v = jax.random.normal(ks[2], (2, sk, h * d))
        with jax.default_matmul_precision("highest"):
            out = cross_attention_shortk(q, k, v, h, interpret=True)
            ref = _xla_attention(
                q.reshape(2, sq, h, d), k.reshape(2, sk, h, d),
                v.reshape(2, sk, h, d), d**-0.5,
            ).reshape(2, sq, h * d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_rejects_long_k(self):
        from gmdx.kernels.flash_attention import cross_attention_shortk

        q = jnp.zeros((1, 256, 80))
        k = jnp.zeros((1, 256, 80))
        assert cross_attention_shortk(q, k, k, 2, interpret=True) is None

    def test_grad_routes_through_flattened_kernels(self):
        """Differentiation must match the (B,S,H,D) entry point exactly."""
        from gmdx.kernels.flash_attention import (
            cross_attention_shortk,
            flash_attention,
        )

        h, d = 2, 40
        q = jax.random.normal(jax.random.key(0), (1, 256, h * d))
        k = jax.random.normal(jax.random.key(1), (1, 77, h * d))
        v = jax.random.normal(jax.random.key(2), (1, 77, h * d))
        g = jax.random.normal(jax.random.key(3), q.shape)

        _, vjp_sk = jax.vjp(
            lambda q_, k_, v_: cross_attention_shortk(
                q_, k_, v_, h, interpret=True
            ),
            q, k, v,
        )
        _, vjp_4d = jax.vjp(
            lambda q_, k_, v_: flash_attention(q_, k_, v_, interpret=True),
            q.reshape(1, 256, h, d), k.reshape(1, 77, h, d),
            v.reshape(1, 77, h, d),
        )
        got = vjp_sk(g)
        want = vjp_4d(g.reshape(1, 256, h, d))
        for a, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(w).reshape(a.shape),
                rtol=1e-5, atol=1e-5,
            )


class TestFlashAttentionBSC:
    """Head-packed (B, S, H*D) forward kernel vs the 4D XLA reference."""

    @pytest.mark.parametrize(
        "sq,sk,h,d",
        [(256, 256, 4, 40), (256, 256, 8, 40), (128, 300, 2, 64)],
    )
    def test_matches_xla(self, sq, sk, h, d):
        from gmdx.kernels.flash_attention import flash_attention_bsc

        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (2, sq, h * d))
        k = jax.random.normal(ks[1], (2, sk, h * d))
        v = jax.random.normal(ks[2], (2, sk, h * d))
        out = flash_attention_bsc(q, k, v, h, interpret=True)
        ref = _xla_attention(
            q.reshape(2, sq, h, d), k.reshape(2, sk, h, d),
            v.reshape(2, sk, h, d), d**-0.5,
        ).reshape(2, sq, h * d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_grad_routes_through_flattened_kernels(self):
        """Differentiation must match the (B,S,H,D) entry point exactly."""
        from gmdx.kernels.flash_attention import (
            flash_attention,
            flash_attention_bsc,
        )

        h, d = 2, 40
        q = jax.random.normal(jax.random.key(0), (1, 128, h * d))
        g = jax.random.normal(jax.random.key(1), (1, 128, h * d))

        _, vjp_bsc = jax.vjp(
            lambda q_: flash_attention_bsc(q_, q_, q_, h, interpret=True), q
        )
        q4 = q.reshape(1, 128, h, d)
        _, vjp_4d = jax.vjp(
            lambda q_: flash_attention(q_, q_, q_, interpret=True), q4
        )
        got = vjp_bsc(g)[0]
        want = vjp_4d(g.reshape(1, 128, h, d))[0].reshape(1, 128, h * d)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_unsupported_head_dim_returns_none(self):
        from gmdx.kernels.flash_attention import flash_attention_bsc

        q = jax.random.normal(jax.random.key(0), (1, 128, 36))  # d=12, 12%8
        assert flash_attention_bsc(q, q, q, 3, interpret=True) is None
