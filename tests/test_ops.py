"""Golden tests for gmdx.ops against the closed-form reference math.

Goldens are computed with torch (CPU) from the formulas at
reference tone_mapping.py:14-90 / augmentations.py:13-79 — independent
implementations, not imports of the reference package.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gmdx.ops import (
    apply_gm_to_sdr,
    fix_mulog_tmo,
    gamut_compress,
    hard_clip_tmo,
    linear_scale_tmo,
    random_tmo,
    tmo_mulog,
    random_exposure_adjust,
    sample_camera_curve,
    apply_inv_sigmoid_curve,
    discretize_to_uint16,
    hdr_to_ldr,
    RandomExposureAdjust,
)

RTOL = 1e-5
ATOL = 1e-6


@pytest.fixture
def hdr_batch():
    rng = np.random.default_rng(0)
    return rng.uniform(0.0, 50.0, size=(2, 3, 16, 16)).astype(np.float32)


def torch_golden_mulog(x, qmax, mu):
    x = torch.tensor(x) / (qmax + 1)
    return torch.clamp(torch.log1p(mu * x) / math.log1p(mu), 0, 1).numpy()


class TestTMO:
    def test_linear_scale(self, hdr_batch):
        got = linear_scale_tmo(jnp.asarray(hdr_batch), 49.0)
        np.testing.assert_allclose(got, hdr_batch / 50.0, rtol=RTOL)

    def test_hard_clip(self, hdr_batch):
        got = hard_clip_tmo(jnp.asarray(hdr_batch), 49.0)
        np.testing.assert_allclose(got, np.clip(hdr_batch, 0, 1), rtol=RTOL)

    @pytest.mark.parametrize("qmax", [9.0, 49.0, 99.0])
    def test_fix_mulog(self, hdr_batch, qmax):
        got = fix_mulog_tmo(jnp.asarray(hdr_batch), qmax)
        want = torch_golden_mulog(hdr_batch, qmax, 500.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_tmo_mulog(self, hdr_batch):
        got = tmo_mulog(jnp.asarray(hdr_batch))
        x = torch.clamp(torch.tensor(hdr_batch) / 10, 0, 1)
        want = (torch.log1p(5000.0 * x) / math.log1p(5000.0)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_random_tmo_in_range_and_deterministic(self, hdr_batch):
        key = jax.random.key(7)
        a = random_tmo(key, jnp.asarray(hdr_batch), 49.0)
        b = random_tmo(key, jnp.asarray(hdr_batch), 49.0)
        np.testing.assert_array_equal(a, b)
        assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
        c = random_tmo(jax.random.key(8), jnp.asarray(hdr_batch), 49.0)
        assert not np.allclose(a, c)

    def test_jittable(self, hdr_batch):
        f = jax.jit(lambda x: fix_mulog_tmo(x, 49.0))
        np.testing.assert_allclose(
            f(jnp.asarray(hdr_batch)),
            fix_mulog_tmo(jnp.asarray(hdr_batch), 49.0),
            rtol=RTOL,
        )


class TestApplyGmToSdr:
    @pytest.mark.parametrize("qmax", [9.0, 49.0, 99.0])
    def test_matches_torch_clamped(self, qmax):
        rng = np.random.default_rng(1)
        gm = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
        sdr = rng.uniform(-0.2, 1.2, (2, 3, 8, 8)).astype(np.float32)
        eps = 1 / 64
        sdr_lin = torch.clamp(torch.tensor(sdr), 0, 1) ** 2.2
        want = torch.clamp(
            (sdr_lin + eps) * (1 + torch.tensor(gm) * qmax) - eps, 0, qmax + 1
        ).numpy()
        got = apply_gm_to_sdr(jnp.asarray(gm), jnp.asarray(sdr), qmax)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_unclamped_matches_numpy_twin(self):
        # The experiments' numpy twin (formal_baseline.py:32-43) skips the
        # output clamp; clip_output=False must reproduce it.
        rng = np.random.default_rng(2)
        gm = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        sdr = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        qmax, eps = 99.0, 1 / 64
        want = (np.clip(sdr, 0, 1) ** 2.2 + eps) * (1 + gm * qmax) - eps
        got = apply_gm_to_sdr(
            jnp.asarray(gm), jnp.asarray(sdr), qmax, clip_output=False
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_zero_gm_is_gamma_only(self):
        sdr = jnp.linspace(0, 1, 16).reshape(1, 1, 4, 4)
        got = apply_gm_to_sdr(jnp.zeros_like(sdr), sdr, 49.0)
        np.testing.assert_allclose(got, jnp.clip(sdr, 0, 1) ** 2.2, atol=1e-6)


class TestGamut:
    def test_matches_torch_nchw(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
        m = torch.tensor(
            [
                [1.660491, -0.587641, -0.072850],
                [-0.124550, 1.132900, -0.008349],
                [-0.018151, -0.100579, 1.118730],
            ]
        ).t()
        t = torch.tensor(img).permute(0, 2, 3, 1)
        want = torch.clamp(torch.matmul(t, m).permute(0, 3, 1, 2), 0, 1).numpy()
        got = gamut_compress(jnp.asarray(img))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_nhwc_axis(self):
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        got = gamut_compress(jnp.asarray(img), channel_axis=-1)
        want = gamut_compress(jnp.asarray(img.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            got, want.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6
        )


class TestExposure:
    def test_curve_matches_torch(self):
        y = np.random.default_rng(5).uniform(0, 1, (3, 8, 8)).astype(np.float32)
        n, sigma = 0.65, 0.6
        want = torch.pow(
            (sigma * torch.tensor(y)) / (1 + sigma - torch.tensor(y) + 1e-8), 1.0 / n
        ).numpy()
        got = apply_inv_sigmoid_curve(jnp.asarray(y), jnp.float32(n), jnp.float32(sigma))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_discretize_matches_torch(self):
        x = np.random.default_rng(6).uniform(0, 1, (64,)).astype(np.float32)
        want = (torch.clamp(torch.tensor(x) * 65535, 0, 65535).round() / 65535).numpy()
        got = discretize_to_uint16(jnp.asarray(x))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_hdr_to_ldr_matches_torch(self):
        x = np.random.default_rng(7).uniform(0, 2, (64,)).astype(np.float32)
        want = torch.pow(torch.clamp(torch.tensor(x) * 4.0, 0, 1), 1 / 2.2).numpy()
        got = hdr_to_ldr(jnp.asarray(x), jnp.float32(4.0))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_camera_curve_params_in_bounds(self):
        for seed in range(20):
            n, sigma = sample_camera_curve(jax.random.key(seed))
            tol = 1e-6  # float32 representation of the clip bounds
            assert 0.4 - tol <= float(n) <= 0.9 + tol
            assert 0.4 - tol <= float(sigma) <= 0.8 + tol

    def test_full_chain_deterministic_and_in_range(self):
        imgs = jax.random.uniform(jax.random.key(0), (2, 3, 16, 16))
        out1, meta1 = random_exposure_adjust(jax.random.key(1), imgs)
        out2, _ = random_exposure_adjust(jax.random.key(1), imgs)
        np.testing.assert_array_equal(out1, out2)
        assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
        assert float(meta1["exposure"]) in [0.1, 0.25, 0.5, 1.0, 4.0, 8.0, 16.0]

    def test_prob_zero_is_identity(self):
        imgs = jax.random.uniform(jax.random.key(2), (3, 8, 8))
        out, meta = random_exposure_adjust(jax.random.key(3), imgs, prob=0.0)
        np.testing.assert_array_equal(out, imgs)
        assert float(meta["exposure"]) == 1.0

    def test_class_wrapper(self):
        aug = RandomExposureAdjust()
        imgs = jax.random.uniform(jax.random.key(4), (3, 8, 8))
        out, meta = aug(jax.random.key(5), imgs, return_metadata=True)
        assert out.shape == imgs.shape
        assert set(meta) == {"exposure", "n", "sigma"}
        assert "gamma=2.2" in repr(aug)

    def test_vmap_per_sample_draws(self):
        imgs = jax.random.uniform(jax.random.key(6), (4, 3, 8, 8))
        keys = jax.random.split(jax.random.key(7), 4)
        out, meta = jax.vmap(random_exposure_adjust)(keys, imgs)
        assert out.shape == imgs.shape
        assert len(set(np.asarray(meta["exposure"]).tolist())) > 1


class TestTmo2446a:
    """ITU-R BT.2446-A (the reference's dead --tmo_2446a flag, implemented)."""

    def _ramp(self):
        # Gray ramp NCHW: every channel equal, luminance == channel value.
        v = np.linspace(0.0, 1.0, 64, dtype=np.float32)
        return np.tile(v[None, None, None, :], (1, 3, 2, 1))

    def test_endpoints_and_range(self):
        from gmdx.ops import tmo_2446a

        out = np.asarray(tmo_2446a(jnp.asarray(self._ramp())))
        assert out.min() >= 0.0 and out.max() <= 1.0
        np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)
        # Peak white (normalized 1.0) maps to SDR peak 1.0: the knee's top
        # segment is 0.5*y+0.5 so y'=1 -> 1 exactly.
        np.testing.assert_allclose(out[..., -1], 1.0, atol=1e-4)

    def test_monotone_on_gray(self):
        from gmdx.ops import tmo_2446a

        out = np.asarray(tmo_2446a(jnp.asarray(self._ramp())))[0, 0, 0]
        assert np.all(np.diff(out) > -1e-6)

    def test_compresses_highlights(self):
        from gmdx.ops import tmo_2446a

        out = np.asarray(tmo_2446a(jnp.asarray(self._ramp())))[0, 0, 0]
        v = np.linspace(0.0, 1.0, 64)
        # Tone curve brightens shadows/mids relative to linear and keeps
        # highlights below identity-plus-epsilon (knee compresses the top).
        assert out[8] > v[8]
        mid = slice(16, 48)
        assert np.all(out[mid] >= v[mid] - 1e-4)

    def test_gray_matches_scalar_mirror(self):
        from gmdx.ops import tmo_2446a

        # Independent numpy mirror of the standard's luminance path (on gray,
        # crosstalk is identity and gain applies uniformly).
        def mirror(y, l_hdr=1000.0, l_sdr=100.0):
            yp = np.clip(y, 1e-6, 1.0) ** (1 / 2.4)
            rho_h = 1 + 32 * (l_hdr / 10000.0) ** (1 / 2.4)
            ypp = np.log(1 + (rho_h - 1) * yp) / np.log(rho_h)
            if ypp <= 0.7399:
                yc = 1.0770 * ypp
            elif ypp < 0.9909:
                yc = -1.1510 * ypp**2 + 2.7811 * ypp - 0.6302
            else:
                yc = 0.5 * ypp + 0.5
            rho_s = 1 + 32 * (l_sdr / 10000.0) ** (1 / 2.4)
            y_sdr = ((rho_s**yc - 1) / (rho_s - 1)) ** 2.4
            return np.clip(y * (y_sdr / max(y, 1e-6)), 0, 1)

        vals = np.array([0.01, 0.1, 0.3, 0.6, 0.9, 1.0], dtype=np.float32)
        img = np.tile(vals[None, None, None, :], (1, 3, 1, 1))
        out = np.asarray(tmo_2446a(jnp.asarray(img)))[0, 0, 0]
        expect = np.array([mirror(v) for v in vals])
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_crosstalk_roundtrip_identity_on_gray(self):
        from gmdx.ops import tmo_2446a

        # alpha=0 vs default alpha must agree on gray images (crosstalk is
        # identity there) — checks the inverse-crosstalk algebra.
        img = jnp.asarray(self._ramp())
        a0 = np.asarray(tmo_2446a(img, alpha=0.0))
        a5 = np.asarray(tmo_2446a(img))
        np.testing.assert_allclose(a0, a5, rtol=1e-4, atol=1e-5)

    def test_channel_axis_polymorphic(self):
        from gmdx.ops import tmo_2446a

        rng = np.random.default_rng(7)
        img = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
        nchw = np.asarray(tmo_2446a(jnp.asarray(img)))
        nhwc = np.asarray(
            tmo_2446a(jnp.asarray(img.transpose(0, 2, 3, 1)), channel_axis=-1)
        )
        np.testing.assert_allclose(nchw, nhwc.transpose(0, 3, 1, 2), rtol=1e-5)

    def test_jittable_and_trainer_wrapper(self):
        import sys

        from gmdx.ops import tmo_2446a

        sys.path.insert(0, "scripts/stage1")
        from train_vqgan_lora import choose_tmo

        fn = choose_tmo("fix_mulog", use_2446a=True)
        hdr = jnp.asarray(
            np.random.default_rng(1).uniform(0, 50, (2, 3, 8, 8)).astype(np.float32)
        )
        out = jax.jit(lambda x: fn(x, qmax=49.0))(hdr)
        assert out.shape == hdr.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        direct = tmo_2446a(hdr / 50.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct), rtol=1e-5)
