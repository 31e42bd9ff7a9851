"""gmdx.utils: timing/sync/profiling helpers.

The reference's instrumentation surface is the AverageMeter wall-clock pair
(train_vqgan_lora.py:71-87); gmdx adds a true device barrier (``sync``)
because tunneled TPU backends can return from ``block_until_ready`` before
the first dispatch of a fresh executable completes (BENCHNOTES.md round 2).
"""

import jax
import jax.numpy as jnp

from gmdx.utils import AverageMeter, StepTimer, enable_compilation_cache, sync


class TestSync:
    def test_returns_tree_unchanged(self):
        tree = {"a": jnp.arange(4.0), "b": (jnp.zeros((2, 3)), None, 7)}
        out = sync(tree)
        assert out is tree

    def test_blocks_on_computation(self):
        # The value read back must reflect the finished computation.
        x = jnp.full((128,), 3.0)
        y = sync(x * 2.0)
        assert float(y[0]) == 6.0

    def test_empty_and_scalar_leaves(self):
        sync({"empty": jnp.zeros((0, 4)), "scalar": jnp.float32(1.5)})

    def test_non_array_leaves_ignored(self):
        sync(["string", 3, None, {"k": jnp.ones(2)}])


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(2.0)
        m.update(4.0, n=3)
        assert m.val == 4.0
        assert m.count == 4
        assert abs(m.avg - 3.5) < 1e-9
        m.reset()
        assert m.count == 0 and m.avg == 0.0

    def test_step_timer_counts_samples(self):
        t = StepTimer()
        t.mark_data()
        t.mark_step(8)
        t.mark_data()
        t.mark_step(8)
        s = t.scalars()
        assert s["samples_per_sec"] > 0
        assert t.batch_time.count == 2


def test_compilation_cache_path(tmp_path):
    d = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d


class TestExportCache:
    """cached_export: persistent traced-program cache (jax.export artifacts).

    Warm processes skip re-tracing entirely — the mechanism behind bench.py's
    sub-two-minute warm warmup (export_cache.py docstring has the numbers)."""

    def _fn(self, x, y):
        return {"s": x @ y, "t": (x.sum(), y * 2)}

    def test_round_trip_and_hit(self, tmp_path):
        from gmdx.utils import cached_export

        x = jnp.arange(12.0).reshape(3, 4)
        y = jnp.ones((4, 2))
        ref = jax.jit(self._fn)(x, y)

        call = cached_export(self._fn, x, y, key="t", cache_dir=str(tmp_path))
        out = call(x, y)
        files = list(tmp_path.glob("t-*.jaxexp"))
        assert len(files) == 1

        # Second construction must load the artifact, not re-trace: poison
        # the function so a re-trace would raise.
        def poisoned(x, y):
            raise AssertionError("re-traced despite cache hit")

        call2 = cached_export(poisoned, x, y, key="t", cache_dir=str(tmp_path))
        out2 = call2(x, y)
        for a, b, c in zip(
            jax.tree_util.tree_leaves(ref),
            jax.tree_util.tree_leaves(out),
            jax.tree_util.tree_leaves(out2),
        ):
            assert jnp.allclose(a, b) and jnp.allclose(a, c)

    def test_key_tracks_avals_and_env(self, tmp_path, monkeypatch):
        from gmdx.utils import cached_export

        x = jnp.ones((3, 4))
        y = jnp.ones((4, 2))
        cached_export(self._fn, x, y, key="t", cache_dir=str(tmp_path))
        cached_export(  # different shapes -> second artifact
            self._fn, jnp.ones((5, 4)), y, key="t", cache_dir=str(tmp_path)
        )
        before = {p.name for p in tmp_path.glob("t-*.jaxexp")}
        assert len(before) == 2  # sibling shape variants coexist (not pruned)
        # GMDX_* env selects kernels at trace time -> must change the key.
        # The stale same-shape artifact is PRUNED (superseded revision,
        # _prune_stale), so the count stays 2 but the name set changes.
        monkeypatch.setenv("GMDX_WINOGRAD", "0")
        cached_export(self._fn, x, y, key="t", cache_dir=str(tmp_path))
        after = {p.name for p in tmp_path.glob("t-*.jaxexp")}
        assert len(after) == 2 and after != before

    def test_corrupt_artifact_recovers(self, tmp_path):
        from gmdx.utils import cached_export

        x = jnp.ones((2, 2))
        y = jnp.ones((2, 2))
        cached_export(self._fn, x, y, key="t", cache_dir=str(tmp_path))
        (f,) = tmp_path.glob("t-*.jaxexp")
        f.write_bytes(b"garbage")
        out = cached_export(self._fn, x, y, key="t", cache_dir=str(tmp_path))(x, y)
        assert jnp.allclose(out["s"], jax.jit(self._fn)(x, y)["s"])

    def test_disabled_falls_back_to_jit(self, monkeypatch):
        from gmdx.utils import cached_export

        monkeypatch.setenv("GMDX_EXPORT_CACHE", "0")
        x = jnp.ones((2, 2))
        out = cached_export(self._fn, x, x, key="t")(x, x)
        assert jnp.allclose(out["s"], jax.jit(self._fn)(x, x)["s"])
