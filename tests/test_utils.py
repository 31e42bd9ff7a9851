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
