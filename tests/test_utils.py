"""Checkpoint, scaling-harness, and native-extension tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.utils.checkpoint import restore_pytree, save_pytree
from flash_attention_metal_tpu.runtime import init_cache


def test_checkpoint_roundtrip_params(tmp_path):
    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "layers": [{"b": jnp.ones((2,))}, {"b": jnp.zeros((2,))}],
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    restored = restore_pytree(path, like=tree)
    for a, b in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_kv_cache_snapshot(tmp_path):
    """Decode-loop restart state: the KV cache snapshot (SURVEY.md §5)."""
    cache = init_cache(2, 2, 2, 256, 64, dtype=jnp.float32)
    cache.lengths = cache.lengths.at[0].set(7)
    path = str(tmp_path / "kv")
    save_pytree(path, cache)
    restored = restore_pytree(path, like=cache)
    assert int(restored.lengths[0]) == 7
    assert restored.k.shape == cache.k.shape


def test_scaling_harness_smoke():
    from flash_attention_metal_tpu.harness.scaling import run_scaling

    rows = run_scaling(
        n_global=512, heads=2, shard_counts=[1, 2], log=lambda *_: None
    )
    assert [r["shards"] for r in rows] == [1, 2]
    assert all(r["tokens_per_s"] > 0 for r in rows)
    assert rows[0]["scaling_efficiency"] == pytest.approx(1.0)


def test_native_extension_if_built():
    try:
        from flash_attention_metal_tpu.utils import _native_timer as nt
    except ImportError:
        pytest.skip("native extension not built (make -C native)")
    t0 = nt.monotonic_ns()
    nt.busy_wait_ns(1_000_00)
    assert nt.monotonic_ns() - t0 >= 1_000_00
    assert nt.percentile([3.0, 1.0, 2.0], 50.0) == 2.0
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.csv")
        assert nt.write_csv(p, "a,b", [[1, 2.0], ["z", None]]) == 2
        lines = open(p).read().splitlines()
        assert lines == ["a,b", "1,2", "z,"]


def test_native_csv_writer():
    """Native host extension CSV writer (skipped if not built)."""
    pytest.importorskip("flash_attention_metal_tpu.utils._native_timer")
    import os
    import tempfile

    from flash_attention_metal_tpu.utils import _native_timer

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.csv")
        n = _native_timer.write_csv(p, "a,b", [["1", "2"], [3, 4.5]])
        assert n == 2
        assert open(p).read() == "a,b\n1,2\n3,4.5\n"


def test_checked_catches_nan():
    from flash_attention_metal_tpu.utils.debug import checked

    import jax.numpy as jnp
    from jax.experimental import checkify

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    safe = checked(bad)
    safe(jnp.ones(4))  # fine
    with pytest.raises(checkify.JaxRuntimeError):
        safe(-jnp.ones(4))


def test_assert_all_finite():
    from flash_attention_metal_tpu.utils.debug import assert_all_finite

    import jax.numpy as jnp

    assert_all_finite({"a": jnp.ones(3)}, "tree")
    with pytest.raises(FloatingPointError, match="a"):
        assert_all_finite({"a": jnp.array([1.0, jnp.nan])}, "tree")


def test_measure_kernel_pair_ratio():
    """Paired measurement returns sane times and drift-matched ratio."""
    import jax.numpy as jnp

    from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

    x = jnp.ones((256, 256), jnp.float32)

    def slow(a):
        for _ in range(8):
            a = a @ a * 1e-3
        return a

    def fast(a):
        return a @ a

    out = measure_kernel_pair(
        slow, (x,), fast, (x,), iters=4, inner_hi=3, repeats=2
    )
    assert out["a_s"] > 0 and out["b_s"] > 0
    assert out["ratio"] > 1.0  # slow/fast
