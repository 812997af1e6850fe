"""Data pipeline: shards, deterministic resumable batching, prefetch."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.utils.data import (
    TokenDataset,
    batch_iterator,
    prefetch_to_device,
    write_token_shard,
)


@pytest.fixture()
def shards(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([1000, 700]):
        p = str(tmp_path / f"shard{i}.bin")
        write_token_shard(p, rng.integers(0, 50000, size=n))
        paths.append(p)
    return paths


def test_dataset_windows(shards):
    ds = TokenDataset(shards)
    assert ds.n_tokens == 1700
    w = 16
    n = ds.n_windows(w - 1)  # seq_len 15 -> window 16
    assert n == 1000 // w + 700 // w
    first = ds.window(0, w - 1)
    assert first.shape == (w,)
    # Windows are disjoint and in-shard contiguous.
    second = ds.window(1, w - 1)
    raw = np.fromfile(shards[0], dtype=np.uint16)
    np.testing.assert_array_equal(first, raw[:w])
    np.testing.assert_array_equal(second, raw[w : 2 * w])


def test_uint32_roundtrip(tmp_path):
    p = str(tmp_path / "big.bin")
    toks = np.asarray([0, 70000, 123456])
    write_token_shard(p, toks)
    ds = TokenDataset([p])
    np.testing.assert_array_equal(ds.window(0, 2), toks)


def test_batches_deterministic_and_resumable(shards):
    ds = TokenDataset(shards)
    kw = dict(batch_size=4, seq_len=15, seed=7)
    a = [(b.copy(), tag) for b, tag in batch_iterator(ds, **kw, epochs=2)]
    b = [(b_.copy(), tag) for b_, tag in batch_iterator(ds, **kw, epochs=2)]
    assert len(a) == len(b) > 0
    for (xa, ta), (xb, tb) in zip(a, b):
        assert ta == tb
        np.testing.assert_array_equal(xa, xb)
    # Resume mid-stream: batches after (epoch, step) match the fresh run.
    e, s = a[3][1]
    resumed = batch_iterator(
        ds, **kw, epochs=2, start_epoch=e, start_step=s
    )
    for want, got in zip(a[3:], resumed):
        assert want[1] == got[1]
        np.testing.assert_array_equal(want[0], got[0])


def test_host_sharding_disjoint(shards):
    ds = TokenDataset(shards)
    kw = dict(batch_size=2, seq_len=15, seed=3, epochs=1)
    rows = [
        tuple(r)
        for host in range(2)
        for batch, _ in batch_iterator(ds, **kw, host_id=host, num_hosts=2)
        for r in batch
    ]
    assert len(rows) == len(set(rows))  # no window served twice


def test_prefetch_passthrough(shards):
    ds = TokenDataset(shards)
    it = batch_iterator(ds, batch_size=2, seq_len=15, epochs=1)
    out = list(prefetch_to_device(it, size=3))
    assert len(out) > 0
    batch, (epoch, step) = out[0]
    assert epoch == 0 and step == 0
    assert batch.shape == (2, 16)
    assert jnp.asarray(batch).dtype == jnp.int32


def test_trainer_from_shards(shards):
    """End-to-end: memmapped shards -> prefetched batches -> Trainer."""
    import jax

    from flash_attention_metal_tpu.models import ModelConfig
    from flash_attention_metal_tpu.models.trainer import Trainer

    cfg = ModelConfig(
        vocab_size=50304,
        d_model=128,
        n_layers=1,
        n_heads=2,
        n_kv_heads=2,
        head_dim=64,
        d_ff=128,
        max_seq_len=128,
        dtype=jnp.float32,
    )
    ds = TokenDataset(shards)
    stream = (
        b
        for b, _ in prefetch_to_device(
            batch_iterator(ds, batch_size=2, seq_len=63, seed=1)
        )
    )
    tr = Trainer(cfg, seed=0)
    out = tr.train(stream, steps=3)
    assert len(out["losses"]) == 3
    assert all(np.isfinite(l) for l in out["losses"])
