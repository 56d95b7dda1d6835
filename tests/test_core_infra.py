"""Unit tests: checkpoint manager policy, loader sharding/determinism,
schedules, prng."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core import checkpoint as ckpt
from tpuseg.core import optim
from tpuseg.core.prng import step_key
from tpuseg.data.dataset import ArrayDataset, DataLoader


def test_checkpoint_roundtrip_and_best_policy():
    d = tempfile.mkdtemp()
    mgr = ckpt.CheckpointManager(d, mode="max", async_write=False)
    state = {"w": jnp.asarray([1.0, 2.0]), "step": jnp.asarray(3, jnp.int32)}
    assert mgr.maybe_save_best(state, 3, 0.5)
    assert not mgr.maybe_save_best(state, 4, 0.4)  # worse → not saved
    state2 = {"w": jnp.asarray([9.0, 9.0]), "step": jnp.asarray(7, jnp.int32)}
    assert mgr.maybe_save_best(state2, 7, 0.9)
    restored, meta = mgr.restore(state, "best")
    np.testing.assert_array_equal(np.asarray(restored["w"]), [9.0, 9.0])
    assert meta["metric"] == 0.9
    # a fresh manager picks up the persisted best metric
    mgr2 = ckpt.CheckpointManager(d, mode="max")
    assert mgr2.best_metric == 0.9


def test_checkpoint_min_mode():
    d = tempfile.mkdtemp()
    mgr = ckpt.CheckpointManager(d, mode="min", async_write=False)
    s = {"x": jnp.zeros(2)}
    assert mgr.maybe_save_best(s, 1, 1.0)
    assert mgr.maybe_save_best(s, 2, 0.5)
    assert not mgr.maybe_save_best(s, 3, 0.7)


def test_dataloader_host_sharding():
    ds = ArrayDataset([{"v": np.asarray([i])} for i in range(16)])
    seen = []
    for idx in range(4):
        loader = DataLoader(ds, batch_size=2, shuffle=False, host_shard=(idx, 4))
        for b in loader:
            seen.extend(b["v"][:, 0].tolist())
    assert sorted(seen) == list(range(16))  # disjoint cover


def test_dataloader_shuffle_deterministic():
    ds = ArrayDataset([{"v": np.asarray([i])} for i in range(12)])
    l1 = DataLoader(ds, batch_size=4, shuffle=True, seed=5)
    l2 = DataLoader(ds, batch_size=4, shuffle=True, seed=5)
    o1 = [b["v"].tolist() for b in l1]
    o2 = [b["v"].tolist() for b in l2]
    assert o1 == o2
    # next epoch differs
    o3 = [b["v"].tolist() for b in l1]
    assert o3 != o1


def test_dataloader_pad_last_batch():
    ds = ArrayDataset([{"v": np.asarray([i])} for i in range(5)])
    loader = DataLoader(ds, batch_size=2, drop_last=False, prefetch=0)
    shapes = [b["v"].shape for b in loader]
    assert all(s == (2, 1) for s in shapes)  # static shape kept by padding
    assert len(shapes) == 3


def test_cosine_and_warmup_schedules():
    s = optim.cosine_schedule(1.0, 100)
    assert float(s(jnp.asarray(0.0))) == 1.0
    np.testing.assert_allclose(float(s(jnp.asarray(100.0))), 0.0, atol=1e-6)
    w = optim.warmup_cosine_schedule(1.0, 10, 110)
    np.testing.assert_allclose(float(w(jnp.asarray(5.0))), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(w(jnp.asarray(110.0))), 0.0, atol=1e-6)


def test_step_key_deterministic_and_distinct():
    base = jax.random.key(0)
    k1 = step_key(base, jnp.asarray(1, jnp.int32))
    k1b = step_key(base, jnp.asarray(1, jnp.int32))
    k2 = step_key(base, jnp.asarray(2, jnp.int32))
    assert jnp.all(jax.random.key_data(k1) == jax.random.key_data(k1b))
    assert not jnp.all(jax.random.key_data(k1) == jax.random.key_data(k2))

def test_dataloader_prefetch_propagates_errors():
    """ADVICE r1: a failing __getitem__ must raise in the consumer, not
    silently truncate the epoch."""
    import pytest

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise IOError("unreadable file")
            return {"v": np.asarray([i])}

    loader = DataLoader(Bad(), batch_size=2, shuffle=False, prefetch=2)
    with pytest.raises(IOError, match="unreadable"):
        for _ in loader:
            pass


def test_dataloader_prefetch_early_exit_terminates_producer():
    """Breaking out of the iterator must not leave the producer thread
    blocked on the queue."""
    import threading

    ds = ArrayDataset([{"v": np.asarray([i])} for i in range(64)])
    loader = DataLoader(ds, batch_size=2, shuffle=False, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # generator finalization = consumer early exit
    deadline = 50
    while deadline and any(
        t.name.startswith("Thread") and "producer" in repr(t)
        for t in threading.enumerate()
    ):
        deadline -= 1
    # a fresh full epoch still works after the aborted one
    assert sum(1 for _ in loader) == 32


def test_checkpoint_save_never_loses_both_copies(tmp_path):
    """ADVICE r1: crash between rmtree and replace lost old+new 'latest'.
    The swap now renames aside; the .old fallback restores through a
    simulated crash window."""
    import shutil

    p = str(tmp_path / "latest")
    ckpt.save(p, {"w": jnp.asarray([1.0])}, {"step": 1})
    ckpt.save(p, {"w": jnp.asarray([2.0])}, {"step": 2})
    assert ckpt.exists(p)
    got = ckpt.restore(p, {"w": jnp.zeros(1)})
    np.testing.assert_array_equal(np.asarray(got["w"]), [2.0])
    # simulate a crash after the old dir was moved aside but before the
    # new one swung in: primary missing, .old present
    shutil.move(p, p + ".old")
    assert ckpt.exists(p)
    got = ckpt.restore(p, {"w": jnp.zeros(1)})
    np.testing.assert_array_equal(np.asarray(got["w"]), [2.0])
    assert ckpt.read_meta(p)["step"] == 2


def test_psnr_finite_on_zero_mse():
    from tpuseg.metrics.online import psnr

    x = jnp.ones((2, 16))
    v = float(psnr(x, x))
    assert np.isfinite(v) and v > 60.0


def test_sharded_checkpoint_cross_topology(tmp_path):
    """VERDICT r2 #5: a checkpoint written under a (2,2,2) dp x tp x sp mesh
    must restore under a flat (8,) data mesh (and carry the new shardings)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    mesh_a = Mesh(devs.reshape(2, 2, 2), ("data", "model", "space"))
    mesh_b = Mesh(devs.reshape(8), ("data",))

    w = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    b = np.arange(32, dtype=np.float32)
    state = {
        "w": jax.device_put(w, NamedSharding(mesh_a, P("data", "model"))),
        "b": jax.device_put(b, NamedSharding(mesh_a, P("space"))),
        "step": jax.device_put(np.asarray(5, np.int32), NamedSharding(mesh_a, P())),
    }
    path = str(tmp_path / "sharded_ckpt")
    ckpt.save_sharded(path, state, {"step": 5, "metric": 0.9})

    target = {
        "w": jax.ShapeDtypeStruct(
            (8, 16), np.float32, sharding=NamedSharding(mesh_b, P("data"))
        ),
        "b": jax.ShapeDtypeStruct(
            (32,), np.float32, sharding=NamedSharding(mesh_b, P())
        ),
        "step": jax.ShapeDtypeStruct(
            (), np.int32, sharding=NamedSharding(mesh_b, P())
        ),
    }
    restored = ckpt.restore_sharded(path, target)
    np.testing.assert_array_equal(np.asarray(restored["w"]), w)
    np.testing.assert_array_equal(np.asarray(restored["b"]), b)
    assert int(restored["step"]) == 5
    assert restored["w"].sharding.is_equivalent_to(
        NamedSharding(mesh_b, P("data")), 2
    )
    assert ckpt.read_meta_sharded(path)["metric"] == 0.9


def test_checkpoint_manager_sharded_mode(tmp_path):
    """CheckpointManager(sharded=True) routes best/latest through orbax and
    restores with metadata."""
    mgr = ckpt.CheckpointManager(str(tmp_path), mode="max", sharded=True)
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(1, jnp.int32)}
    mgr.save_latest(state, step=1, metric=0.3, epoch=2)
    assert mgr.maybe_save_best(state, 1, 0.3)
    restored, meta = mgr.restore(state, "latest")
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))
    assert meta["epoch"] == 2
    # a fresh sharded manager picks up the persisted best metric
    mgr2 = ckpt.CheckpointManager(str(tmp_path), mode="max", sharded=True)
    assert mgr2.best_metric == 0.3
