"""Device-prefetch input wrapper (data/prefetch.py): batches arrive
on-device, in order, bit-identical, with producer errors surfaced."""
import numpy as np
import pytest

import jax

from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
    get_classifier_dataloader,
)
from ratio_guided_multimodal_fm_tpu.data.prefetch import (
    PrefetchLoader,
    device_prefetch,
)


def test_prefetch_preserves_batches(tmp_path):
    loader = get_classifier_dataloader(batch_size=16, train=False,
                                       root=str(tmp_path / "d"), seed=3)
    plain = [{k: np.asarray(v) for k, v in b.items()} for b in loader]
    # same epoch index => same permutation; rebuild to reset epoch counter
    loader2 = get_classifier_dataloader(batch_size=16, train=False,
                                        root=str(tmp_path / "d"), seed=3)
    pre = list(PrefetchLoader(loader2, depth=2))
    assert len(pre) == len(plain)
    for a, b in zip(plain, pre):
        assert isinstance(b["x"], jax.Array)       # device-put happened
        np.testing.assert_array_equal(a["x"], np.asarray(b["x"]))
        np.testing.assert_array_equal(a["label"], np.asarray(b["label"]))


def test_prefetch_propagates_producer_errors():
    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom in producer")

    it = device_prefetch(bad(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in producer"):
        list(it)


def test_prefetch_len_passthrough(tmp_path):
    loader = get_classifier_dataloader(batch_size=32, train=False,
                                       root=str(tmp_path / "d"))
    assert len(PrefetchLoader(loader)) == len(loader)


def test_slow_consumer_gets_sentinel():
    """End-of-epoch with a consumer slower than the producer: the queue is
    FULL when the producer finishes (depth=2, 3 items, consumer sleeping),
    and the sentinel must still arrive — a put_nowait sentinel was dropped
    on queue.Full, leaving the consumer blocked in q.get() forever."""
    import threading
    import time

    from ratio_guided_multimodal_fm_tpu.data.prefetch import device_prefetch

    out, done = [], threading.Event()

    def consume():
        for v in device_prefetch(iter([0, 1, 2]), depth=2):
            time.sleep(0.3)   # producer finishes + fills the queue meanwhile
            out.append(int(v))
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=30), "consumer never saw the end sentinel"
    assert out == [0, 1, 2]


def test_wrap_loader_axon_gate(monkeypatch):
    """On the axon tunnel backend the producer thread's device_put racing
    the main thread's compile deadlocks the client (2026-08-17, 4/4
    repro) — wrap_loader must auto-disable prefetch there unless
    RGMF_PREFETCH=1 forces it back on."""
    import types

    from ratio_guided_multimodal_fm_tpu.cli.common import wrap_loader

    loader = [1, 2, 3]
    args = types.SimpleNamespace()

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("RGMF_PREFETCH", raising=False)
    assert wrap_loader(loader, args) is loader

    monkeypatch.setenv("RGMF_PREFETCH", "1")
    assert isinstance(wrap_loader(loader, args), PrefetchLoader)

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("RGMF_PREFETCH", raising=False)
    assert isinstance(wrap_loader(loader, args), PrefetchLoader)

    # the explicit flag still wins everywhere
    assert wrap_loader(loader,
                       types.SimpleNamespace(no_prefetch=True)) is loader
