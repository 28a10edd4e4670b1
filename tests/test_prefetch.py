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
