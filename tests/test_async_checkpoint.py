"""Async Orbax saves: non-blocking write, read-after-write via wait."""
import jax
import numpy as np

from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    wait_for_saves,
)


def test_async_save_roundtrip(tmp_path):
    tree = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.float64(1.5)}
    path = str(tmp_path / "async_ck")
    save_checkpoint(path, tree, async_save=True)
    # load_checkpoint waits for in-flight saves internally
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["w"], tree["w"])
    assert float(restored["b"]) == 1.5
    wait_for_saves()  # idempotent
