"""Export parity: convert Flax trees to reference torch state_dicts and
assert (a) export(import(sd)) == sd bit-for-bit for every model family, and
(b) the reference's own torch models, loaded with our exported weights
(strict=True), produce outputs identical to our Flax models — the reverse
direction of tests/test_torch_import.py, closing the migration round-trip.

num_batches_tracked is excluded from the bit-exact comparison: the importer
drops it (neither framework reads it at inference) and the exporter
synthesizes 0, while a torch model that has seen training batches stores
the batch count.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "src", "models")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ratio_guided_multimodal_fm_tpu.interop import (  # noqa: E402
    export_state_dict,
    import_state_dict,
)

TORCH_EPS = 1e-5


def _nhwc(x: "torch.Tensor") -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def _max_err(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


def _assert_roundtrip(sd, kind: str) -> None:
    back = export_state_dict(import_state_dict(sd, kind), kind)
    ref_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    got_keys = {k for k in back if not k.endswith("num_batches_tracked")}
    assert got_keys == ref_keys, (
        f"{kind}: missing {sorted(ref_keys - got_keys)[:5]}, "
        f"extra {sorted(got_keys - ref_keys)[:5]}")
    for k in sorted(ref_keys):
        want = sd[k].detach().cpu().numpy()
        got = np.asarray(back[k])
        assert got.shape == want.shape, (kind, k, got.shape, want.shape)
        assert np.array_equal(got, want), (kind, k, _max_err(got, want))


@pytest.fixture(autouse=True)
def _torch_seed():
    torch.manual_seed(99)


def _bn_warm(tm, *shapes):
    """Run a few training batches so BN running stats are nontrivial."""
    with torch.no_grad():
        tm.train()
        for _ in range(3):
            tm(*(torch.randn(8, *s) for s in shapes))
        tm.eval()


def test_roundtrip_bit_exact_all_families():
    from src.models.classifier import MNISTClassifier
    from src.models.flow_matching import FlowMatchingModel
    from src.models.ratio_estimator import RatioEstimator
    from src.models.ratio_flexible import RatioEstimatorMNISTSVHN
    from src.models.svhn_classifier import MNISTClassifier32, SVHNClassifier
    from src.models.unet_flexible import (
        FlowMatchingUNetMNIST,
        FlowMatchingUNetSVHN,
    )

    _assert_roundtrip(FlowMatchingUNetMNIST(img_size=28).state_dict(),
                      "unet_mnist")
    _assert_roundtrip(FlowMatchingUNetSVHN().state_dict(), "unet_svhn")
    _assert_roundtrip(FlowMatchingModel().state_dict(), "fm_original")
    _assert_roundtrip(RatioEstimator().state_dict(), "ratio")

    tm = RatioEstimatorMNISTSVHN()
    _bn_warm(tm, (1, 32, 32), (3, 32, 32))
    _assert_roundtrip(tm.state_dict(), "ratio_mnist_svhn")

    _assert_roundtrip(MNISTClassifier().state_dict(), "classifier_mnist")
    _assert_roundtrip(MNISTClassifier32().state_dict(), "classifier_mnist32")
    tc = SVHNClassifier()
    _bn_warm(tc, (3, 32, 32))
    _assert_roundtrip(tc.state_dict(), "classifier_svhn")


def test_exported_unet_drives_reference_model():
    """JAX -> torch direction: a natively-initialized Flax U-Net's exported
    weights load into the reference model (strict) and produce identical
    outputs."""
    from src.models.unet_flexible import FlowMatchingUNetMNIST as TorchNet

    from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetMNIST

    net = FlowMatchingUNetMNIST(img_size=28, norm_eps=TORCH_EPS)
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 28, 28, 1)),
                      jnp.zeros((1,)))["params"]
    # out_conv is zero-init by parity — perturb so the comparison is real
    params["out_conv"]["kernel"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(4), params["out_conv"]["kernel"].shape)

    sd = export_state_dict({"params": params}, "unet_mnist")
    tm = TorchNet(img_size=28)
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    tm.eval()

    x = torch.randn(2, 1, 28, 28)
    t = torch.rand(2)
    with torch.no_grad():
        ref = tm(x, t).numpy()
    assert np.abs(ref).max() > 0.05
    ours = np.asarray(net.apply({"params": params}, _nhwc(x),
                                jnp.asarray(t.numpy())))
    assert _max_err(ours.transpose(0, 3, 1, 2), ref) < 1e-4


def test_exported_ratio_mnist_svhn_drives_reference_model():
    """BatchNorm family: params + batch_stats export; strict torch load."""
    from src.models.ratio_flexible import RatioEstimatorMNISTSVHN as TorchNet

    from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNISTSVHN

    net = RatioEstimatorMNISTSVHN(norm_eps=TORCH_EPS)
    variables = net.init(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 1)),
                         jnp.zeros((1, 32, 32, 3)))
    # perturb running stats off the (0,1) init so batch_stats are exercised
    variables = jax.tree_util.tree_map(lambda a: np.array(a), variables)
    bs = variables["batch_stats"]
    bs["encoder_mnist"]["bn1"]["mean"] += 0.3
    bs["encoder_mnist"]["bn1"]["var"] *= 1.7

    sd = export_state_dict(variables, "ratio_mnist_svhn")
    tm = TorchNet()
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
         else torch.tensor(int(v)) for k, v in sd.items()}, strict=True)
    tm.eval()

    x = torch.randn(2, 1, 32, 32)
    y = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x, y).numpy()
    ours = np.asarray(net.apply(
        {"params": variables["params"], "batch_stats": bs},
        _nhwc(x), _nhwc(y)))
    assert _max_err(ours, ref) < 1e-4, _max_err(ours, ref)


def test_export_requires_batch_stats_for_bn_families():
    from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNISTSVHN

    net = RatioEstimatorMNISTSVHN()
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)),
                         jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="batch_stats"):
        export_state_dict({"params": variables["params"]},
                          "ratio_mnist_svhn")


def test_export_cli_roundtrip(tmp_path):
    """cli.export_torch: Orbax checkpoint -> .pth the reference can load."""
    from src.models.classifier import MNISTClassifier as TorchNet

    from ratio_guided_multimodal_fm_tpu.cli.export_torch import main
    from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        save_checkpoint,
    )

    net = MNISTClassifier()
    params = net.init(jax.random.PRNGKey(7), jnp.zeros((1, 28, 28, 1)))
    ckpt = tmp_path / "mnist_classifier"
    save_checkpoint(str(ckpt), jax.tree_util.tree_map(np.asarray,
                                                      params["params"]))
    out = tmp_path / "mnist_classifier.pth"
    rc = main(["--checkpoint", str(ckpt), "--model", "classifier_mnist",
               "--out", str(out)])
    assert rc == 0 and out.exists()

    sd = torch.load(str(out), map_location="cpu", weights_only=True)
    tm = TorchNet()
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    x = torch.randn(2, 1, 28, 28)
    with torch.no_grad():
        ref = tm(x).numpy()
    ours = np.asarray(net.apply(params, _nhwc(x)))
    assert _max_err(ours, ref) < 1e-4
