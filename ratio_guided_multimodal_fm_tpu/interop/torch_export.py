"""Export this framework's Flax parameter trees as reference PyTorch
state_dicts (.pth) — the inverse of interop/torch_import.py.

Closes the migration round-trip: a user can train on TPU here and drop the
weights back into the reference's own torch tooling
(`foubari/ratio_guided_Multimodal_FM`), e.g. to compare against existing
torch pipelines or serve from torch infra. Every layout rule is the exact
inverse of the importer's (see torch_import.py's docstring for the
forward direction):

  Conv2d           kernel (kh,kw,I,O) -> weight (O,I,kh,kw)
  ConvTranspose2d  kernel (kh,kw,I,O) -> (I,O,kh,kw), then spatial flip
  Linear           kernel (I,O) -> weight (O,I); flattened-conv-map inputs
                   permute the input axis back to torch's C-major flatten
                   order (`conv_shape`), decoder fc1 permutes the OUTPUT
                   axis back (`out_shape`)
  GroupNorm/LayerNorm  scale/bias -> weight/bias
  BatchNorm2d      scale/bias + batch_stats mean/var -> weight/bias/
                   running_mean/running_var; `num_batches_tracked` is
                   synthesized as 0 (torch's strict load requires the key;
                   inference never reads it)

Exactness: export(import(sd)) == sd bit-for-bit for every family, and the
reference's own torch models produce outputs identical to ours from the
exported weights — both asserted by tests/test_torch_export.py driving
/root/reference as a black box.

Reference model surfaces covered (same families as the importer):
  unet.py:122-276 / unet_flexible.py:111-291   -> export_unet
  flow_matching.py:127-173 FlowMatchingModel   -> export_flow_matching_model
  ratio_estimator.py:96-191 / ratio_flexible.py:69-156 -> export_ratio_gn
  ratio_flexible.py:305-385 RatioEstimatorMNISTSVHN -> export_ratio_mnist_svhn
  classifier.py:9-52 / svhn_classifier.py:11-116    -> export_*_classifier
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
Variables = Mapping[str, Any]
StateDict = Dict[str, Array]


def _np(x) -> Array:
    """jax.Array | np.ndarray -> float32-preserving host numpy."""
    return np.asarray(x)


def _conv(out: StateDict, name: str, p: Mapping[str, Any]) -> None:
    k = _np(p["kernel"])                      # (kh, kw, I, O)
    out[f"{name}.weight"] = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
    out[f"{name}.bias"] = _np(p["bias"])


def _deconv(out: StateDict, name: str, p: Mapping[str, Any]) -> None:
    k = _np(p["kernel"])                      # (kh, kw, I, O)
    k = k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]   # (I,O,kh,kw) + unflip
    out[f"{name}.weight"] = np.ascontiguousarray(k)
    out[f"{name}.bias"] = _np(p["bias"])


def _dense(out: StateDict, name: str, p: Mapping[str, Any],
           conv_shape: Tuple[int, int, int] | None = None) -> None:
    w = _np(p["kernel"]).T                    # (O, I) with I in HWC order
    if conv_shape is not None:                # restore torch's C-major order
        c, h, ww = conv_shape
        w = (w.reshape(-1, h, ww, c)          # rows were flattened HWC
             .transpose(0, 3, 1, 2)           # -> C,H,W order
             .reshape(w.shape[0], -1))
    out[f"{name}.weight"] = np.ascontiguousarray(w)
    out[f"{name}.bias"] = _np(p["bias"])


def _dense_spatial_out(out: StateDict, name: str, p: Mapping[str, Any],
                       out_shape: Tuple[int, int, int]) -> None:
    """Linear whose OUTPUT is reshaped to a conv map: our rows are in
    (H,W,C) order, torch's in (C,H,W) — permute the output axis back."""
    c, h, ww = out_shape
    w = _np(p["kernel"]).T                    # (H*W*C, I)
    w = (w.reshape(h, ww, c, -1).transpose(2, 0, 1, 3)
         .reshape(c * h * ww, -1))
    b = (_np(p["bias"]).reshape(h, ww, c).transpose(2, 0, 1).reshape(-1))
    out[f"{name}.weight"] = np.ascontiguousarray(w)
    out[f"{name}.bias"] = np.ascontiguousarray(b)


def _norm(out: StateDict, name: str, p: Mapping[str, Any]) -> None:
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])


def _bn(out: StateDict, name: str, p: Mapping[str, Any],
        stats: Mapping[str, Any]) -> None:
    _norm(out, name, p)
    out[f"{name}.running_mean"] = _np(stats["mean"])
    out[f"{name}.running_var"] = _np(stats["var"])
    # torch's strict load_state_dict requires the key; inference ignores it
    out[f"{name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _resblock(out: StateDict, prefix: str, p: Mapping[str, Any]) -> None:
    _norm(out, f"{prefix}.norm1", p["GroupNorm_0"])
    _conv(out, f"{prefix}.conv1", p["conv1"])
    _dense(out, f"{prefix}.time_mlp.1", p["time_mlp"])
    _norm(out, f"{prefix}.norm2", p["GroupNorm_1"])
    _conv(out, f"{prefix}.conv2", p["conv2"])
    if "skip" in p:                           # else torch uses nn.Identity
        _conv(out, f"{prefix}.skip", p["skip"])


def export_unet(variables: Variables, *, channel_mult=(1, 2),
                num_res_blocks: int = 2) -> StateDict:
    """models/unet.py:FlexibleUNet -> UNetMNIST / FlexibleUNet family.

    channel_mult/num_res_blocks must match the tree's architecture:
    (1,2)x2 for the MNIST nets, (1,2,2)x2 for SVHN."""
    p = variables["params"]
    out: StateDict = {}
    _dense(out, "time_embed.0", p["time_dense1"])
    _dense(out, "time_embed.2", p["time_dense2"])
    _conv(out, "input_conv", p["input_conv"])
    n_levels = len(channel_mult)
    for i in range(n_levels * num_res_blocks):
        _resblock(out, f"encoder_blocks.{i}", p[f"enc_{i}"])
    for lvl in range(n_levels - 1):
        _conv(out, f"downsamplers.{lvl}.conv", p[f"down_{lvl}"]["conv"])
        _conv(out, f"upsamplers.{lvl}.conv", p[f"up_{lvl}"]["conv"])
    _resblock(out, "middle_block1", p["middle_1"])
    _resblock(out, "middle_block2", p["middle_2"])
    for i in range(n_levels * (num_res_blocks + 1)):
        _resblock(out, f"decoder_blocks.{i}", p[f"dec_{i}"])
    _norm(out, "out_norm", p["GroupNorm_0"])
    _conv(out, "out_conv", p["out_conv"])
    return out


def export_flow_matching_model(variables: Variables) -> StateDict:
    """models/flow_matching.py:FlowMatchingModel -> reference
    FlowMatchingModel (flow_matching.py:127-173)."""
    p = variables["params"]
    out: StateDict = {}
    enc = p["encoder"]
    for i in range(1, 5):
        _conv(out, f"encoder.conv{i}", enc[f"conv{i}"])
        _norm(out, f"encoder.gn{i}", enc[f"gn{i}"])
    _dense(out, "encoder.fc", enc["fc"], conv_shape=(256, 7, 7))
    dec = p["decoder"]
    _dense_spatial_out(out, "decoder.fc1", dec["fc1"], (256, 7, 7))
    _deconv(out, "decoder.deconv1", dec["deconv1"])
    _deconv(out, "decoder.deconv2", dec["deconv2"])
    _conv(out, "decoder.conv3", dec["conv3"])
    _conv(out, "decoder.conv_out", dec["conv_out"])
    for i in range(1, 4):
        _norm(out, f"decoder.gn{i}", dec[f"gn{i}"])
    return out


def _gn_encoder(out: StateDict, prefix: str, p: Mapping[str, Any]) -> None:
    for i in range(1, 5):
        _conv(out, f"{prefix}.conv{i}", p[f"conv{i}"])
        _norm(out, f"{prefix}.gn{i}", p[f"gn{i}"])
    _dense(out, f"{prefix}.fc", p["fc"])      # avg-pooled input, no permute


def export_ratio_gn(variables: Variables) -> StateDict:
    """models/ratio.py:FlexibleRatioEstimator -> RatioEstimator /
    FlexibleRatioEstimator (score_net Sequential indices 0/1/4/5/8)."""
    p = variables["params"]
    out: StateDict = {}
    _gn_encoder(out, "encoder_x", p["encoder_x"])
    _gn_encoder(out, "encoder_y", p["encoder_y"])
    s = p["score_net"]
    _dense(out, "score_net.0", s["fc1"])
    _norm(out, "score_net.1", s["ln1"])
    _dense(out, "score_net.4", s["fc2"])
    _norm(out, "score_net.5", s["ln2"])
    _dense(out, "score_net.8", s["fc3"])
    return out


def _bn_encoder(out: StateDict, prefix: str, p: Mapping[str, Any],
                stats: Mapping[str, Any], convs) -> None:
    for c in convs:
        _conv(out, f"{prefix}.conv{c}", p[f"conv{c}"])
        _bn(out, f"{prefix}.bn{c}", p[f"bn{c}"], stats[f"bn{c}"])
    _dense(out, f"{prefix}.fc", p["fc"])


def export_ratio_mnist_svhn(variables: Variables) -> StateDict:
    """models/ratio.py:RatioEstimatorMNISTSVHN (params + batch_stats) ->
    RatioEstimatorMNISTSVHN (ratio_flexible.py:305-385); deep score_net
    Sequential indices 0/1/4/5/8/9/11."""
    p, st = variables["params"], variables["batch_stats"]
    out: StateDict = {}
    _bn_encoder(out, "encoder_mnist", p["encoder_mnist"],
                st["encoder_mnist"], ["1", "2", "3", "4"])
    _bn_encoder(out, "encoder_svhn", p["encoder_svhn"], st["encoder_svhn"],
                ["1a", "1b", "2a", "2b", "3a", "3b", "4a", "4b"])
    s = p["score_net"]
    _dense(out, "score_net.0", s["fc1"])
    _norm(out, "score_net.1", s["ln1"])
    _dense(out, "score_net.4", s["fc2"])
    _norm(out, "score_net.5", s["ln2"])
    _dense(out, "score_net.8", s["fc3"])
    _norm(out, "score_net.9", s["ln3"])
    _dense(out, "score_net.11", s["fc4"])
    return out


def export_mnist_classifier(variables: Variables) -> StateDict:
    p = variables["params"]
    out: StateDict = {}
    _conv(out, "conv1", p["conv1"])
    _conv(out, "conv2", p["conv2"])
    _dense(out, "fc1", p["fc1"], conv_shape=(64, 7, 7))
    _dense(out, "fc2", p["fc2"])
    return out


def export_mnist_classifier32(variables: Variables) -> StateDict:
    p = variables["params"]
    out: StateDict = {}
    for i in range(1, 4):
        _conv(out, f"conv{i}", p[f"conv{i}"])
    _dense(out, "fc1", p["fc1"], conv_shape=(64, 8, 8))
    _dense(out, "fc2", p["fc2"])
    return out


def export_svhn_classifier(variables: Variables) -> StateDict:
    p, st = variables["params"], variables["batch_stats"]
    out: StateDict = {}
    for i in range(1, 5):
        _conv(out, f"conv{i}", p[f"conv{i}"])
        _bn(out, f"bn{i}", p[f"bn{i}"], st[f"bn{i}"])
    _dense(out, "fc1", p["fc1"], conv_shape=(128, 8, 8))
    _dense(out, "fc2", p["fc2"])
    return out


TORCH_EXPORTERS = {
    "unet_mnist": lambda v: export_unet(v, channel_mult=(1, 2)),
    "unet_svhn": lambda v: export_unet(v, channel_mult=(1, 2, 2)),
    "fm_original": export_flow_matching_model,
    "ratio": export_ratio_gn,
    "ratio_mnist_svhn": export_ratio_mnist_svhn,
    "classifier_mnist": export_mnist_classifier,
    "classifier_mnist32": export_mnist_classifier32,
    "classifier_svhn": export_svhn_classifier,
}


def export_state_dict(variables: Variables, model: str) -> StateDict:
    """Convert Flax variables into a reference torch state_dict (as host
    numpy arrays — callers torch.save after wrapping in torch tensors).

    `variables` is {'params': ...} or {'params': ..., 'batch_stats': ...}
    (BatchNorm families require batch_stats); a bare params tree is also
    accepted and wrapped.
    """
    if model not in TORCH_EXPORTERS:
        raise ValueError(
            f"unknown model kind {model!r}; one of {sorted(TORCH_EXPORTERS)}")
    if "params" not in variables:             # bare params tree
        variables = {"params": variables}
    if model in ("ratio_mnist_svhn", "classifier_svhn") \
            and "batch_stats" not in variables:
        raise ValueError(
            f"{model} uses BatchNorm: pass variables with 'batch_stats' "
            "(running mean/var) alongside 'params'")
    return TORCH_EXPORTERS[model](variables)
