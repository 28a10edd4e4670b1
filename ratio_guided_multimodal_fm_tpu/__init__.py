"""ratio_guided_multimodal_fm_tpu — TPU-native ratio-guided multimodal flow matching.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
foubari/ratio_guided_Multimodal_FM (reference mounted at /root/reference):

* independent rectified-flow (OT-CFM) models per modality,
* density-ratio estimators r̂(x,y) = q(x,y)/p_ind(x,y) trained real-vs-shuffled,
* Monte-Carlo importance-weighted guidance ("mc_feng", Feng et al. Alg. 2) and
  gradient log-ratio guidance coupling the two ODE flows at sampling time,
* classifier-coherence / FID evaluation sweeps.

TPU-first design notes (vs. the reference's single-GPU PyTorch):
* NHWC image layout everywhere (TPU conv-friendly).
* All hot paths are jitted `lax.scan` loops: the full 100-step guided ODE
  (reference: a Python loop around `fm(x,t)` calls, flow_utils.py:263-373)
  compiles to ONE XLA program.
* The guidance weight/velocity mix is rewritten algebraically into two
  MXU matmuls instead of materializing the [B, N_mc, C, H, W] conditional
  velocity tensor (reference flow_utils.py:333-341).
* Multi-chip scaling via `jax.sharding.Mesh` + NamedSharding: batch sharded
  over the 'data' axis, the MC-sample axis shardable over 'mc' with exact
  psum reductions.
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("RGMF_NO_COMPILE_CACHE"):
    # Persistent XLA compilation cache: in this environment compiles go
    # through a remote helper (~20s-10min for big programs); the cache cuts
    # repeat CLI invocations to ~1s (measured 21.9s -> 1.4s). Opt out with
    # RGMF_NO_COMPILE_CACHE=1.
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RGMF_COMPILE_CACHE_DIR",
        _os.path.expanduser("~/.cache/ratio_guided_multimodal_fm_tpu/jax_cache"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from ratio_guided_multimodal_fm_tpu.core.prng import set_seed  # noqa: F401
