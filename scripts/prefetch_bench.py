"""Input-pipeline overlap measurement (VERDICT r2 #6).

Times the FM-SVHN training loop end-to-end THROUGH a real host loader —
not the synthetic-device-array rate bench.py reports — with and without
the background device-prefetch wrapper (data/prefetch.py), quantifying the
input-bound fraction of training throughput.

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/prefetch_bench.py
Output: docs/results_r3/prefetch_bench.json (also merged by hand into
bench_details.json narrative).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
    get_svhn_flow_dataloader,
)
from ratio_guided_multimodal_fm_tpu.data.prefetch import PrefetchLoader
from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetSVHN
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    make_fm_train_step,
)


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def run_epoch(loader, state, step, key, max_steps=150):
    n = 0
    t0 = time.perf_counter()
    last = None
    for batch in loader:
        key, sk = jax.random.split(key)
        state, last = step(state, jnp.asarray(batch["x"]), sk)
        n += 1
        if n >= max_steps:
            break
    _sync(last)
    return state, n / (time.perf_counter() - t0)


def main():
    import os

    import ratio_guided_multimodal_fm_tpu.data.mnist_svhn as ms

    model = FlowMatchingUNetSVHN(dtype=jnp.bfloat16)
    state = create_fm_state(model, jax.random.PRNGKey(0), (32, 32, 3),
                            lr=1e-4)
    step = make_fm_train_step(model)
    key = jax.random.PRNGKey(1)

    out = {"workload": "FM-SVHN train, B=128, real loader, 150 steps"}

    def fresh_loader(device_data: str):
        os.environ["RGMF_DEVICE_DATA"] = device_data
        ms._CACHE.clear()
        return get_svhn_flow_dataloader(128, True, "./data")

    # warmup (compile + synthetic data gen)
    state, _ = run_epoch(fresh_loader("0"), state, step, key, max_steps=10)

    for tag, dd, wrap in [("host_plain", "0", False),
                          ("host_prefetch", "0", True),
                          ("device_cached", "1", False),
                          ("device_cached_prefetch", "1", True)]:
        loader = fresh_loader(dd)
        if wrap:
            loader = PrefetchLoader(loader, depth=2)
        rates = []
        for _ in range(2):
            state, r = run_epoch(loader, state, step, key)
            rates.append(r)
        out[f"steps_per_sec_{tag}"] = round(max(rates), 1)
        print(tag, out[f"steps_per_sec_{tag}"], flush=True)
    base = out["steps_per_sec_host_plain"]
    best = max(v for k, v in out.items() if k.startswith("steps_per_sec"))
    out["best_over_host_plain"] = round(best / base, 2)
    out["input_bound_fraction_of_host_plain"] = round(1.0 - base / best, 3)

    os.makedirs("docs/results_r3", exist_ok=True)
    with open("docs/results_r3/prefetch_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
