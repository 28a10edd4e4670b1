"""Serving endpoint for guided pair generation (new capability — the
reference is research-script-only).

A minimal production-shaped server: loads the trained flows + ratio
estimator once, pre-compiles the guided sampler at a fixed batch size, and
serves generation over HTTP:

    POST /sample   {"num_samples": 32, "guidance_method": "mc_feng",
                    "guidance_strength": 0.5, "seed": 0, "format": "npz"|"png"}
    GET  /healthz  -> {"status": "ok", "compiled_batches": [...]}

Requests are padded up to the compiled batch size (static shapes — no
recompiles in steady state); the MC guidance set is generated once at
startup and reused (exact under fixed-seed semantics, see
sample/guided.py:generate_mc_set).

Usage:
    python -m ratio_guided_multimodal_fm_tpu.cli.serve --experiment mnist_svhn \
        --port 8800 --batch_size 64
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import add_common_flags, dtype_of
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
    generate_mc_set,
)


class SamplerService:
    """Owns compiled samplers + the warm MC set; thread-safe via GIL +
    JAX's internally-synchronized dispatch."""

    def __init__(self, fm_x_fn, fm_y_fn, log_ratio_fn, x_shape, y_shape,
                 batch_size=64, num_steps=100, mc_batch_size=256, seed=0):
        self.batch_size = batch_size
        self.x_shape = tuple(x_shape)
        self.y_shape = tuple(y_shape)
        self.num_steps = num_steps
        self._samplers = {}
        self._fm_x, self._fm_y, self._log_ratio = fm_x_fn, fm_y_fn, log_ratio_fn
        self._mc_set = None
        if log_ratio_fn is not None:
            self._mc_set = generate_mc_set(
                fm_x_fn, fm_y_fn, log_ratio_fn, jax.random.PRNGKey(seed),
                mc_batch_size, self.x_shape, self.y_shape, num_steps)
            # np.asarray readback = real barrier (block_until_ready
            # returns early on the axon TPU backend); keeps the MC set
            # materialized before the server accepts traffic.
            self._mc_set = tuple(jnp.asarray(np.asarray(a))
                                 for a in self._mc_set)
        self.mc_batch_size = mc_batch_size

    def _sampler(self, method, strength):
        key = (method, float(strength))
        if key not in self._samplers:
            cfg = GuidedSamplerConfig(
                guidance_method=method, guidance_strength=float(strength),
                num_steps=self.num_steps, mc_batch_size=self.mc_batch_size,
                x_shape=self.x_shape, y_shape=self.y_shape)
            self._samplers[key] = jax.jit(
                make_guided_sampler(self._fm_x, self._fm_y, cfg,
                                    self._log_ratio),
                static_argnums=(1,))
        return self._samplers[key]

    def warmup(self, methods=("none",)):
        for m in methods:
            s = self._sampler(m, 0.5 if m != "none" else 0.0)
            out = s(jax.random.PRNGKey(0), self.batch_size,
                    self._mc_set if m == "mc_feng" else None)
            np.asarray(out[0])  # real barrier (see __init__ note)

    def sample(self, n, method="none", strength=0.0, seed=0):
        """Fulfill the FULL request by looping the compiled fixed-batch
        sampler (a request used to be silently truncated to batch_size —
        round-1 review finding)."""
        sampler = self._sampler(method, strength)
        mc = self._mc_set if method == "mc_feng" else None
        xs, ys = [], []
        t0 = time.perf_counter()
        for i in range((n + self.batch_size - 1) // self.batch_size):
            x1, y1, _ = sampler(jax.random.PRNGKey(seed + i),
                                self.batch_size, mc)
            # host conversion inside the timed region — client-visible cost
            xs.append(np.asarray(jax.block_until_ready(x1)))
            ys.append(np.asarray(jax.block_until_ready(y1)))
        dt = time.perf_counter() - t0
        x1 = np.concatenate(xs)[:n]
        y1 = np.concatenate(ys)[:n]
        return x1, y1, dt

    @property
    def compiled(self):
        return sorted(str(k) for k in self._samplers)


def _encode_npz(x, y):
    buf = io.BytesIO()
    np.savez_compressed(buf, x=x, y=y)
    return base64.b64encode(buf.getvalue()).decode()


def _encode_png(x, y):
    from ratio_guided_multimodal_fm_tpu.eval.viz import _pair_grid
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "grid.png")
        _pair_grid(x, y, p, "served pairs", num_cols=8,
                   num_rows=max(1, len(x) // 8))
        return base64.b64encode(open(p, "rb").read()).decode()


def make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "compiled": service.compiled,
                                 "batch_size": service.batch_size})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/sample":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                num = int(req.get("num_samples", 16))
                method = req.get("guidance_method", "none")
                strength = float(req.get("guidance_strength", 0.0))
                seed = int(req.get("seed", 0))
                fmt = req.get("format", "npz")
                if method not in ("none", "mc_feng", "grad"):
                    self._send(400, {"error": f"unknown method {method}"})
                    return
                x, y, dt = service.sample(num, method, strength, seed)
                payload = (_encode_png(x, y) if fmt == "png"
                           else _encode_npz(x, y))
                self._send(200, {
                    "num_samples": len(x),
                    "sample_time_sec": round(dt, 4),
                    "samples_per_sec": round(len(x) / dt, 2),
                    "format": fmt,
                    "data_b64": payload,
                })
            except Exception as e:  # serving surface: report, don't die
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description="Serve guided pair sampling")
    parser.add_argument("--experiment", type=str, default="mnist_svhn",
                        choices=["mnist_svhn", "mnist_transform"])
    parser.add_argument("--transform_type", type=str, default="rotate90")
    parser.add_argument("--loss_type", type=str, default="disc")
    parser.add_argument("--port", type=int, default=8800)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_steps", type=int, default=100)
    parser.add_argument("--mc_batch_size", type=int, default=256)
    add_common_flags(parser)
    args = parser.parse_args(argv)

    if args.experiment == "mnist_svhn":
        from ratio_guided_multimodal_fm_tpu.cli.sample_mnist_svhn import (
            load_mnist_svhn_models,
        )
        from ratio_guided_multimodal_fm_tpu.cli.common import velocity_fn

        fm_m, pm, fm_s, ps, log_ratio = load_mnist_svhn_models(
            args.loss_type, True, dtype=dtype_of(args))
        service = SamplerService(
            velocity_fn(fm_m, pm), velocity_fn(fm_s, ps), log_ratio,
            (32, 32, 1), (32, 32, 3), args.batch_size, args.num_steps,
            args.mc_batch_size, args.seed)
    else:
        import jax.numpy as jnp
        from ratio_guided_multimodal_fm_tpu.cli.common import (
            fm_model, load_params_or_exit, ratio_log_fn, velocity_fn)
        from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST
        from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
            get_checkpoint_path)

        model = fm_model("unet", dtype=dtype_of(args))
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                          jnp.zeros((1,)))
        px = load_params_or_exit(get_checkpoint_path("flow", "x", None, "best"),
                                 init["params"], "FM_x", "train it first")
        py = load_params_or_exit(
            get_checkpoint_path("flow", "y", args.transform_type, "best"),
            init["params"], "FM_y", "train it first")
        ratio = RatioEstimatorMNIST(loss_type=args.loss_type)
        r_init = ratio.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                            jnp.zeros((1, 28, 28, 1)))
        pr = load_params_or_exit(
            get_checkpoint_path("ratio", args.loss_type, args.transform_type,
                                "best"),
            r_init["params"], "ratio", "train it first")
        service = SamplerService(
            velocity_fn(model, px), velocity_fn(model, py),
            ratio_log_fn(ratio, {"params": pr}),
            (28, 28, 1), (28, 28, 1), args.batch_size, args.num_steps,
            args.mc_batch_size, args.seed)

    print("Warming up (compiling samplers)...")
    service.warmup(("none", "mc_feng"))
    print(f"Serving on http://127.0.0.1:{args.port}  "
          f"(batch={args.batch_size}, steps={args.num_steps})")
    ThreadingHTTPServer(("127.0.0.1", args.port),
                        make_handler(service)).serve_forever()


if __name__ == "__main__":
    main()
