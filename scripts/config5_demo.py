"""BASELINE config #5: CIFAR-class ↔ CelebA-class 64×64 cross-modal pairs.

The real thing round 2 lacked: procedural *natural-image-class* data
(textured multi-object scenes ↔ face schematics, data/natural.py) instead
of stretched digits, trained end-to-end at 64px:

  * FlowMatchingUNet64 (in=3, ch=96) per modality
  * FlexibleRatioEstimator 3ch×3ch cross-modal discriminator
  * Classifier64 per modality for honest classifier-coherence readout
  * mc_feng guided sampling sweep with the chunked fresh-MC-set protocol

Run (TPU, ~1-2h at defaults):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/config5_demo.py \
      [--epochs 40] [--n 8000] [--ratio_epochs 80]
Outputs: outputs/config5/{samples_*.png, results.json, ckpt/}
  + copy results to docs/results_r3/config5_results.json when done.

Ref lineage: the sweep protocol mirrors evaluate_mnist_svhn.py:130-183;
training loops mirror train_flow_svhn.py / train_ratio_mnist_svhn.py.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.natural import load_natural
from ratio_guided_multimodal_fm_tpu.data.pipeline import Pairing, to_unit_range
from ratio_guided_multimodal_fm_tpu.eval.coherence import label_entropy
from ratio_guided_multimodal_fm_tpu.eval.viz import visualize_pairs_mnist_svhn
from ratio_guided_multimodal_fm_tpu.models import (
    Classifier64,
    FlexibleRatioEstimator,
)
from ratio_guided_multimodal_fm_tpu.models.unet import FlowMatchingUNet64
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    load_params,
    save_checkpoint,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    create_ratio_state,
    make_fm_train_step,
    make_ratio_train_step,
)


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def train_classifier(imgs_dev, lbls, seed, epochs=6, bs=128):
    """Small 64px eval classifier; returns (apply_fn, test_acc).

    `imgs_dev` is a DEVICE-resident array (uploaded once by main) —
    per-step batches are gathered on-device from int32 index arrays, so
    the axon tunnel never re-streams image bytes (measured: per-batch
    jnp.asarray of 6.3MB costs seconds through the tunnel). The dataset
    enters the jitted step as an ARGUMENT: closing over it embeds the
    full n*64*64*3 f32 array as a serialized constant, which the remote
    compile helper rejects with HTTP 413 at full scale (CLAUDE.md)."""
    import optax
    from flax.training import train_state

    clf = Classifier64()
    n = len(imgs_dev)
    n_tr = int(n * 0.9)
    k = jax.random.PRNGKey(seed)
    variables = clf.init(k, jnp.zeros((1, 64, 64, 3)))
    state = train_state.TrainState.create(
        apply_fn=clf.apply, params=variables["params"],
        tx=optax.adam(1e-3))
    lbls_dev = jax.device_put(jnp.asarray(lbls))

    @jax.jit
    def step(st, imgs, all_lbls, idx, key):
        x = jnp.take(imgs, idx, axis=0)
        y = jnp.take(all_lbls, idx, axis=0)
        def loss_fn(p):
            logits = clf.apply({"params": p}, x, deterministic=False,
                               rngs={"dropout": key})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return st.apply_gradients(grads=grads), loss

    host = np.random.RandomState(seed)
    for ep in range(epochs):
        order = host.permutation(n_tr)
        for b in range(n_tr // bs):
            idx = jnp.asarray(order[b * bs:(b + 1) * bs], jnp.int32)
            state, _ = step(state, imgs_dev, lbls_dev, idx,
                            jax.random.fold_in(k, ep * 1000 + b))

    apply = jax.jit(lambda x: clf.apply({"params": state.params}, x))
    preds = []
    for b in range(0, n - n_tr, 256):
        sl = jax.lax.dynamic_slice_in_dim(imgs_dev, n_tr + b,
                                          min(256, n - n_tr - b), axis=0)
        preds.append(np.asarray(jnp.argmax(apply(sl), axis=-1)))
    acc = float((np.concatenate(preds) == lbls[n_tr:]).mean())
    return apply, acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--n", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--mc_batch_size", type=int, default=128)
    p.add_argument("--eval_chunks", type=int, default=4)
    p.add_argument("--merged_unet", action="store_true",
                   help="merged-pair U-Net evaluation (31%% slower on "
                        "v5e — see merged_experiment.json)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=2e-4)
    # 64px discriminators sit on the chance plateau (ROUND2.md §6):
    # long budget + conservative lr
    p.add_argument("--ratio_epochs", type=int, default=80)
    p.add_argument("--ratio_lr", type=float, default=1e-4)
    p.add_argument("--ratio_seed", type=int, default=3)
    p.add_argument("--gammas", nargs="+", type=float,
                   default=[0.0, 0.5, 1.0, 2.0])
    p.add_argument("--ckpt_dir", type=str, default="outputs/config5/ckpt")
    p.add_argument("--model_channels", type=int, default=96,
                   help="UNet width (96 = FlowMatchingUNet64; small "
                        "values for CPU smoke runs)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke runs; "
                        "the axon site hook pre-imports jax, so env vars "
                        "are too late — jax.config still works because "
                        "backends initialize lazily)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    set_seed(args.seed)
    print("Loading natural-image-class data (objects/faces)...", flush=True)
    # Real CIFAR-10 / CelebA files under ./data win when present
    # (data/natural.py:load_natural layouts); procedural otherwise.
    x_u8, x_lbl, x_src = load_natural("objects", args.n, seed=20)
    y_u8, y_lbl, y_src = load_natural("faces", args.n, seed=21)
    print(f"  objects source: {x_src}, faces source: {y_src}", flush=True)
    x_imgs, y_imgs = to_unit_range(x_u8), to_unit_range(y_u8)
    pairing = Pairing(y_lbl)
    # one-time upload: all per-step batches are device-side gathers
    x_dev = jax.device_put(jnp.asarray(x_imgs))
    y_dev = jax.device_put(jnp.asarray(y_imgs))

    print("Training eval classifiers...", flush=True)
    clf_x, acc_x = train_classifier(x_dev, x_lbl, 101)
    clf_y, acc_y = train_classifier(y_dev, y_lbl, 102)
    print(f"classifier acc: objects={acc_x:.3f} faces={acc_y:.3f}",
          flush=True)

    dtype = jnp.bfloat16
    if args.model_channels == 96:
        fm_x = FlowMatchingUNet64(in_channels=3, dtype=dtype)
        fm_y = FlowMatchingUNet64(in_channels=3, dtype=dtype)
    else:     # smoke-scale variant, same pyramid
        from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet
        kw = dict(in_channels=3, img_size=64,
                  model_channels=args.model_channels,
                  channel_mult=(1, 2, 2, 4), num_res_blocks=2,
                  dropout=0.1, dtype=dtype)
        fm_x = FlexibleUNet(**kw)
        fm_y = FlexibleUNet(**kw)
    sx = create_fm_state(fm_x, jax.random.PRNGKey(1), (64, 64, 3), lr=args.lr)
    sy = create_fm_state(fm_y, jax.random.PRNGKey(2), (64, 64, 3), lr=args.lr)
    n_params = sum(int(np.prod(a.shape))
                   for a in jax.tree_util.tree_leaves(sx.params))
    print(f"FM-64 params per modality: {n_params:,}", flush=True)

    step_x = make_fm_train_step(fm_x)
    step_y = make_fm_train_step(fm_y)
    rng = RNG(args.seed + 1)
    nb = args.n // args.batch_size
    host = np.random.RandomState(0)
    loss_curve = {"flow_x": [], "flow_y": [], "ratio": []}
    t0 = time.time()
    ck_x, ck_y = (os.path.join(args.ckpt_dir, nm) for nm in ("fm_x", "fm_y"))
    if os.path.isdir(ck_x) and os.path.isdir(ck_y):
        sx = sx.replace(params=load_params(ck_x, sx.params))
        sy = sy.replace(params=load_params(ck_y, sy.params))
        print("Loaded flow checkpoints; skipping flow training", flush=True)
    else:
        for epoch in range(args.epochs):
            order = host.permutation(args.n)[: nb * args.batch_size]
            ax = ay = 0.0
            for b in range(nb):
                idx = jnp.asarray(
                    order[b * args.batch_size:(b + 1) * args.batch_size],
                    jnp.int32)
                sx, lx = step_x(sx, jnp.take(x_dev, idx, axis=0), rng.next())
                sy, ly = step_y(sy, jnp.take(y_dev, idx, axis=0), rng.next())
                ax += float(lx)
                ay += float(ly)
            loss_curve["flow_x"].append(round(ax / nb, 4))
            loss_curve["flow_y"].append(round(ay / nb, 4))
            print(f"epoch {epoch+1}/{args.epochs} loss_x={ax/nb:.3f} "
                  f"loss_y={ay/nb:.3f} ({time.time()-t0:.0f}s)", flush=True)
        save_checkpoint(ck_x, sx.params)
        save_checkpoint(ck_y, sy.params)

    ratio = FlexibleRatioEstimator(x_channels=3, y_channels=3, dtype=dtype)
    ck_r = os.path.join(args.ckpt_dir, "ratio")
    rs = create_ratio_state(ratio, jax.random.PRNGKey(args.ratio_seed),
                            (64, 64, 3), (64, 64, 3), lr=args.ratio_lr)
    rstep = make_ratio_train_step(ratio, "disc")
    if os.path.isdir(ck_r):
        rs = rs.replace(params=load_params(ck_r, rs.params))
        print("Loaded ratio checkpoint; skipping ratio training", flush=True)
    else:
        for epoch in range(args.ratio_epochs):
            order = host.permutation(args.n)[: nb * args.batch_size]
            for b in range(nb):
                idx = order[b * args.batch_size:(b + 1) * args.batch_size]
                lbl = x_lbl[idx]
                is_real = host.rand(len(idx)) < 0.5
                y_same = pairing.same_label(lbl, host)
                y_diff, _ = pairing.different_label(lbl, host)
                y_idx = np.where(is_real, y_same, y_diff)
                rs, metrics = rstep(
                    rs, jnp.take(x_dev, jnp.asarray(idx, jnp.int32), axis=0),
                    jnp.take(y_dev, jnp.asarray(y_idx, jnp.int32), axis=0),
                    jnp.asarray(is_real.astype(np.float32)), rng.next())
            row = {k: round(float(v), 4) for k, v in metrics.items()}
            loss_curve["ratio"].append(row)
            print(f"ratio epoch {epoch+1}/{args.ratio_epochs}: "
                  + " ".join(f"{k}={v:.3f}" for k, v in row.items()),
                  flush=True)
        save_checkpoint(ck_r, rs.params)

    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        GuidedSamplerConfig,
        generate_mc_set,
        make_guided_sampler_p,
    )

    os.makedirs("outputs/config5", exist_ok=True)
    results = {"n_train": args.n, "fm_params_per_modality": n_params,
               "data_sources": {"objects": x_src, "faces": y_src},
               "classifier_acc": {"objects": acc_x, "faces": acc_y},
               "loss_curve": loss_curve, "eval": []}

    # Merged-pair evaluation (models/merged.py) is available for this
    # same-topology pair via --merged_unet, but defaults OFF: it measured
    # 31% slower on v5e (docs/results_r3/merged_experiment.json). Only the
    # SAMPLER uses it (params enter as jit arguments); the MC-set path
    # keeps separate evaluation — a closure over the two 37.4M-param trees
    # risks the remote compiler's serialized-constant limit (CLAUDE.md).
    pair_apply = None
    if getattr(args, "merged_unet", False):
        from ratio_guided_multimodal_fm_tpu.models.merged import (
            can_merge, merged_pair_apply)
        if can_merge(fm_x, fm_y):
            pair_apply = merged_pair_apply(fm_x)

    # fresh-MC-set-per-chunk eval (the framework default, eval/chunked.py).
    # Params enter the jitted MC-set builder as ARGUMENTS: generate_mc_set
    # traces its lax.scan, so closing over the two ~37M-param U-Net trees
    # would embed them as serialized constants and the remote compile
    # helper rejects that with HTTP 413 (CLAUDE.md remote-compile limits).
    mc_gen = jax.jit(lambda ps, key: generate_mc_set(
        lambda x, t: fm_x.apply({"params": ps[0]}, x, t),
        lambda y, t: fm_y.apply({"params": ps[1]}, y, t),
        lambda a, b: ratio.apply({"params": ps[2]}, a, b,
                                 method=ratio.log_ratio),
        key, args.mc_batch_size, (64, 64, 3), (64, 64, 3), args.num_steps))
    mc_sets = {}

    def mc_for(ci, key):
        if ci not in mc_sets:
            mc_sets[ci] = mc_gen((sx.params, sy.params, rs.params), key)
            _sync(mc_sets[ci][2])
        return mc_sets[ci]

    for gamma in args.gammas:
        method = "none" if gamma == 0.0 else "mc_feng"
        cfg = GuidedSamplerConfig(
            guidance_method=method, guidance_strength=gamma,
            num_steps=args.num_steps, mc_batch_size=args.mc_batch_size,
            x_shape=(64, 64, 3), y_shape=(64, 64, 3))
        sampler = jax.jit(make_guided_sampler_p(
            lambda p, x, t: fm_x.apply({"params": p}, x, t),
            lambda p, y, t: fm_y.apply({"params": p}, y, t),
            cfg, None if method == "none" else
            (lambda v, a, b: ratio.apply({"params": v}, a, b,
                                         method=ratio.log_ratio)),
            fm_pair_apply=pair_apply),
            static_argnums=(2,))
        params = (sx.params, sy.params, rs.params)

        n_chunks = args.eval_chunks if method == "mc_feng" else 1
        base, extra = divmod(args.num_samples, n_chunks)
        xs_all, ys_all = [], []
        t0 = time.time()
        key = jax.random.PRNGKey(9)
        for ci in range(n_chunks):
            ck = jax.random.fold_in(key, ci) if n_chunks > 1 else key
            mc = (mc_for(ci, jax.random.fold_in(ck, 7))
                  if method == "mc_feng" else None)
            n_i = base + (1 if ci < extra else 0)
            xs, ys, _ = sampler(params, ck, n_i, mc)
            xs_all.append(np.asarray(xs))   # host readback = barrier
            ys_all.append(np.asarray(ys))
        dt = time.time() - t0
        xs = np.concatenate(xs_all)
        ys = np.concatenate(ys_all)

        px = np.asarray(jnp.argmax(clf_x(jnp.asarray(xs)), axis=-1))
        py = np.asarray(jnp.argmax(clf_y(jnp.asarray(ys)), axis=-1))
        coh = float((px == py).mean())
        row = {
            "method": method, "gamma": gamma, "coherence": round(coh, 4),
            "label_entropy_objects": round(label_entropy(px), 3),
            "label_entropy_faces": round(label_entropy(py), 3),
            "wall_sec": round(dt, 1),
            "samples_per_sec": round(len(xs) / dt, 2),
            "finite": bool(np.isfinite(xs).all() and np.isfinite(ys).all()),
        }
        results["eval"].append(row)
        grid = f"outputs/config5/samples_{method}_gamma{gamma}.png"
        visualize_pairs_mnist_svhn(
            xs[:32], ys[:32], grid, num_cols=8, num_rows=4,
            title="Generated Pairs — object scenes (odd rows) / "
                  "faces (even rows)")
        print(f"{method} gamma={gamma}: coherence={coh:.3f} "
              f"H(obj)={row['label_entropy_objects']} "
              f"H(face)={row['label_entropy_faces']} ({dt:.0f}s) -> {grid}",
              flush=True)

    with open("outputs/config5/results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE -> outputs/config5/results.json", flush=True)


if __name__ == "__main__":
    main()
