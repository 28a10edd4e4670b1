"""Op-by-op roofline for the guided sampler's main ODE (VERDICT r2 #1).

Walks the two parity U-Nets' exact per-step op lists (FlexibleUNet,
models/unet.py) and accounts HBM bytes + MXU FLOPs per op under three
execution models:

  A. measured     — today's XLA execution (xplane totals,
                    profile_B512.json)
  B. xla_floor    — best possible without cross-op fusion beyond XLA's
                    model: each GN = 2 activation passes (stats read,
                    normalize read+write fused with SiLU), each conv =
                    read in + write out + MXU time, no concat copies,
                    everything at 100% of HBM peak / bf16 MXU peak
  C. fused_floor  — hypothetical per-ResBlock mega-kernels: each
                    activation read once + written once per ResBlock
                    (stats, normalize, SiLU, bias all on-chip), conv
                    FLOPs at MXU peak — the architecture's hard ceiling
                    on this chip

MFU is reported against the convs' useful FLOPs only (the quantity
bench.py's cost-analysis MFU tracks).

Pure host computation — no TPU needed. Output:
docs/results_r3/mfu_roofline.json
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 512
BPE = 2                   # bf16 bytes/elem
HBM = 819e9               # v5e bytes/s
MXU = 197e12              # v5e bf16 FLOP/s
STEPS = 100


def unet_ops(mc, mult, in_ch, hw):
    """Yield (kind, bytes_in, bytes_out, flops) per op for one forward."""
    ops = []

    def act(h, c):
        return B * h * h * c * BPE

    def conv(h_in, cin, cout, stride=1, k=3):
        h_out = h_in // stride
        fl = 2 * B * h_out * h_out * k * k * cin * cout
        ops.append(("conv", act(h_in, cin), act(h_out, cout), fl))

    def gn(h, c):
        ops.append(("gn", act(h, c), act(h, c), 0))

    def resblock(h, cin, cout, skip=0):
        gn(h, cin + skip)
        conv(h, cin + skip, cout)
        gn(h, cout)
        conv(h, cout, cout)
        if cin + skip != cout:
            conv(h, cin + skip, cout, k=1)

    # encoder
    conv(hw, in_ch, mc)                       # input conv
    chans = [mc]
    h = hw
    c = mc
    for lvl, m in enumerate(mult):
        out = mc * m
        for _ in range(2):
            resblock(h, c, out)
            c = out
            chans.append(c)
        if lvl < len(mult) - 1:
            conv(h, c, c, stride=2)           # downsample
            h //= 2
            chans.append(c)
    # middle
    resblock(h, c, c)
    resblock(h, c, c)
    # decoder
    for lvl in reversed(range(len(mult))):
        out = mc * mult[lvl]
        for _ in range(3):
            skip = chans.pop()
            resblock(h, c, out, skip=skip)
            c = out
        if lvl > 0:
            h *= 2
            conv(h, c, c)                     # upsample conv
    gn(hw, c)
    conv(hw, c, in_ch)                        # out conv
    return ops


def analyze():
    nets = {
        "mnist": unet_ops(32, (1, 2), 1, 32),
        "svhn": unet_ops(64, (1, 2, 2), 3, 32),
    }
    total = {"conv_flops": 0, "B_time": 0.0, "C_time": 0.0,
             "n_gn": 0, "n_conv": 0}
    per_net = {}
    for name, ops in nets.items():
        conv_fl = sum(o[3] for o in ops if o[0] == "conv")
        n_gn = sum(1 for o in ops if o[0] == "gn")
        n_conv = sum(1 for o in ops if o[0] == "conv")
        # model B: per-op times
        t_b = 0.0
        for kind, bi, bo, fl in ops:
            if kind == "gn":
                t_b += (2 * bi + bo) / HBM          # stats read + rw pass
            else:
                t_b += max((bi + bo) / HBM, fl / MXU)
        # model C: per-ResBlock fusion ≈ each GN collapses into its
        # following conv's read: activation bytes counted once per
        # conv read + once per conv write; GN contributes nothing extra
        t_c = 0.0
        for kind, bi, bo, fl in ops:
            if kind == "conv":
                t_c += max((bi + bo) / HBM, fl / MXU)
        per_net[name] = {
            "ops": len(ops), "gn": n_gn, "conv": n_conv,
            "conv_gflops_per_step": round(conv_fl / 1e9, 2),
            "xla_floor_ms_per_step": round(t_b * 1e3, 3),
            "fused_floor_ms_per_step": round(t_c * 1e3, 3),
        }
        total["conv_flops"] += conv_fl
        total["B_time"] += t_b
        total["C_time"] += t_c
        total["n_gn"] += n_gn
        total["n_conv"] += n_conv

    measured_main_ode = 1.5946        # opt_experiment concat baseline era
    measured_split = None
    try:
        d = json.load(open("docs/results_r3/opt_experiment.json"))
        measured_split = d["full_sampler_split_unroll4_sec"]
    except Exception:
        pass

    def mfu(t_per_step):
        return 100 * total["conv_flops"] / (t_per_step * MXU)

    out = {
        "workload": f"main ODE step, both U-Nets, B={B}, bf16",
        "per_net": per_net,
        "totals": {
            "gn_ops_per_step": total["n_gn"],
            "conv_ops_per_step": total["n_conv"],
            "useful_conv_gflops_per_step": round(
                total["conv_flops"] / 1e9, 2),
        },
        "tiers": {
            "A_measured": {
                "ms_per_step": round(1e3 * measured_main_ode / STEPS, 3),
                "mfu_pct": round(mfu(measured_main_ode / STEPS), 2),
                "source": "profile_B512.json main_ode_mc_feng_sec/100",
            },
            "B_xla_floor": {
                "ms_per_step": round(total["B_time"] * 1e3, 3),
                "mfu_pct": round(mfu(total["B_time"]), 2),
                "assumes": "every pass at 100% HBM peak, GN=3 passes, "
                           "no copies, no guidance math",
            },
            "C_fused_floor": {
                "ms_per_step": round(total["C_time"] * 1e3, 3),
                "mfu_pct": round(mfu(total["C_time"]), 2),
                "assumes": "per-ResBlock mega-kernels: GN/SiLU/bias free, "
                           "each conv reads+writes once at HBM peak or "
                           "runs at MXU peak",
            },
        },
        "conclusion": (
            "HEADLINE CORRECTION: the sampler's true MFU is ~57% "
            "(measured step time vs analytic conv FLOPs), not the 2.06% "
            "round 2 published — compiled.cost_analysis()['flops'] drops "
            "the lax.scan trip count (~25x under-count; confirmed by the "
            "device trace, whose convert_reduce_fusion events each emit "
            "a conv output alongside its GN channel statistics, i.e. the "
            "convs ARE the 858ms). Measured A (57%) already beats the "
            "naive per-op XLA floor B (46%) because XLA fuses GN stats "
            "INTO the producing convolutions; the fully-fused ceiling C "
            "is ~81%. Remaining realistic headroom on this architecture "
            "is therefore ~1.4x, part of which the round-3 concat-free "
            "decoder captured (+10%)."),
    }
    if measured_split:
        out["tiers"]["A_measured"]["full_sampler_split_sec"] = measured_split
    os.makedirs("docs/results_r3", exist_ok=True)
    with open("docs/results_r3/mfu_roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    analyze()
