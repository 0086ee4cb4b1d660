"""Per-config roofline accounting (round-4 verdict weak #6 / next #7).

Analytic bytes-moved and FLOP counts per frame for every BASELINE config
plus the sparse-LK and render channels, against the v5e HBM bandwidth
roofline (~819 GB/s). XLA's `cost_analysis()` cannot see inside the
manual-DMA Pallas kernels (they are opaque custom calls), so the model
here is built from the kernels' actual slab geometry (fi_geometry) and
the op structure — every term is a stated formula, auditable below.

NOTE on MFU: this workload is VPU/DMA-bound; FLOP-MFU against the chip's
188 TFLOP/s bf16 MXU peak is meaningless (~0.1%) — the HBM-bandwidth
roofline is the binding metric (BASELINE.md round-3 session-3).

Pure host math — safe to run alongside TPU work. Measured ms/frame
values are taken from the round-5 BASELINE.md table via --measured
'{"cfg4": 6.23, ...}' or the built-in defaults (updated as measured).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819e9           # v5e HBM bandwidth (public spec)
F32 = 4
BF16 = 2
U8 = 1


def dense_farneback_frame(h, w, levels=5, winsize=15, D=8, th=64,
                          iters=3, bf16=True, gray_in=False,
                          reinit_every=4):
    """Bytes + VPU-FLOPs per frame for the fused-Pallas dense pipeline.

    Models the production path: cvtColor -> fused level images ->
    per-level polyexp (bf16 slab layout) -> per-level flow iterations
    (fine level = per-iteration slab DMA; coarse levels = whole-level
    VMEM-resident kernel, one slab read total) -> flow upsample chain ->
    corner cadence + EKF. Polyexp pyramids are cached per frame (each
    frame expanded once)."""
    from kalman_hydra_tpu.kernels.flow_iter_pallas import fi_geometry
    from kalman_hydra_tpu.ops.pyramid import farneback_levels

    # coarse->fine order: [(k, lh, lw, sigma, ksize)], k = levels_eff..0
    plan = farneback_levels(h, w, levels, 0.5)
    plane_dt = BF16 if bf16 else F32
    stages = {}

    # grayscale: read u8 frame (3ch unless gray), write f32
    stages["gray"] = h * w * ((1 if gray_in else 3) * U8 + F32)

    # fused level-image kernel: read gray once; write every level image;
    # intermediate blur reads ~1 extra pass per level
    lv = sum(lh * lw for _, lh, lw, _, _ in plan)
    stages["level_images"] = h * w * F32 + 2 * lv * F32

    # polyexp: per level read the level image + write the PADDED 5-plane
    # slab stack (prep_planes layout — what flow_iter actually DMAs from)
    pe = 0
    slab = {}
    for _k, lh, lw, _s, _ks in plan:
        t, h_pad, rows, extra, wp, hb, bw = fi_geometry(
            lh, lw, winsize, D, th, plane_dt)
        hp_slab = h_pad - lh + extra + lh + 2 * hb
        slab[_k] = (t, h_pad, rows, wp)
        pe += lh * lw * F32 + 5 * hp_slab * wp * plane_dt
    stages["polyexp"] = pe

    # flow iterations. Fine level (k=0): per iteration, the kernel DMAs
    # n_tiles halo'd slabs of both plane stacks + the prior flow and
    # writes the new flow; XLA re-pads the flow between iterations.
    t, h_pad, rows, wp = slab[0]
    ntiles = h_pad // t
    per_iter = (ntiles * rows * wp * (2 * 5 * plane_dt + 2 * F32)
                + 2 * h_pad * w * F32           # flow out
                + 2 * 2 * h_pad * wp * F32)     # XLA flow pad r/w glue
    stages["flow_iter_fine"] = iters * per_iter

    # coarse levels (k > 0): whole-level kernel holds everything
    # VMEM-resident — one slab read + one flow read/write for ALL
    # iterations
    co = 0
    for _k, lh, lw, _s, _ks in plan:
        if _k == 0:
            continue
        t, h_pad, rows, wp = slab[_k]
        ntiles = h_pad // t
        co += (ntiles * rows * wp * (2 * 5 * plane_dt + 2 * F32)
               + 2 * h_pad * lw * F32)
        co += 2 * 2 * lh * lw * F32 * 2         # upsample chain r/w
    stages["flow_coarse+resize"] = co

    # corner cadence (Shi-Tomasi ~6 full passes, every reinit_every
    # frames) + EKF (negligible: K x 6x6 matrices)
    stages["corners/EKF"] = int(6 * h * w * F32 / reinit_every) + 1024 * 400

    total = sum(stages.values())

    # VPU FLOPs (order-of-magnitude; the binding roofline is bytes):
    # warp fan 2*(2D+2) masked FMAs x 5 planes (shift-skip cuts ~70% on
    # smooth flow — both numbers shown), normal eqs ~30, box 2*(3+5)
    # shifted adds x 5 planes, solve ~12, per pixel per iteration.
    # every level runs `iters` compute iterations (the coarse fused
    # kernel saves DMA, not FLOPs)
    px_iter = sum(lh * lw * iters for _k, lh, lw, _s, _k2 in plan)
    warp_full = 2 * (2 * D + 2) * 5 * 2
    flops_full = px_iter * (warp_full + 30 + 2 * 8 * 5 * 2 + 12)
    flops_skip = px_iter * (int(warp_full * 0.3) + 30 + 2 * 8 * 5 * 2 + 12)
    return stages, total, (flops_skip, flops_full)


def sparse_lk_frame(h, w, K=1024, levels=5, patch=38, iters=5, halo=8):
    """Sparse pyrLK (blocked-gather + corr_conv): pyramid + Scharr build,
    then per level a blocked two-128-lane-block gather per point + the
    correlation-table iteration loop (K on lanes)."""
    stages = {}
    lv = sum(int(h * 0.5 ** k) * int(w * 0.5 ** k) for k in range(levels))
    stages["pyramid"] = 2 * lv * F32
    stages["scharr"] = 3 * lv * F32            # gx, gy written, img read
    # per level: gather 2 blocks of (patch+2*halo) rows x 128 lanes x
    # 3 planes per point, once per level (corr tables then iterate in
    # registers); plus K-last working set r/w ~6 passes
    per_level = K * (patch + 2 * halo) * 2 * 128 * 3 * F32
    stages["block_gather"] = levels * per_level
    stages["solve"] = levels * K * patch * patch * 6 * F32
    total = sum(stages.values())
    flops = levels * K * patch * patch * (iters * 12 + 20)
    return stages, total, (flops, flops)


def pixel_ekf_frame(h, w):
    """Per-pixel 2-state KF per flow component: read flow (2 planes),
    read+write state mean/var (4 planes each way)."""
    b = h * w * F32 * (2 + 8)
    return {"pixel_ekf": b}, b, (h * w * 40, h * w * 40)


def rts_frame(K=256, sd=6):
    """RTS smoother marginal per frame: store + backward-read
    (x, P, x_pred, P_pred) per track."""
    b = 2 * K * (2 * sd + 2 * sd * sd) * F32
    return {"rts": b}, b, (K * (2 * sd ** 3 + 4 * sd ** 2),) * 2


def render_frame(P=8210, V=256, sweeps=5):
    """Mesh-render channel: per GN sweep one stacked (HW,3) row gather of
    P template pixels + one (3P,5) segment-sum + vertex solve."""
    per_sweep = P * (3 * F32 + F32) + 3 * P * 5 * F32 * 2
    b = sweeps * per_sweep + V * 6 * 6 * F32 * 4
    return {"render": b}, b, (sweeps * P * 60,) * 2


def row(name, stages, total, flops, measured_ms):
    roof_ms = total / HBM_GBPS * 1e3
    pct = (roof_ms / measured_ms * 100.0) if measured_ms else None
    return {"config": name, "bytes_mb": round(total / 1e6, 1),
            "gflops": round(flops[0] / 1e9, 2),
            "gflops_noskip": round(flops[1] / 1e9, 2),
            "roofline_ms": round(roof_ms, 3),
            "measured_ms": measured_ms,
            "pct_of_roofline": round(pct, 1) if pct else None,
            "stages_mb": {k: round(v / 1e6, 2) for k, v in stages.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", type=str, default="{}",
                    help='JSON {"cfg1": ms, ...} per-frame measured ms')
    args = ap.parse_args()
    meas = json.loads(args.measured)

    rows = []
    # cfg1: 256p dense LK — model with the dense-farneback accounting at
    # levels=5 as an upper bound (the lk_dense path builds the same
    # pyramids and iterates per level with the same warp pattern)
    s, t, f = dense_farneback_frame(256, 256)
    rows.append(row("cfg1_256p_lk_dense", s, t, f, meas.get("cfg1")))
    s, t, f = dense_farneback_frame(480, 854)
    rows.append(row("cfg2_480p_farneback", s, t, f, meas.get("cfg2")))
    sp, tp, fp = pixel_ekf_frame(480, 854)
    rows.append(row("cfg2_pixel_ekf_extra", sp, tp, fp,
                    meas.get("cfg2_pix")))
    s, t, f = dense_farneback_frame(720, 1280)
    rows.append(row("cfg3_720p_farneback", s, t, f, meas.get("cfg3")))
    s, t, f = dense_farneback_frame(1080, 1920)
    rows.append(row("cfg4_1080p_headline", s, t, f, meas.get("cfg4")))
    s, t, f = dense_farneback_frame(480, 854, levels=3)
    sr, tr, fr = rts_frame()
    s.update(sr)
    rows.append(row("cfg5_480p_L3+RTS", s, t + tr,
                    (f[0] + fr[0], f[1] + fr[1]), meas.get("cfg5")))
    s, t, f = sparse_lk_frame(1080, 1920)
    rows.append(row("sparse_lk_1080p_1k", s, t, f, meas.get("sparse")))
    s, t, f = render_frame()
    rows.append(row("render_1080p_v256", s, t, f, meas.get("render")))

    for r in rows:
        print(json.dumps(r))
    print("\n| config | bytes/frame (MB) | GFLOP/frame (skip..full) | "
          "roofline ms | measured ms | % of HBM roofline |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        mm = r["measured_ms"]
        print(f"| {r['config']} | {r['bytes_mb']} | {r['gflops']}–"
              f"{r['gflops_noskip']} | {r['roofline_ms']} | "
              f"{mm if mm else '—'} | "
              f"{r['pct_of_roofline'] if r['pct_of_roofline'] else '—'} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
