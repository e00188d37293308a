"""Analytic per-scan FLOP model of the ETCH architecture + baseline bound.

Purpose (BASELINE.md): the reference repo publishes no throughput numbers, so
the `vs_baseline` denominator in bench.py needs a defensible derivation.  The
rebuild and the reference implement the *same architecture math* (see SURVEY
§2), so a component-wise FLOP count of that math — evaluated at the
reference's default shapes (N=5000, A=60 anchors, K=24 kernel points,
src/train.py:163, EPN_options.py:19) — plus an optimistic GPU-efficiency
assumption bounds how fast the CUDA reference could possibly run.

Conventions: 1 multiply-add = 2 FLOPs; elementwise/compare ops counted where
they dominate (kernel-weight computation, distance matrices).  Formulas cite
the reference implementation they model.

Run:  python tools/flops_report.py            (pure python, no jax needed)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

A = 60       # icosahedral anchors (EPN_options.py:19)
K = 24       # kernel points (kernel_size=1 -> kpsphere24.ply, modules.py:13)
INTRA_NN = 12  # intra-conv anchor adjacency (rotation.py trace_idx, 60x12)


def epn_flops(cfg):
    """EPN encoder (reference vgtk so3conv/functional.py:224-324 inter conv,
    :331-378 intra conv; ETCH blocks src/models/so3conv.py:7-183)."""
    from etch_tpu.utils.config import backbone_plan

    total = 0.0
    rows = []
    for bi, block in enumerate(backbone_plan(cfg)):
        for ci, conv in enumerate(block):
            P2, nn_k = conv["n_out"], conv["n_neighbor"]
            Cin, Cout = conv["dim_in"], conv["dim_out"]
            n_in = conv["n_in"]
            f = 0.0
            # ball query: pairwise d2 against all input points (4 ops/pair)
            f += P2 * n_in * 4
            # kernel-influence weights relu(1-|x-R_a k|^2/sigma):
            # ~8 ops per (center, neighbor, anchor, kernel)
            f += P2 * nn_k * A * K * 8
            # contraction sum_n w * feat: 2 * P2*nn*A*K*Cin MACs->FLOPs
            f += 2 * P2 * nn_k * A * K * Cin
            # kernel-channel projection (BasicSO3Conv matmul)
            f += 2 * P2 * A * K * Cin * Cout
            # intra conv: 12-neighbor gather + (12*C -> C) matmul
            f += 2 * P2 * A * INTRA_NN * Cout * Cout
            # skip 1x1 conv
            f += 2 * P2 * A * Cin * Cout
            rows.append((f"epn b{bi}c{ci} (P2={P2},nn={nn_k},{Cin}->{Cout})", f))
            total += f
    return total, rows


def pt_unet_flops(N, planes, blocks=(2, 3, 4, 6, 3), strides=(1, 4, 4, 4, 4),
                  nsamples=(8, 16, 16, 16, 16), share=8, in_dim=3843):
    """PointTransformer U-Net (reference pointtransformer_seg.py:8-122,
    planes/blocks :133; rebuild nn/point_transformer.py).

    Per vector-attention layer at n points, p planes, ns neighbors:
      q/k/v linears        3 * 2*n*p^2
      pos-enc MLP (3->p->p)  n*ns*(2*3*p + 2*p*p)   [two linears per neighbor]
      weight MLP (p->p/s)    n*ns*(2*p*(p/s))
      softmax+aggregate      n*ns*(4*p)
      out linear             2*n*p^2
    TransitionDown at stride s: knn (n/s*n*4) + mlp n/s*ns*2*p_in*p_out + max.
    TransitionUp: interpolation 2*n*3*p + linears.
    """
    total = 0.0
    n = N
    # stem: in_dim -> planes[0]
    total += 2 * N * in_dim * planes[0]
    enc_ns = []
    for lvl, (p, b, s, ns) in enumerate(zip(planes, blocks, strides, nsamples)):
        p_prev = planes[0] if lvl == 0 else planes[lvl - 1]
        if s > 1:
            m = max(1, n // s)
            total += m * n * 4                       # knn for down
            total += m * ns * 2 * p_prev * p         # TD mlp on grouped
            n = m
        enc_ns.append(n)
        for _ in range(b):
            total += n * n * 0                       # (self-knn counted once)
            total += 3 * 2 * n * p * p
            total += n * ns * (2 * 3 * p + 2 * p * p)
            total += n * ns * (2 * p * (p // share))
            total += n * ns * 4 * p
            total += 2 * n * p * p
        total += n * n * 4                           # self-knn per level
    # decoder mirrors encoder with 1 block per level + interpolation
    for lvl in range(len(planes) - 1, 0, -1):
        p = planes[lvl]
        p_out = planes[lvl - 1]
        n_hi = enc_ns[lvl - 1]
        total += n_hi * enc_ns[lvl] * 4              # 3-nn interp knn
        total += 2 * n_hi * 3 * p                    # IDW
        total += 2 * n_hi * p * p_out                # up linear
        total += 3 * 2 * n_hi * p_out * p_out + \
            n_hi * nsamples[lvl - 1] * (2 * 3 * p_out + 2 * p_out * p_out +
                                        2 * p_out * (p_out // share) + 4 * p_out) + \
            2 * n_hi * p_out * p_out
    # final classifier
    total += 2 * N * planes[0] * planes[0]
    return total


def direction_head_flops(N, E=64, V=128, H=8, L=A, layers=2):
    """MHSA direction head (reference direction_backbones.py:129-223 +
    so3_mean so3conv.py:186-225): per point, L=60 anchor tokens."""
    per_pt = 0.0
    for li in range(layers):
        out = V if li == layers - 1 else E
        per_pt += 3 * 2 * L * E * E        # qkv
        per_pt += 2 * L * L * E            # logits
        per_pt += 5 * L * L                # softmax
        per_pt += 2 * L * L * E            # AV
        per_pt += 2 * L * E * out          # head_combine
    per_pt += 2 * L * V * V * 2            # BatchMLP
    per_pt += 2 * L * V                    # so3_reg weights
    per_pt += L * 9 * 4 + 9 * 9 * 6        # weighted 3x3 accumulation + eig
    return N * per_pt


def featprop_flops(N, M, C):
    """3-NN IDW upsample of EPN features (pointnet2_utils.py:45-74)."""
    return N * M * 4 + 2 * N * 3 * C


def our_fit_flops(steps=80, P=85, M=86):
    """Rebuild LM fit: marker submodel (86 verts) + jacfwd, per scan."""
    lbs = M * 24 * 16 * 2 + M * 3 * 10 * 2 + 207 * M * 3 * 2 + 24 * 64
    per_iter = lbs * (P + 1)          # jacfwd: P tangents + primal
    per_iter += 2 * (M * 3) * P * P   # JtJ
    per_iter += P ** 3 // 3 * 2       # solve
    return steps * per_iter


def reference_fit_flops(steps=80, P=85, V=6890, M=86):
    """Reference Theseus fit (fit_SMPL.py:157-255): every LM iteration runs
    the FULL smplx forward (6890-vertex LBS) and an autodiff Jacobian of the
    258-dim residual wrt 85 params (AutoDiffCostFunction -> functorch
    jacrev: ~258 reverse passes, each ~2x the forward)."""
    lbs = V * 24 * 16 * 2 + V * 3 * 10 * 2 + 207 * V * 3 * 2 + 24 * 64
    rows = 3 * M
    per_iter = lbs + rows * 2 * lbs   # primal + reverse passes
    per_iter += 2 * rows * P * P + P ** 3 // 3 * 2
    return steps * per_iter


def main():
    from etch_tpu.utils.config import EtchConfig

    N = 5000
    cfg = EtchConfig(num_point=N, batch_size=1)
    epn, epn_rows = epn_flops(cfg)
    dir_f = direction_head_flops(N)
    mag_f = pt_unet_flops(N, (64, 128, 256, 256, 512))
    conf_f = pt_unet_flops(N, (128, 128, 256, 256, 512))
    fp_f = featprop_flops(N, 1250, 3840)
    fwd = epn + dir_f + mag_f + conf_f + fp_f
    fit_ours = our_fit_flops()
    fit_ref = reference_fit_flops()

    print("== per-scan forward FLOPs (architecture math, N=5000) ==")
    for name, f in epn_rows:
        print(f"  {name:44s} {f/1e9:8.2f} GFLOP")
    print(f"  {'feature propagation':44s} {fp_f/1e9:8.2f} GFLOP")
    print(f"  {'direction head':44s} {dir_f/1e9:8.2f} GFLOP")
    print(f"  {'magnitude U-Net':44s} {mag_f/1e9:8.2f} GFLOP")
    print(f"  {'confidence U-Net':44s} {conf_f/1e9:8.2f} GFLOP")
    print(f"  {'TOTAL forward':44s} {fwd/1e9:8.2f} GFLOP")
    print(f"  {'fit (rebuild: 86-vert submodel LM)':44s} {fit_ours/1e9:8.2f} GFLOP")
    print(f"  {'fit (reference: 6890-vert smplx + jacrev)':44s} {fit_ref/1e9:8.2f} GFLOP")

    # ---- optimistic reference-rate bound (documented in BASELINE.md) ----
    # A100 SXM f32 non-TF32 peak (reference trains with TF32 off,
    # src/train.py:23): 19.5 TFLOP/s.  Optimistic achieved efficiency for
    # gather-heavy point-cloud research code: 25%.  Theseus adds a python
    # driver loop: >= 2 ms/LM-iteration of launch/driver overhead is
    # generous for 80 sequential iterations of TheseusLayer.forward.
    peak = 19.5e12
    mfu = 0.25
    t_fwd = fwd / (peak * mfu)
    t_fit = fit_ref / (peak * mfu) + 80 * 2e-3
    rate = 1.0 / (t_fwd + t_fit)
    print("\n== optimistic CUDA-reference bound (A100 f32, 25% eff.) ==")
    print(f"  forward: {t_fwd*1e3:.1f} ms   fit: {t_fit*1e3:.1f} ms"
          f"   -> <= {rate:.2f} scans/sec")
    print(json.dumps({
        "fwd_gflop": round(fwd / 1e9, 2),
        "fit_ref_gflop": round(fit_ref / 1e9, 2),
        "fit_ours_gflop": round(fit_ours / 1e9, 2),
        "reference_bound_scans_per_sec": round(rate, 3),
    }))


if __name__ == "__main__":
    main()
