"""On-TPU correctness pass: run the compiled Pallas kernels, the fused
frame step and a bundle-adjustment step on the REAL chip and compare
against CPU goldens (VERDICT round-2 ask #4).

Two-phase (one JAX process can only hold one backend):
    python examples/tpu_validation.py golden   # JAX_PLATFORMS=cpu, writes
                                               # /tmp/tpu_golden.npz
    python examples/tpu_validation.py check    # on the TPU, compares and
                                               # writes TPU_PARITY.json

Expected parity classes:
- FAST scores / NMS / keypoint slots: EXACT (integer pipelines).
- Angles, subpixel coords: ~1e-3 (f32 transcendentals).
- Descriptors: small Hamming tolerance — the gaussian-blur einsum runs at
  the TPU's default bf16 matmul precision, so floor() can flip on near-
  integer blurred values; descriptors stay self-consistent per platform.
- BA poses: ~1e-3 m (f32 reductions in different orders).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = "/tmp/tpu_golden.npz"


def build_and_run():
    import jax
    import jax.numpy as jnp

    import jetson_slam_tpu
    jetson_slam_tpu.enable_compilation_cache()
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.ops.frontend import OrbFrontend
    from jetson_slam_tpu.ops.pallas_frontend import fast_score_nms_pallas
    from jetson_slam_tpu.ops.tables import BORDER_SKIP
    from jetson_slam_tpu.core.local_ba import local_ba

    on_tpu = jax.default_backend() != "cpu"
    seq = make_stereo_sequence(seed=42, n_frames=2, h=240, w=320,
                               n_points=800)
    # DEFAULT per-platform configuration — the parity artifact reflects
    # what actually ships: on TPU that is the Pallas descriptor kernel
    # (f32-HIGHEST blur) + Pallas stereo correlation; on CPU the XLA paths
    fe = OrbFrontend(240, 320, n_levels=4, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16, use_pallas=True)
    out = {}

    # 1. Pallas FAST+NMS kernel (compiled on TPU, interpreted on CPU)
    img = jnp.asarray(seq.lefts[0])
    roi = np.array([[BORDER_SKIP, 240 - BORDER_SKIP,
                     BORDER_SKIP, 320 - BORDER_SKIP]], np.int32)
    raw_s, nms_s = fast_score_nms_pallas(
        img[None], jnp.asarray(roi), 20, 9, 16,
        interpret=not on_tpu)
    out["fast_raw"] = np.asarray(jax.device_get(raw_s))[0]
    out["fast_nms"] = np.asarray(jax.device_get(nms_s))[0]

    # 2. fused stereo frame step
    l, r, u_r, depth, dist = fe.frame_step(
        seq.lefts[0], seq.rights[0], float(seq.bf), float(seq.baseline))
    l, u_r, depth = jax.device_get((l, u_r, depth))
    out["valid"] = np.asarray(l.valid)
    out["xs"] = np.asarray(l.xs)
    out["ys"] = np.asarray(l.ys)
    out["lx"] = np.asarray(l.lx)
    out["ly"] = np.asarray(l.ly)
    out["response"] = np.asarray(l.response)
    out["angle"] = np.asarray(l.angle)
    out["desc"] = np.asarray(l.desc)
    out["u_right"] = np.asarray(u_r)
    out["depth"] = np.asarray(depth)

    # 3. one bundle-adjustment step on a fixed problem
    rng = np.random.default_rng(0)
    n_c, n_p = 6, 64
    pts = np.stack([rng.uniform(-4, 4, n_p), rng.uniform(-3, 3, n_p),
                    rng.uniform(6, 14, n_p)], 1).astype(np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (n_c, 1, 1))
    ts = np.zeros((n_c, 3), np.float32)
    ts[:, 0] = 0.3 * np.arange(n_c)
    FX = FY = 300.0
    CX, CY, BF = 160.0, 120.0, 40.0
    e_cam, e_pt, obs = [], [], []
    for c in range(n_c):
        pc = pts.copy(); pc[:, 0] -= ts[c, 0]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        for p in range(n_p):
            e_cam.append(c); e_pt.append(p)
            obs.append([u[p] + rng.normal() * 0.3,
                        v[p] + rng.normal() * 0.3,
                        u[p] - BF / pc[p, 2]])
    E = len(e_cam)
    e_cam = np.asarray(e_cam, np.int32); e_pt = np.asarray(e_pt, np.int32)
    obs = np.asarray(obs, np.float32)
    D = int(np.bincount(e_pt).max())
    pt_edges = np.full((n_p, D), -1, np.int32)
    fill = np.zeros(n_p, np.int64)
    for e in range(E):
        pt_edges[e_pt[e], fill[e_pt[e]]] = e
        fill[e_pt[e]] += 1
    fixed = np.zeros(n_c, bool); fixed[0] = True
    pts_i = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    R2, t2, p2, outl = jax.device_get(local_ba(
        jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(fixed),
        jnp.asarray(pts_i), jnp.asarray(e_cam), jnp.asarray(e_pt),
        jnp.asarray(obs), jnp.asarray(np.ones(E, bool)),
        jnp.asarray(np.ones(E, np.float32)), jnp.asarray(np.ones(E, bool)),
        jnp.asarray(pt_edges), FX, FY, CX, CY, BF))
    out["ba_t"] = np.asarray(t2)
    out["ba_p"] = np.asarray(p2)
    out["ba_outl"] = np.asarray(outl)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "golden":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        out = build_and_run()
        np.savez_compressed(GOLDEN, **out)
        print(f"golden written: {GOLDEN}")
        return
    got = build_and_run()
    ref = dict(np.load(GOLDEN))
    v = ref["valid"].astype(bool) & got["valid"].astype(bool)
    # slots where both platforms selected the SAME integer keypoint: the
    # per-tile NMS-G argmax breaks exact integer score TIES by backend-
    # specific order; a tie slot holds a different (equally scored) corner
    # and every per-keypoint quantity legitimately differs there
    same_kp = v & (ref["lx"] == got["lx"]) & (ref["ly"] == got["ly"])
    ties = v & ~same_kp
    ties_are_true_ties = bool(
        (ref["response"][ties] == got["response"][ties]).all())
    s = same_kp
    ham = np.unpackbits(ref["desc"][s] ^ got["desc"][s], axis=1).sum(1)
    ur_r, ur_g = ref["u_right"][s], got["u_right"][s]
    both_matched = (ur_r >= 0) & (ur_g >= 0)
    report = {
        "valid_slots_equal": bool((ref["valid"] == got["valid"]).all()),
        "n_valid": int(v.sum()),
        "fast_raw_exact": bool((ref["fast_raw"] == got["fast_raw"]).all()),
        "fast_nms_exact": bool((ref["fast_nms"] == got["fast_nms"]).all()),
        "argmax_tie_fraction": float(ties.sum() / max(v.sum(), 1)),
        "ties_have_equal_scores": ties_are_true_ties,
        "xs_max_abs_diff": float(np.abs(ref["xs"][s] - got["xs"][s]).max()),
        "ys_max_abs_diff": float(np.abs(ref["ys"][s] - got["ys"][s]).max()),
        "angle_max_abs_diff_deg": float(np.abs(
            ((ref["angle"][s] - got["angle"][s] + 180) % 360) - 180).max()),
        "desc_hamming_mean": float(ham.mean()),
        "desc_hamming_max": int(ham.max()),
        "desc_exact_fraction": float((ham == 0).mean()),
        "stereo_match_agreement": float(
            ((ur_r >= 0) == (ur_g >= 0)).mean()),
        "u_right_max_abs_diff_matched": float(
            np.abs(ur_r[both_matched] - ur_g[both_matched]).max()),
        "ba_t_max_abs_diff": float(np.abs(ref["ba_t"] - got["ba_t"]).max()),
        "ba_p_median_abs_diff": float(np.median(
            np.abs(ref["ba_p"] - got["ba_p"]))),
        "ba_outlier_agreement": float(
            (ref["ba_outl"] == got["ba_outl"]).mean()),
    }
    ok = (report["valid_slots_equal"] and report["fast_raw_exact"]
          and report["fast_nms_exact"]
          and report["argmax_tie_fraction"] < 0.05
          and report["ties_have_equal_scores"]
          and report["xs_max_abs_diff"] < 0.1
          and report["angle_max_abs_diff_deg"] < 0.1
          and report["desc_hamming_mean"] < 8.0
          and report["stereo_match_agreement"] > 0.95
          and report["ba_t_max_abs_diff"] < 5e-3)
    report["ok"] = bool(ok)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_PARITY.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("TPU parity:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
