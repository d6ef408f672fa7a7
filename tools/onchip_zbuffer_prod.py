"""Production-shaped A/B: packed z-buffer, XLA scatter vs Pallas kernel.

tools/onchip_zbuffer_pallas.py measured the tiered windowed kernel's FAST
PATH at 4.7x the XLA scatter on all-in-window synthetic data. This tool
answers the production question: what tier mix do projection-shaped updates
actually produce, and what's the end-to-end reproject win?

Scenes (T=10 views at 518x518, one fused 2.68M-point cloud — the scorer's
exact operating shape):
  smooth — sinusoidal depth maps, cameras on an arc: the trained-model case
           (VGGT depth is locally smooth); expect tier 0/1 dominance
  edges  — smooth depth + rectangular foreground objects (depth steps):
           chunks straddling an edge project bimodally; expect some tier 2
  noise  — uniform random depth: the adversarial worst case (and closest to
           the bench's random-weight scorer inputs); expect heavy tier 2

For each scene: tier histogram (host-side classify_chunks mirror), then
min-of-3 on-chip timings of reproject_views_packed under both lowerings
(VIDEOGPA_ZBUFFER_KERNEL toggled around fresh jit wrappers; outputs compared
bit-exact).

MEASURED VERDICT (2026-08-20, v5e): negative — tier2 is ~70% on ALL three
scenes (smooth/edges/noise: .698/.700/.729) and the kernel runs 0.55x the
scatter (0.605 vs 0.335 s smooth; 0.620 vs 0.313 noise), outputs
bit-identical. Root cause: v_dest = f*y/z sweeps tens of destination rows
as depth varies across a source row, so chunk footprints span thousands of
slots even for smooth depth. The kernel stays opt-in for coherent clouds;
the XLA scatter stays the production lowering (see ARCHITECTURE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/onchip_zbuffer_prod.py
"""

import json
import os
import sys
import time

import numpy as np

T, S = 10, 518


def make_scene(kind, rng):
    """Per-frame depth maps + camera ring -> fused world cloud + cameras."""
    yy, xx = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    f = 400.0
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (T, 1, 1))

    # cameras on a small arc around the scene origin
    Es = []
    for t in range(T):
        th = (t - T / 2) * 0.04
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            np.float32,
        )
        tr = np.array([0.1 * t - 0.5, 0.0, 0.02 * t], np.float32)
        Es.append(np.concatenate([R, tr[:, None]], axis=1))
    Es = np.stack(Es)

    pts = []
    for t in range(T):
        if kind == "smooth":
            z = 3.0 + 0.8 * np.sin(xx / 37.0 + t) * np.cos(yy / 53.0 - t * 0.3)
        elif kind == "edges":
            z = 3.0 + 0.8 * np.sin(xx / 37.0 + t) * np.cos(yy / 53.0)
            for j in range(6):  # foreground rectangles with hard depth steps
                y0, x0 = rng.integers(0, S - 90, 2)
                z[y0 : y0 + 80, x0 : x0 + 80] = 1.2 + 0.1 * j
        else:  # noise
            z = rng.uniform(1.0, 5.0, (S, S))
        z = z.astype(np.float32)
        # unproject through frame t's camera: x_cam = z * K^-1 [u,v,1]
        xc = (xx - S / 2) / f * z
        yc = (yy - S / 2) / f * z
        cam = np.stack([xc, yc, z], axis=-1).reshape(-1, 3)
        R, tr = Es[t, :, :3], Es[t, :, 3]
        pts.append((cam - tr) @ R)  # world = R^T (cam - t)
    points = np.concatenate(pts).astype(np.float32)
    colors = rng.uniform(0, 255, (points.shape[0], 3)).astype(np.float32)
    return points, colors, Ks, Es


def tier_histogram(points, colors, Ks, Es):
    """Host-side mirror of reproject_views_packed's update stream +
    classify_chunks (diagnostic only — the production path is the source of
    truth; this reproduces projection.py:212-238 in numpy)."""
    n = points.shape[0]
    n_px = S * S
    pid_bits = max(22, (max(n, 2) - 1).bit_length())
    zq_bits = 32 - pid_bits
    zq_top = float((1 << zq_bits) - 2)

    R = Es[:, :3, :3]
    t = Es[:, :3, 3]
    pc_cam = np.einsum("nd,tkd->tnk", points, R) + t[:, None, :]
    pc_proj = np.einsum("tnk,tmk->tnm", pc_cam, Ks)
    z = pc_proj[..., 2]
    u = np.round(pc_proj[..., 0] / (z + 1e-8)).astype(np.int64)
    v = np.round(pc_proj[..., 1] / (z + 1e-8)).astype(np.int64)
    ok = (u >= 0) & (u < S) & (v >= 0) & (v < S) & (z > 0)
    zmin = np.min(np.where(ok, z, np.inf), axis=1, keepdims=True)
    zmax = np.max(np.where(ok, z, -np.inf), axis=1, keepdims=True)
    scale = zq_top / np.maximum(zmax - zmin, 1e-9)
    zq = np.clip((z - zmin) * scale, 0, zq_top).astype(np.uint64)
    key = np.where(
        ok, (zq << pid_bits) | np.arange(n, dtype=np.uint64)[None, :],
        np.uint64(0xFFFFFFFF),
    ).astype(np.uint32)
    vb = (np.arange(T, dtype=np.int64) * (n_px + 1))[:, None]
    lin = (vb + np.where(ok, v * S + u, n_px)).reshape(-1).astype(np.int32)
    key = key.reshape(-1)

    # classify_chunks mirror
    CH = 1024
    U = lin.shape[0]
    n_sub = -(-U // CH)
    pad = n_sub * CH - U
    if pad:
        lin = np.concatenate([lin, np.zeros(pad, np.int32)])
        key = np.concatenate([key, np.full(pad, 0xFFFFFFFF, np.uint32)])
    lin2 = lin.reshape(n_sub, CH)
    valid = key.reshape(n_sub, CH) != np.uint32(0xFFFFFFFF)
    n_slots = T * (n_px + 1)
    n_rows = -(-n_slots // 128)
    n_rows += (-n_rows) % 8
    amin = np.min(np.where(valid, lin2, np.iinfo(np.int32).max), axis=1)
    amax = np.max(np.where(valid, lin2, -1), axis=1)
    any_valid = amax >= 0
    base = np.where(any_valid, (amin >> 7) & ~np.int32(7), 0)
    base = np.minimum(base, n_rows - 32)
    spread = amax - base * 128
    tier = np.where(spread < 1024, 0, np.where(spread < 4096, 1, 2))
    tier = np.where(any_valid, tier, 0)
    hist = [int((tier == k).sum()) for k in (0, 1, 2)]
    return {
        "tier0": round(hist[0] / n_sub, 3),
        "tier1": round(hist[1] / n_sub, 3),
        "tier2": round(hist[2] / n_sub, 3),
        "invalid_frac": round(1.0 - valid.mean(), 3),
    }


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.geometry import zbuffer_kernel
    from videogpa_tpu.geometry.projection import reproject_views_packed
    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    rng = np.random.default_rng(0)
    out_summary = {}
    for kind in ("smooth", "edges", "noise"):
        points, colors, Ks, Es = make_scene(kind, rng)
        hist = tier_histogram(points, colors, Ks, Es)
        print(json.dumps({"name": f"{kind}_tiers", **hist}), flush=True)

        args = (
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), S, S,
        )
        times, outs = {}, {}
        for mode, env in (("scatter", "0"), ("kernel", "1")):
            os.environ["VIDEOGPA_ZBUFFER_KERNEL"] = env
            f = jax.jit(
                lambda p, c, k, e: reproject_views_packed(p, c, k, e, S, S)
            )
            r = f(*args[:4])
            np.asarray(r[0, :2, :2])  # host-pull sync
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = f(*args[:4])
                np.asarray(r[0, :2, :2])
                dt = min(dt, time.perf_counter() - t0)
            times[mode] = dt
            outs[mode] = np.asarray(r[:, ::37, ::41])  # sparse witness
            print(json.dumps({"name": f"{kind}_{mode}", "s": round(dt, 4)}),
                  flush=True)
        identical = bool(np.array_equal(outs["scatter"], outs["kernel"]))
        out_summary[kind] = {
            "scatter_s": round(times["scatter"], 4),
            "kernel_s": round(times["kernel"], 4),
            "speedup": round(times["scatter"] / times["kernel"], 3),
            "outputs_match": identical,
            **hist,
        }
    print(json.dumps({"name": "summary", **out_summary}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
