"""Scatter-min vs sort-based z-buffer A/B at the scorer operating point.

Round-4 floor analysis: the packed z-buffer's single fused scatter-min is
1.47 s of the 4.9 s K=4 scored program — XLA:TPU scatter serializes at ~16
cycles/update (72 M updates/s, batching-shape-invariant; see
tools/onchip_geometry_split.py). Every vectorized alternative on TPU reduces
to sort/binning, so this tool measures the decisive primitive costs:

  1. scatter_baseline — the production fused scatter-min, per clip
     (T*N = 26.8M updates into T*(HW+1) = 2.68M slots)
  2. sort_u32_pid    — ONE stable u32-key sort of the 29.5M entries
     (composite key (lin<<10)|zq; pid rides as payload — entries sharing
     lin are same-view and array-ordered by pid, so stability IS the exact
     lowest-pid-among-depth-ties tie-break), updates + one sentinel per slot
  3. runstart_mask   — the vector pass computing run starts
  4. sort_compact    — stable sort by (NOT run-start) bringing the P
     winners to the front in slot order (the scatter-free placement)
  5. sortmin_full    — end-to-end sort-based z-buffer (2 sorts + masks +
     slice + decode gather), the would-be production candidate
  6. cumsum_29m / gather_p — the building blocks' individual costs

Run: PYTHONPATH=/root/repo python tools/onchip_sortmin_ab.py
"""

import json
import sys
import time

import numpy as np

T, HW_S = 10, 518


def main():
    import jax
    import jax.numpy as jnp

    from videogpa_tpu.train.memory import _enable_compile_cache

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    S = HW_S
    N = T * S * S  # points per clip (2.68M)
    n_px = S * S
    P = T * (n_px + 1)  # slots (2.68M)
    U = T * N  # updates (26.8M)
    key = jax.random.PRNGKey(0)

    # synthetic but realistically-distributed updates: lin uniform over
    # slots, zq uniform over the 10-bit range (occupancy ~10 updates/slot,
    # matching production), pids array-ordered per view
    k1, k2 = jax.random.split(key)
    lin = jax.random.randint(k1, (U,), 0, P, jnp.int32)
    zq = jax.random.randint(k2, (U,), 0, 1023, jnp.int32).astype(jnp.uint32)
    pid = jnp.tile(
        jax.lax.broadcasted_iota(jnp.uint32, (N, 1), 0)[:, 0], (T,)
    )
    key32 = jnp.where(True, (zq << 22) | pid, jnp.uint32(0xFFFFFFFF))

    results = {}

    def timeit(name, fn, *args, iters=3):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(np.asarray(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32))))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            float(np.asarray(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32))))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[name] = dt
        print(json.dumps({"name": name, "s": round(dt, 4)}), flush=True)
        return dt

    # 1. production scatter-min baseline (one clip)
    @jax.jit
    def scatter_baseline(lin, key32):
        buf = jnp.full((P,), jnp.uint32(0xFFFFFFFF))
        return buf.at[lin].min(key32)

    timeit("scatter_baseline_26.8M", scatter_baseline, lin, key32)

    # composite u32 sort key: (lin << 10) | zq  (lin < 2^22, zq < 2^10)
    @jax.jit
    def build_composite(lin, zq):
        comp = (lin.astype(jnp.uint32) << 10) | zq
        # one sentinel per slot: zq=1023 ( > any valid zq <= 1022 )
        sent = (
            jax.lax.broadcasted_iota(jnp.uint32, (P, 1), 0)[:, 0] << 10
        ) | jnp.uint32(1023)
        comp_all = jnp.concatenate([comp, sent])
        pid_all = jnp.concatenate([pid, jnp.zeros((P,), jnp.uint32)])
        return comp_all, pid_all

    comp_all, pid_all = jax.block_until_ready(build_composite(lin, zq))
    timeit("build_composite", build_composite, lin, zq)

    # 2. the decisive primitive: stable u32 sort with one u32 payload, 29.5M
    @jax.jit
    def sort_u32_pid(comp_all, pid_all):
        return jax.lax.sort((comp_all, pid_all), num_keys=1, is_stable=True)

    cs, ps = jax.block_until_ready(sort_u32_pid(comp_all, pid_all))
    timeit("sort_u32_pid_29.5M", sort_u32_pid, comp_all, pid_all)

    # 2b. unstable variant (cheaper network?) with pid folded — not exact,
    # measured only to see what stability costs
    @jax.jit
    def sort_u32_unstable(comp_all):
        return jax.lax.sort((comp_all,), num_keys=1, is_stable=False)

    timeit("sort_u32_nopayload_unstable", sort_u32_unstable, comp_all)

    # 3. run-start mask + compaction key
    @jax.jit
    def runstart(cs):
        slot = cs >> 10
        prev = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32),
                                slot[:-1]])
        return (slot != prev).astype(jnp.uint32)

    m = jax.block_until_ready(runstart(cs))
    timeit("runstart_mask", runstart, cs)

    # 4. placement: stable sort by (1 - run_start) — winners to the front
    @jax.jit
    def sort_compact(m, cs, ps):
        _, cs2, ps2 = jax.lax.sort((1 - m, cs, ps), num_keys=1,
                                   is_stable=True)
        return cs2[:P], ps2[:P]

    timeit("sort_compact_29.5M", sort_compact, m, cs, ps)

    # 5. end-to-end sort-based z-buffer (what production would run)
    @jax.jit
    def sortmin_full(lin, zq):
        comp_all, pid_all = build_composite(lin, zq)
        cs, ps = jax.lax.sort((comp_all, pid_all), num_keys=1, is_stable=True)
        slot = cs >> 10
        prev = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32),
                                slot[:-1]])
        m = (slot != prev).astype(jnp.uint32)
        _, cs2, ps2 = jax.lax.sort((1 - m, cs, ps), num_keys=1,
                                   is_stable=True)
        win_zq = cs2[:P] & jnp.uint32(1023)
        hit = win_zq != jnp.uint32(1023)
        return jnp.where(hit, ps2[:P], jnp.uint32(0))

    timeit("sortmin_full", sortmin_full, lin, zq)

    # 6. building blocks for alternatives
    @jax.jit
    def cumsum_u(m):
        return jnp.cumsum(m)

    timeit("cumsum_29.5M", cumsum_u, m)

    g_idx = jnp.arange(0, U, U // n_px, dtype=jnp.int32)[:n_px]

    @jax.jit
    def gather_p(key32, g_idx):
        return key32[g_idx]

    timeit("gather_268k_from_26.8M", gather_p, key32, g_idx)

    # verdict: exactness cross-check on a small case + speed summary
    small_P, small_U = 4096, 40960
    kl, kz = jax.random.split(jax.random.PRNGKey(7))
    lin_s = jax.random.randint(kl, (small_U,), 0, small_P, jnp.int32)
    zq_s = jax.random.randint(kz, (small_U,), 0, 1023, jnp.int32).astype(
        jnp.uint32)
    pid_s = jax.lax.broadcasted_iota(jnp.uint32, (small_U, 1), 0)[:, 0]

    buf = np.full((small_P,), 0xFFFFFFFF, np.uint32)
    key_s = (np.asarray(zq_s) << 22) | np.asarray(pid_s)
    np.minimum.at(buf, np.asarray(lin_s), key_s)
    want_pid = np.where(buf != 0xFFFFFFFF, buf & ((1 << 22) - 1), 0)

    comp = (lin_s.astype(jnp.uint32) << 10) | zq_s
    sent = (jax.lax.broadcasted_iota(jnp.uint32, (small_P, 1), 0)[:, 0]
            << 10) | jnp.uint32(1023)
    ca = jnp.concatenate([comp, sent])
    pa = jnp.concatenate([pid_s, jnp.zeros((small_P,), jnp.uint32)])
    cs_, ps_ = jax.lax.sort((ca, pa), num_keys=1, is_stable=True)
    slot = cs_ >> 10
    prev = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, jnp.uint32),
                            slot[:-1]])
    mm = (slot != prev).astype(jnp.uint32)
    _, cs2_, ps2_ = jax.lax.sort((1 - mm, cs_, ps_), num_keys=1,
                                 is_stable=True)
    got_hit = (cs2_[:small_P] & jnp.uint32(1023)) != 1023
    got_pid = np.where(np.asarray(got_hit), np.asarray(ps2_[:small_P]), 0)
    exact = bool(np.array_equal(want_pid, got_pid))

    print(json.dumps({
        "name": "summary",
        "exact_small_case": exact,
        "scatter_s": round(results["scatter_baseline_26.8M"], 4),
        "sortmin_s": round(results["sortmin_full"], 4),
        "speedup": round(
            results["scatter_baseline_26.8M"] / results["sortmin_full"], 3),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
