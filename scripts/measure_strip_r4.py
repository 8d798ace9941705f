#!/usr/bin/env python
"""Round-4 large-2N measurement: (a) extend the fused-vs-naive crossover
table to 2N = 8192/16384 (full matrix), (b) measure ONE CHIP'S WORK of the
row-sharded form at mesh=8 — a [2n_local, 2N] strip with 2n_local = 2N/8 —
fused strip kernels vs the naive jnp strip (parallel/contrastive.py math
minus collectives; the [2N]-sized stat gathers and scalar psums it omits are
negligible next to the [strip] tensors).

Per-chip work is faithful per path: the naive strip differentiates w.r.t.
rows AND columns (its real autodiff computes the column cotangents locally
before the reduce_scatter); the fused strip runs its one-pass symmetric
backward with the column stats as precomputed inputs (they arrive via a
[2N] all_gather in the real path).

Timing: scan-chained iterations per program with gradient-dependent carry
(scripts/measure_crossover2.py pattern), profiler device plane only.

Run SOLO on the real TPU (long: ~8 programs x minutes of remote compile):
  setsid nohup python scripts/measure_strip_r4.py > tmp/strip_r4.log 2>&1 &
Writes tmp/strip_r4.json.
"""
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

D = 256
ITERS = 10
GAMMA = 20.0
INV_T = 1.0 / 0.07


def _mk(two_n, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randn(two_n, D).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    labels = rng.randint(0, 3, two_n).astype(np.float32)
    valid = np.ones(two_n, np.float32)
    return jnp.asarray(z), jnp.asarray(labels), jnp.asarray(valid)


def _timed(make_prog, z0, label):
    from spcl_tpu.utils.profiling import profile_device_time
    prog = make_prog()
    try:
        out = prog(z0)
        jax.block_until_ready(out)
    except Exception as e:  # OOM etc — record and move on
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    ms_prog = profile_device_time(lambda: prog(z0), reps=3)
    ms = ms_prog / ITERS if ms_prog else None
    print(f"{label}: {ms} ms/iter", flush=True)
    return ms


# ---------------------------------------------------------------- full matrix
def full_matrix_row(two_n):
    from spcl_tpu.losses import self_paced_supcon_loss
    from spcl_tpu.ops import fused_self_paced_supcon

    n = two_n // 2
    z, labels, valid = _mk(two_n)
    z1, z2 = z[:n], z[n:]
    lab, val = labels[:n].astype(jnp.int32), valid[:n]
    gamma = jnp.asarray(GAMMA, jnp.float32)
    row = {"two_n": two_n, "form": "full", "iters": ITERS}

    def naive(a, b):
        loss, _ = self_paced_supcon_loss(a, b, gamma=gamma, target=lab,
                                         valid=val, weight_update="soft")
        return loss

    def fused(a, b):
        loss, _ = fused_self_paced_supcon(a, b, gamma=gamma, target=lab,
                                          valid=val, weight_update="soft")
        return loss

    for name, fn in (("naive", naive), ("fused", fused)):
        vg = jax.value_and_grad(fn, argnums=(0, 1))

        def make_prog():
            def body(carry, _):
                a, b = carry
                loss, (g1, g2) = vg(a, b)
                return (a - 1e-3 * g1, b - 1e-3 * g2), loss

            @jax.jit
            def prog(zz):
                (a, b), losses = jax.lax.scan(body, (zz[:n], zz[n:]), None,
                                              length=ITERS)
                return a, b, losses
            return prog

        row[f"{name}_ms"] = _timed(make_prog, z, f"full 2N={two_n} {name}")
    if row.get("naive_ms") and row.get("fused_ms"):
        row["speedup"] = row["naive_ms"] / row["fused_ms"]
    return row


# ---------------------------------------------------------------- strip forms
def _strip_operands(two_n, shards=8):
    """One chip's operands at mesh=`shards`: rows = first strip, cols = all."""
    from spcl_tpu.ops import supcon_pallas as sp
    zc, tc, vc = _mk(two_n)
    rows = two_n // shards
    gid_c = jnp.arange(two_n, dtype=jnp.float32)
    zr0, tr, vr = zc[:rows], tc[:rows], vc[:rows]
    gid_r = gid_c[:rows]
    return sp, zr0, tr, vr, gid_r, zc, tc, vc, gid_c, rows


def strip_row(two_n, shards=8):
    sp, zr0, tr, vr, gid_r, zc, tc, vc, gid_c, rows = _strip_operands(two_n, shards)
    gamma = jnp.asarray(GAMMA, jnp.float32)
    inv_t = jnp.asarray(INV_T, jnp.float32)
    row = {"two_n": two_n, "form": f"strip/{shards}", "rows": rows, "iters": ITERS}

    # ---- naive strip (parallel/contrastive.py:~100-147 math, local sums,
    # grads w.r.t. rows AND cols like its real autodiff)
    def naive_strip(zr, zcols):
        sim = jnp.dot(zr, zcols.T, preferred_element_type=jnp.float32) * inv_t
        sim = sim - jax.lax.stop_gradient(jnp.max(sim))
        pos = jnp.equal(tr[:, None], tc[None, :]).astype(jnp.float32)
        pos = pos * vr[:, None] * vc[None, :]
        not_diag = 1.0 - (gid_c[None, :] == gid_r[:, None])
        pos = pos * not_diag
        neg = (1.0 - jnp.equal(tr[:, None], tc[None, :]).astype(jnp.float32))
        neg = neg * vr[:, None] * vc[None, :] * not_diag
        sim_exp = jnp.exp(sim)
        denom = jnp.sum(sim_exp * (pos + neg), axis=1, keepdims=True)
        log_prob = sim - jnp.log(denom + 1e-16)
        l_ij = -jax.lax.stop_gradient(log_prob)
        w = jnp.maximum(1.0 - l_ij / gamma, 0.0)
        sp_m = jnp.maximum(w, 1.0 - pos)
        pos_count = jnp.sum(pos, axis=1)
        row_loss = jnp.sum(log_prob * sp_m * pos, axis=1) / jnp.maximum(pos_count, 1.0)
        row_ok = vr * (pos_count > 0)
        return -jnp.sum(row_loss * row_ok) / jnp.maximum(jnp.sum(row_ok), 1.0)

    vg_naive = jax.value_and_grad(naive_strip, argnums=(0, 1))

    def make_naive():
        def body(carry, _):
            a, c = carry
            loss, (ga, gc) = vg_naive(a, c)
            return (a - 1e-3 * ga, c - 1e-3 * gc), loss

        @jax.jit
        def prog(zz):
            (a, c), losses = jax.lax.scan(body, (zz[:rows], zz), None, length=ITERS)
            return a, c, losses
        return prog

    row["naive_ms"] = _timed(make_naive, zc, f"strip 2N={two_n} naive")

    # ---- fused strip: pass A/B + symmetric one-pass bwd; column stats are
    # precomputed inputs (real path: [2N] all_gather, negligible)
    stats_full = sp._fwd_stats(zc, zc, tc, tc, vc, vc, gid_c, gid_c,
                               inv_t, gamma, "soft")
    _, c_f, denom_f, a_f, _ = stats_full
    c_g, denom_g, a_g = c_f[:, 0], denom_f[:, 0], a_f[:, 0]
    c_g, denom_g, a_g = jax.device_put((c_g, denom_g, a_g))

    @jax.custom_vjp
    def fused_strip(zr, zcols):
        return _fused_fwd(zr, zcols)[0]

    def _fused_fwd(zr, zcols):
        rowloss, c, denom, a, _ = sp._fwd_stats(
            zr, zcols, tr, tc, vr, vc, gid_r, gid_c, inv_t, gamma, "soft")
        row_ok = ((c[:, 0] > 0) & (vr > 0)).astype(jnp.float32)
        m = jnp.maximum(jnp.sum(row_ok), 1.0)
        loss = -jnp.sum(rowloss[:, 0] * row_ok) / m
        return loss, (zr, zcols, c, denom, a, m)

    def _fused_bwd(res, g):
        zr, zcols, c, denom, a, m = res
        dz = sp._bwd_dz(zr, zcols, tr, tc, vr, vc, gid_r, gid_c,
                        c[:, 0], c_g, denom[:, 0], denom_g, a[:, 0], a_g,
                        inv_t, gamma, g / m, "soft")
        return dz, jnp.zeros_like(zcols)

    fused_strip.defvjp(_fused_fwd, _fused_bwd)
    vg_fused = jax.value_and_grad(fused_strip, argnums=(0, 1))

    def make_fused():
        def body(carry, _):
            a, c = carry
            loss, (ga, gc) = vg_fused(a, c)
            return (a - 1e-3 * ga, c - 1e-3 * gc), loss

        @jax.jit
        def prog(zz):
            (a, c), losses = jax.lax.scan(body, (zz[:rows], zz), None, length=ITERS)
            return a, c, losses
        return prog

    row["fused_ms"] = _timed(make_fused, zc, f"strip 2N={two_n} fused")
    if row.get("naive_ms") and row.get("fused_ms"):
        row["speedup"] = row["naive_ms"] / row["fused_ms"]
    return row


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = []
    for two_n in (8192, 16384):
        results.append(full_matrix_row(two_n))
    for two_n in (16384, 32768):
        results.append(strip_row(two_n))
    out_path = Path(__file__).resolve().parents[1] / "tmp" / "strip_r4.json"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
