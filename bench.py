#!/usr/bin/env python3
"""Headline benchmark: MV-test3k-scale similarity-matrix ranking
throughput per chip (BASELINE.json metric).

Workload: T=59,800 captions x V=2,990 videos x H=8 heads x d=512 — the
LAFF-ml evaluation shape on MV-test3k. One "query" = one caption fully
ranked against the gallery: per-head cosine similarities, H-head mean,
ground-truth rank extracted. Runs two device paths and reports the
faster: the flat XLA path (laff_tpu.eval.flat_sim_ranks: one bf16 MXU
matmul at roofline + fused counting over the HBM score block) and the
fused Pallas kernel (laff_tpu.ops.pallas_kernels.fused_sim_rank: score
tiles stay in VMEM — the right shape for galleries too large to
materialize scores, but its per-tile gallery refetch loses to XLA's
matmul pipelining at this gallery size).

Timing methodology: inputs are perturbed per iteration and the ranks are
materialized to host each iteration — async dispatch through the device
tunnel otherwise under-reports wall clock by >10x.

Baseline: the reference ranking algorithm (per-head torch matmuls +
full host np.argsort — model/model.py:1056-1076 + trainer.py:584)
timed on this host. The argsort stage dominates the reference pipeline
on any hardware (it always ran on the host CPU), so this is the honest
apples-to-apples unit; against a 2080Ti doing the matmul part the
speedup would be of the same order.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

T, V, H, D = 59800, 2990, 8, 512


PEAK_BF16 = 197e12  # TPU v5e bf16 peak FLOP/s


def null_rtt(n=6):
    """Fixed dispatch+readback cost of the device tunnel (subtracting it
    isolates device time; a host-attached chip would not pay it)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(fn(x))
    times = []
    for _ in range(n):
        t0 = _t.perf_counter()
        np.asarray(fn(x))
        times.append(_t.perf_counter() - t0)
    return min(times)


def bench_ours():
    import jax.numpy as jnp

    from laff_tpu.eval import flat_sim_ranks
    from laff_tpu.ops.pallas_kernels import fused_sim_rank

    from laff_tpu.ops.norms import l2norm

    rng = np.random.default_rng(0)
    # production state: LAFF attention outputs are unit-norm per head, so
    # the eval pipeline starts from normalized embeddings
    txt = l2norm(jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32)), axis=-1)
    vis = l2norm(jnp.asarray(rng.standard_normal((V, H, D)).astype(np.float32)), axis=-1)
    gt = jnp.asarray(rng.integers(0, V, (T,)).astype(np.int32))
    # uniform per-iteration scaling defeats execution memoization without
    # changing any rank (cosine ranking is scale-invariant); the scale is
    # a jit ARGUMENT so the multiply fuses into the kernel's own bf16 cast
    # instead of paying a separate 0.5 GB read+write pass per iteration
    import jax

    scales = [jnp.float32(1.0 + 1e-6 * i) for i in range(8)]
    jit_flat = jax.jit(
        lambda tx, vn, g, s: flat_sim_ranks(tx * s, vn, g, prenormalized=True)
    )
    jit_pallas = jax.jit(
        lambda tx, vn, g, s: fused_sim_rank(
            tx * s, vn, g, block_t=256, block_v=1024, prenormalized=True
        )
    )

    def run_xla_flat(i):
        # single flat bf16 matmul + fused counting; the (T, V) score block
        # fits in HBM at this gallery scale, and XLA's matmul pipelining
        # runs at the MXU roofline
        return np.asarray(jit_flat(txt, vis, gt, scales[i % 8]))

    def run_pallas(i):
        return np.asarray(jit_pallas(txt, vis, gt, scales[i % 8]))

    best = None
    for name, fn in (("xla_flat_count", run_xla_flat), ("pallas_fused", run_pallas)):
        try:
            fn(0)  # compile
            fn(1)  # settle the tunnel after compile traffic
            n_iter = 5
            times = [0.0] * n_iter
            for i in range(n_iter):
                t0 = time.perf_counter()
                ranks = fn(i + 1)
                times[i] = time.perf_counter() - t0
            assert ranks.shape == (T,)
            dt = min(times)
            qps = T / dt
            if best is None or qps > best[1]:
                best = (name, qps, dt)
        except Exception as e:  # pallas unavailable on this backend etc.
            print(f"# {name} failed: {e}")
    return best


def bench_reference_algorithm(sample_t=8192):
    """Reference ranking path on a text-axis subsample, extrapolated."""
    import torch

    rng = np.random.default_rng(0)
    txt = torch.from_numpy(rng.standard_normal((sample_t, H, D)).astype(np.float32))
    vis = torch.from_numpy(rng.standard_normal((V, H, D)).astype(np.float32))

    def l2n(x):
        return x / (x.pow(2).sum(-1, keepdim=True).sqrt() + 1e-13 + 1e-14)

    t0 = time.perf_counter()
    txt_n, vis_n = l2n(txt), l2n(vis)
    sims = torch.zeros((sample_t, V))
    for h in range(H):  # per-head loop as in get_txt2vis_matrix
        sims += txt_n[:, h, :] @ vis_n[:, h, :].T
    sims /= H
    inds = np.argsort(sims.numpy(), axis=1)  # trainer.py:584
    _ = inds[:, ::-1]
    dt = time.perf_counter() - t0
    return sample_t / dt


def wait_for_backend(max_wait_s: int = 900, probe_timeout_s: int = 120):
    """Wait out transient TPU-backend outages before importing jax here.

    Backend init failure is terminal for a process (jax caches the error),
    so probe in SUBPROCESSES and only proceed once one succeeds. The
    remote axon backend has been observed to go UNAVAILABLE for tens of
    minutes after a client was killed mid-compile; without this, a badly
    timed bench run records a crash instead of a number."""
    import subprocess
    import sys

    code = ("import jax, numpy as np, jax.numpy as jnp; "
            "np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((4,)))); "
            "print('ok')")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=probe_timeout_s)
            if r.returncode == 0 and "ok" in r.stdout:
                return
            err = (r.stderr or r.stdout).strip().splitlines()
            err = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {probe_timeout_s}s"
        if time.time() >= deadline:
            print(f"# backend probe still failing after {max_wait_s}s: {err}",
                  flush=True)
            return  # proceed; the real run will surface the error
        print(f"# backend probe {attempt} failed ({err}); retrying...",
              flush=True)
        time.sleep(60)


def main():
    from laff_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    wait_for_backend()
    name, qps_wall, wall = bench_ours()
    rtt = null_rtt()
    # headline = device-side throughput: the per-CHIP number, independent
    # of this harness's ~32 ms development-tunnel RTT (a host-attached
    # chip in production does not pay it). Floor at 2% of wall in case
    # the workload ever drops below the RTT. Wall numbers stay as fields.
    device_s = max(wall - rtt, 0.02 * wall)
    qps_device = T / device_s
    flops = 2.0 * T * V * H * D  # one flat (T, HD) x (HD, V) contraction
    qps_ref = bench_reference_algorithm()
    print(json.dumps({
        "metric": "mvtest3k_sim_rank_queries_per_sec_per_chip",
        "value": round(qps_device, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps_device / qps_ref, 2),
        "path": name,
        "wall_s": round(wall, 4),
        "wall_queries_per_sec": round(qps_wall, 1),
        "wall_vs_baseline": round(qps_wall / qps_ref, 2),
        "tunnel_rtt_s": round(rtt, 4),
        "device_s": round(device_s, 4),
        "mfu": round(flops / device_s / PEAK_BF16, 4),
    }))


if __name__ == "__main__":
    main()
