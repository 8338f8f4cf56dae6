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
tunnel otherwise under-reports wall clock by >10x. Device time comes
from K-DIFFERENCING (see bench_ours) so tunnel RTT/readback cancel.

OUTAGE-PROOFING: every phase that touches the device (each kernel, the
RTT probe) and the torch reference baseline runs in its OWN subprocess
with a hard timeout, and main() prints exactly ONE parseable JSON line
on EVERY exit path — success, per-kernel failure, or backend-down — so
a TPU outage is a recorded fact ({"error": "backend_unavailable", ...})
instead of an rc=124/null (which is what round 4's driver capture got).

Baseline: the reference ranking algorithm (per-head torch matmuls +
full host np.argsort — model/model.py:1056-1076 + trainer.py:584)
timed on this host. The argsort stage dominates the reference pipeline
on any hardware (it always ran on the host CPU), so this is the honest
apples-to-apples unit; against a 2080Ti doing the matmul part the
speedup would be of the same order.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

T, V, H, D = 59800, 2990, 8, 512

PEAK_BF16 = 197e12  # TPU v5e bf16 peak FLOP/s

K_MANY = 9  # iterations fused into one dispatch for the k-differencing

# Hard per-phase subprocess timeouts (seconds). Total worst case stays
# well under the driver's kill window even with the probe phase maxed.
PROBE_MAX_S = 600  # outages have measured 30-75 min; ride out the tail
KERNEL_TIMEOUT_S = 330
KERNEL_TIMEOUT_DEGRADED_S = 1080  # slow-compile nights: 10-30x compiles
RTT_TIMEOUT_S = 120
REF_TIMEOUT_S = 240


def null_rtt(n=6):
    """Fixed dispatch+readback cost of the device tunnel for the SAME
    output payload as the benchmarked kernel — a trivial jit returning a
    (T,) int32 vector, so wall minus this isolates device compute. On a
    congested tunnel day the readback of even 239 KB costs several ms
    (measured ~35 MB/s vs the usual ~90), which an 8-float null probe
    does not see; a host-attached chip in production pays neither."""
    import time as _t

    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x, s: x + s)
    x = jnp.zeros((T,), jnp.int32)
    np.asarray(fn(x, jnp.int32(0)))
    times = []
    for i in range(n):
        t0 = _t.perf_counter()
        np.asarray(fn(x, jnp.int32(i)))  # perturb: no memoized repeats
        times.append(_t.perf_counter() - t0)
    return min(times)


def measure_kernel(name):
    """Compile + measure ONE ranking kernel; returns a result dict.

    Device time via K-DIFFERENCING: one dispatch runs k ranking passes
    under lax.scan (distinct per-pass scale arguments — cosine ranking
    is scale-invariant, so every pass computes identical ranks without
    XLA being able to CSE them) and returns the summed (T,) ranks.
    device_per_iter = (wall[k=K_MANY] - wall[k=1]) / (K_MANY - 1):
    tunnel RTT + 239 KB readback appear identically in both and cancel
    WITHIN the same congestion regime, unlike subtracting a null-probe
    RTT measured at a different moment (observed drifting 25 -> 50 ms
    between probes on a congested day, which once produced MFU > 1)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from laff_tpu.eval import flat_sim_ranks
    from laff_tpu.ops.norms import l2norm
    from laff_tpu.ops.pallas_kernels import fused_sim_rank

    kernels = {
        # single flat bf16 matmul + fused counting; the (T, V) score
        # block fits in HBM at this scale and XLA's matmul pipelining
        # runs at the MXU roofline
        "xla_flat_count": lambda tx, vn, g: flat_sim_ranks(
            tx, vn, g, prenormalized=True
        ),
        "pallas_fused": lambda tx, vn, g: fused_sim_rank(
            tx, vn, g, block_t=256, block_v=1024, prenormalized=True
        ),
    }
    kernel = kernels[name]

    rng = np.random.default_rng(0)
    # production state: LAFF attention outputs are unit-norm per head, so
    # the eval pipeline starts from normalized embeddings
    txt = l2norm(jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32)), axis=-1)
    vis = l2norm(jnp.asarray(rng.standard_normal((V, H, D)).astype(np.float32)), axis=-1)
    gt = jnp.asarray(rng.integers(0, V, (T,)).astype(np.int32))

    def f(tx, vn, g, scales):
        def body(acc, s):
            return acc + kernel(tx * s, vn, g), None

        acc, _ = lax.scan(body, jnp.zeros((T,), jnp.int32), scales)
        return acc

    fn = jax.jit(f)

    def scales_for(k, i):
        return jnp.float32(1.0) + 1e-6 * jnp.arange(k) + jnp.float32(1e-7 * i)

    walls = {}
    for k in (1, K_MANY):
        np.asarray(fn(txt, vis, gt, scales_for(k, 0)))  # compile
        np.asarray(fn(txt, vis, gt, scales_for(k, 1)))  # settle
    # interleave k=1 / k=K so both see the same tunnel regime
    for rep in range(4):
        for k in (1, K_MANY):
            t0 = time.perf_counter()
            ranks = np.asarray(fn(txt, vis, gt, scales_for(k, 2 + rep)))
            walls.setdefault(k, []).append(time.perf_counter() - t0)
    assert ranks.shape == (T,)
    wall1 = min(walls[1])
    device = (min(walls[K_MANY]) - wall1) / (K_MANY - 1)
    if device <= 0:  # tunnel noise swamped the signal
        device = None
    return {"name": name, "wall_s": wall1, "device_s": device,
            "wall_qps": T / wall1}


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


def wait_for_backend(max_wait_s: int = PROBE_MAX_S, probe_timeout_s: int = 90):
    """Wait out transient TPU-backend outages before touching jax here.

    Backend init failure is terminal for a process (jax caches the error),
    so probe in SUBPROCESSES and only proceed once one succeeds. The
    remote axon backend has been observed to go UNAVAILABLE for tens of
    minutes after a client was killed mid-compile. Returns (ok, degraded):
    ok=False when the wait window expired — the caller records a
    structured outage instead of wedging (round 4's rc=124);
    degraded=True when the backend answered but slowly (a retry was
    needed, or the successful probe took >30 s) — compiles on such
    nights have measured 10-30x the normal latency, so the caller
    switches to one extended-budget kernel attempt instead of two
    normal-budget ones that would both time out (and each mid-compile
    kill deepens the backend's degradation)."""
    code = ("import jax, numpy as np, jax.numpy as jnp; "
            "np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((4,)))); "
            "print('ok')")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=probe_timeout_s)
            if r.returncode == 0 and "ok" in r.stdout:
                probe_s = time.time() - t0
                return True, (attempt > 1 or probe_s > 30)
            err = (r.stderr or r.stdout).strip().splitlines()
            err = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {probe_timeout_s}s"
        if time.time() >= deadline:
            print(f"# backend probe still failing after {max_wait_s}s: {err}",
                  flush=True)
            return False, True
        print(f"# backend probe {attempt} failed ({err}); retrying...",
              flush=True)
        time.sleep(30)


def _run_phase(argv_flag, timeout_s):
    """Run one measurement phase as `python bench.py <flag>` with a hard
    timeout; returns (parsed_json_or_None, error_string_or_None)."""
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), argv_flag],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s}s"
    for line in reversed((r.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                break
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    return None, (tail[-1] if tail else f"rc={r.returncode}")


def _phase_main(flag):
    """Child-process entry: one phase, one JSON line, exit."""
    from laff_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    if flag.startswith("--_kernel="):
        print(json.dumps(measure_kernel(flag.split("=", 1)[1])), flush=True)
    elif flag == "--_rtt":
        print(json.dumps({"rtt_s": null_rtt()}), flush=True)
    elif flag == "--_ref":
        print(json.dumps({"ref_qps": bench_reference_algorithm()}), flush=True)
    else:
        raise SystemExit(f"unknown phase flag {flag}")


_FINAL_PRINTED = False


def _fail(error, detail=None):
    """The guaranteed-parseable failure line (same schema, value null)."""
    global _FINAL_PRINTED
    out = {
        "metric": "mvtest3k_sim_rank_queries_per_sec_per_chip",
        "value": None,
        "unit": "queries/s",
        "vs_baseline": None,
        "error": error,
    }
    if detail:
        out["detail"] = detail
    _FINAL_PRINTED = True
    print(json.dumps(out), flush=True)


def main():
    # Insurance against an external kill (the driver's own timeout): if
    # SIGTERM arrives before the final line is printed, emit the
    # structured-failure line so the capture parses even when this
    # process is ended mid-phase (round 4 recorded rc=124 with NO line).
    import signal

    def _on_term(signum, frame):
        if not _FINAL_PRINTED:
            _fail("killed_externally", f"signal {signum} mid-run")
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    backend_ok, degraded = wait_for_backend()

    # reference baseline is host-torch: measure it regardless (bounded)
    ref, ref_err = _run_phase("--_ref", REF_TIMEOUT_S)
    qps_ref = ref["ref_qps"] if ref else None

    if not backend_ok:
        _fail("backend_unavailable",
              f"probe window {PROBE_MAX_S}s expired; ref_qps={qps_ref}")
        return

    # The flat kernel holds the headline at this gallery size, so it
    # always gets the extended budget — a generous timeout costs nothing
    # on a normal night (compile+measure ~2 min) and survives the
    # slow-compile regime (observed 10-30x compile latency with a FAST
    # trivial-op probe, so backend health cannot be inferred up front).
    # The pallas kernel is a secondary data point: it only runs when the
    # flat phase was quick, because a second long compile after a slow
    # first one risks eating the capture window, and a timeout kill
    # mid-compile deepens the backend's degradation (verify-skill
    # round-3 addendum).
    results, errors = [], {}
    t0 = time.time()
    res, err = _run_phase("--_kernel=xla_flat_count",
                          KERNEL_TIMEOUT_DEGRADED_S)
    flat_s = time.time() - t0
    if res:
        results.append(res)
    else:
        errors["xla_flat_count"] = err
        print(f"# kernel xla_flat_count failed: {err}", flush=True)
    if res and flat_s < 200 and not degraded:
        res2, err2 = _run_phase("--_kernel=pallas_fused", KERNEL_TIMEOUT_S)
        if res2:
            results.append(res2)
        else:
            errors["pallas_fused"] = err2
            print(f"# kernel pallas_fused failed: {err2}", flush=True)
    elif res:
        errors["pallas_fused"] = (
            f"skipped: flat phase took {flat_s:.0f}s or backend degraded")
    else:
        errors["pallas_fused"] = "skipped: cascade guard after flat failure"

    if not results:
        _fail("all_kernels_failed", errors)
        return

    rtt_res, _ = _run_phase("--_rtt", RTT_TIMEOUT_S)
    rtt = rtt_res["rtt_s"] if rtt_res else 0.0

    best = max(results, key=lambda r: r["wall_qps"])
    wall = best["wall_s"]
    # headline = device-side throughput: the per-CHIP number, independent
    # of this harness's development-tunnel RTT (a host-attached chip in
    # production does not pay it). Primary estimate is the k-differenced
    # per-iteration device time (RTT/readback cancel); if tunnel noise
    # swamped the difference, fall back to wall minus the payload-matched
    # null probe, floored at 2% of wall. Wall numbers stay as fields.
    if best["device_s"] is not None:
        device_s = best["device_s"]
    else:
        device_s = max(wall - rtt, 0.02 * wall)
    qps_device = T / device_s
    flops = 2.0 * T * V * H * D  # one flat (T, HD) x (HD, V) contraction
    out = {
        "metric": "mvtest3k_sim_rank_queries_per_sec_per_chip",
        "value": round(qps_device, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps_device / qps_ref, 2) if qps_ref else None,
        "path": best["name"],
        "wall_s": round(wall, 4),
        "wall_queries_per_sec": round(best["wall_qps"], 1),
        "wall_vs_baseline": round(best["wall_qps"] / qps_ref, 2) if qps_ref else None,
        "tunnel_rtt_s": round(rtt, 4),
        "device_s": round(device_s, 4),
        "mfu": round(flops / device_s / PEAK_BF16, 4),
    }
    if errors:
        out["kernel_errors"] = errors
    if ref_err:
        out["ref_error"] = ref_err
    if degraded:
        out["degraded_backend"] = True
    global _FINAL_PRINTED
    _FINAL_PRINTED = True
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1].startswith("--_"):
        _phase_main(sys.argv[1])
    else:
        main()
