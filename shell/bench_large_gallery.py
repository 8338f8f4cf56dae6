#!/usr/bin/env python3
"""Large-gallery (AVS / v3c1-regime) ranking benchmark on the real chip.

The reference switches to ``predict_batch`` above 5e4 gallery items
(model/model.py:1081-1128: per-block torch matmuls + host argsort). This
benchmark measures our device paths at that design point (default
V=1,048,576 ~ v3c1's shot count, HD=4096 = 8 heads x 512):

  rank_pallas   -- fused_sim_rank tiled kernel (scores stay in VMEM; HBM
                   traffic = text tiles x one gallery refetch per tile)
  rank_xla      -- blockwise_flat_ranks (lax.map over text blocks; each
                   block's (bt, V) f32 scores round-trip HBM)
  topk_direct   -- one lax.top_k(k) across the full gallery axis (the
                   AVS top-1000 dump)
  topk_twostage -- hierarchical per-block top-k + merge

Each invocation runs ONE config and prints one JSON line (big-block
Mosaic compiles can hang the remote-compile helper, so configs must be
isolated per process and bounded by an external timeout). ``--sweep``
re-execs the config matrix with per-config timeouts and writes the
aggregated artifact (default BENCH_LARGE_r02.json).

Timing: inputs are perturbed per iteration and outputs materialized to
host (async dispatch through the device tunnel under-reports >10x
otherwise); device time = wall minus the measured null-dispatch RTT.
MFU against TPU v5e bf16 peak (197 TFLOP/s); HBM bandwidth 819 GB/s.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # TPU v5e
PEAK_HBM = 819e9


def _null_rtt(n=6):
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(fn(x))  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def _make_data(t, v, hd, seed=0):
    """Synthetic pre-normalized-style embeddings, created on device in
    bf16 (an f32 (V, HD) intermediate would not fit HBM at 1M x 4096)."""
    import jax
    import jax.numpy as jnp

    kt, kv = jax.random.split(jax.random.key(seed))
    # no eager post-ops on the gallery: ANY elementwise op on the 8.6 GB
    # array transiently holds input+output (17 GB) and wedges the backend.
    # Ranking is scale-invariant, so unscaled N(0,1) values are fine.
    txt = jax.random.normal(kt, (t, hd), jnp.bfloat16)
    vis = jax.random.normal(kv, (v, hd), jnp.bfloat16)
    assert vis.dtype == jnp.bfloat16
    gt = jnp.asarray(
        np.random.default_rng(seed).integers(0, v, (t,)).astype(np.int32)
    )
    return txt, vis, gt


def _time_fn(fn, iters):
    import jax.numpy as jnp

    scales = [jnp.bfloat16(1.0 + 2 ** -7 * i) for i in range(iters + 2)]
    fn(scales[0])  # compile
    fn(scales[1])  # settle tunnel
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(scales[i + 2])
        times.append(time.perf_counter() - t0)
    return min(times), out


def run_config(args):
    import jax

    from laff_tpu.eval import blockwise_flat_ranks, topk_two_stage
    from laff_tpu.ops.pallas_kernels import fused_sim_rank

    t, v, hd = args.t, args.v, args.hd
    txt, vis, gt = _make_data(t, v, hd)
    rtt = _null_rtt()
    flops = 2.0 * t * v * hd

    if args.mode == "rank_pallas":
        # gallery refetched once per text tile + text read once
        hbm_bytes = (t / args.block_t) * v * hd * 2 + t * hd * 2

        def fn(s):
            return np.asarray(fused_sim_rank(
                txt * s, vis, gt, block_t=args.block_t, block_v=args.block_v,
                prenormalized=True, vmem_budget=args.vmem_mb * 1024 * 1024,
            ))
    elif args.mode == "rank_xla":
        # gallery refetch per block + (bt, V) f32 scores written + read back
        hbm_bytes = (t / args.block_t) * v * hd * 2 + 2 * t * v * 4 + t * hd * 2

        def fn(s):
            return np.asarray(blockwise_flat_ranks(
                txt * s, vis, gt, block_t=args.block_t, prenormalized=True,
            ))
    elif args.mode in ("topk_direct", "topk_twostage", "topk_wide"):
        import jax.numpy as jnp

        from laff_tpu.eval import topk_wide

        k = args.k
        hbm_bytes = v * hd * 2 + 2 * t * v * 4

        # the gallery MUST be an argument, never a closure: a closed-over
        # 8.6 GB array lowers as compile-time constants shipped through
        # the remote-compile path (hangs it for good)
        @jax.jit
        def scores_fn(tx, vs):
            # contract dim 1 of both (== tx @ vs.T): an explicit .T on the
            # gallery can materialize a transposed copy
            return jax.lax.dot_general(
                tx, vs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if args.mode == "topk_direct":
            @jax.jit
            def _topk(tx, vs):
                return jax.lax.top_k(scores_fn(tx, vs), k)
        elif args.mode == "topk_twostage":
            @jax.jit
            def _topk(tx, vs):
                return topk_two_stage(scores_fn(tx, vs), k,
                                      block_v=args.block_v)
        else:
            # verified approx_max_k sweep + exact refine
            def _topk(tx, vs):
                return topk_wide(scores_fn(tx, vs), k)

        def fn(s):
            vals, idx = _topk(txt * s, vis)
            return np.asarray(vals), np.asarray(idx)
    else:
        raise ValueError(args.mode)

    wall, _ = _time_fn(fn, args.iters)
    # floor at 2% of wall: sub-RTT workloads are tunnel-dominated and a
    # near-zero subtraction would print absurd qps/MFU
    device = max(wall - rtt, 0.02 * wall)
    print(json.dumps({
        "mode": args.mode, "t": t, "v": v, "hd": hd,
        "block_t": args.block_t, "block_v": args.block_v, "k": args.k,
        "wall_s": round(wall, 4), "rtt_s": round(rtt, 4),
        "device_s": round(device, 4),
        "qps_wall": round(t / wall, 1), "qps_device": round(t / device, 1),
        "gflops": round(flops / 1e9, 1),
        "mfu": round(flops / device / PEAK_BF16, 4),
        "hbm_gb": round(hbm_bytes / 1e9, 2),
        "hbm_util": round(hbm_bytes / device / PEAK_HBM, 4),
    }))


SWEEP = [
    # mode, block_t, block_v, vmem_mb, timeout_s
    ("rank_xla", 128, 0, 0, 900),
    ("rank_xla", 256, 0, 0, 900),
    ("rank_xla", 512, 0, 0, 900),
    ("rank_pallas", 256, 1024, 48, 900),
    ("rank_pallas", 512, 2048, 64, 900),
    ("rank_pallas", 1024, 2048, 96, 900),
    ("rank_pallas", 2048, 1024, 96, 900),
    # top-k: plain lax.top_k wins at this scale (the round-2 "compile
    # hang" was a closed-over 8.6 GB gallery lowering as constants);
    # topk_wide (verified approx_max_k) is the even-wider-gallery option
    ("topk_direct", 0, 0, 0, 900),
    ("topk_wide", 0, 0, 0, 900),
]


def run_sweep(args):
    results = []
    timed_out = False
    for mode, bt, bv, vmem, tmo in SWEEP:
        tmo = int(tmo * args.timeout_scale)
        if timed_out:
            # A timeout kill mid-compile wedges the remote-compile helper
            # and every further kill deepens the outage (round-3 lesson:
            # two kills took the backend down for >1 h). Record the rest
            # as skipped rather than probing a wounded backend.
            results.append({"mode": mode, "block_t": bt, "block_v": bv,
                            "skipped": "earlier config timed out; sweep "
                                       "aborted to protect the backend"})
            continue
        cmd = [sys.executable, os.path.abspath(__file__), "--mode", mode,
               "--t", str(args.t if mode.startswith("rank") else args.topk_t),
               "--v", str(args.v), "--hd", str(args.hd),
               "--iters", str(args.iters), "--k", str(args.k)]
        if bt:
            cmd += ["--block_t", str(bt)]
        if bv:
            cmd += ["--block_v", str(bv)]
        if vmem:
            cmd += ["--vmem_mb", str(vmem)]
        print(f"# running {' '.join(cmd[2:])}", file=sys.stderr)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=tmo)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if line:
                results.append(json.loads(line[-1]))
            else:
                results.append({"mode": mode, "block_t": bt, "block_v": bv,
                                "error": (out.stderr or "no output")[-400:]})
        except subprocess.TimeoutExpired:
            results.append({"mode": mode, "block_t": bt, "block_v": bv,
                            "error": f"timeout {tmo}s (compile hang?)"})
            timed_out = True
        print(f"# -> {json.dumps(results[-1])}", file=sys.stderr)

    ranked = [r for r in results if "qps_device" in r
              and r["mode"].startswith("rank")]
    winner = max(ranked, key=lambda r: r["qps_device"]) if ranked else None
    blob = {
        "workload": {"t": args.t, "v": args.v, "hd": args.hd,
                     "topk_t": args.topk_t, "k": args.k},
        "peak_bf16_flops": PEAK_BF16, "peak_hbm_bps": PEAK_HBM,
        "results": results,
        "winner_rank": winner,
    }
    with open(args.out, "w") as fh:
        json.dump(blob, fh, indent=1)
    print(json.dumps({"winner": winner, "out": args.out}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="sweep")
    p.add_argument("--t", type=int, default=8192)
    p.add_argument("--topk_t", type=int, default=128)  # ~4 AVS editions
    p.add_argument("--v", type=int, default=1048576)
    p.add_argument("--hd", type=int, default=4096)
    p.add_argument("--k", type=int, default=1000)
    p.add_argument("--block_t", type=int, default=256)
    p.add_argument("--block_v", type=int, default=1024)
    p.add_argument("--vmem_mb", type=int, default=48)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--timeout_scale", type=float, default=1.0,
                   help="multiply per-config timeouts (slow-backend days: "
                        "a timeout kill mid-init can wedge the backend, so "
                        "budget >=2x the worst init+compile observed)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_LARGE_{os.environ.get('LAFF_TPU_BENCH_ROUND', 'r04')}.json"))
    args = p.parse_args()
    if args.mode == "sweep":
        run_sweep(args)
    else:
        run_config(args)


if __name__ == "__main__":
    main()
