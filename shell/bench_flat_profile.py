#!/usr/bin/env python3
"""Decompose the MV-test3k flat ranking path on the real chip.

Times (wall minus null-RTT, min over iters, per-iteration input
perturbation + host materialization — see bench.py methodology):
  matmul+sum   : bf16 cast + flat matmul + full score reduction
  flat_ranks   : the production flat_sim_ranks (matmul + fused counting)
  block_ranks  : blockwise_flat_ranks at several block_t (transient scores)
  pallas       : tiled fused_sim_rank (VMEM scores)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=59800)
    ap.add_argument("--v", type=int, default=2990)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from laff_tpu.eval.metrics import blockwise_flat_ranks, flat_sim_ranks
    from laff_tpu.ops.norms import l2norm
    from laff_tpu.ops.pallas_kernels import fused_sim_rank

    T, V, H, D = args.t, args.v, args.h, args.d
    rng = np.random.default_rng(0)
    txt = l2norm(jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32)), axis=-1)
    vis = l2norm(jnp.asarray(rng.standard_normal((V, H, D)).astype(np.float32)), axis=-1)
    gt = jnp.asarray(rng.integers(0, V, (T,)).astype(np.int32))
    scales = [jnp.float32(1.0 + 1e-6 * i) for i in range(16)]

    fn0 = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(fn0(z))
    rtt = min(
        (lambda t0: (np.asarray(fn0(z)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(6)
    )

    @jax.jit
    def matmul_sum(tx, vn):
        tn = tx.reshape(tx.shape[0], -1).astype(jnp.bfloat16)
        vb = vn.reshape(vn.shape[0], -1).astype(jnp.bfloat16)
        s = jnp.dot(vb, tn.T, preferred_element_type=jnp.float32)
        return jnp.sum(s)

    def bench(name, fn):
        try:
            fn(0)
            fn(1)
            times = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                fn(i + 2)
                times.append(time.perf_counter() - t0)
            dev = max(min(times) - rtt, 0.0)
            print(json.dumps({"case": name, "wall_s": round(min(times), 5),
                              "device_s": round(dev, 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:300]}), flush=True)

    bench("matmul_sum", lambda i: np.asarray(matmul_sum(txt * scales[i % 16], vis)))
    bench("flat_ranks", lambda i: np.asarray(
        flat_sim_ranks(txt * scales[i % 16], vis, gt, prenormalized=True)))
    for bt in (1150, 2990, 5980):
        if T % bt == 0:
            bench(f"block_ranks_bt{bt}", lambda i, bt=bt: np.asarray(
                blockwise_flat_ranks(txt * scales[i % 16], vis, gt,
                                     block_t=bt, prenormalized=True)))
    bench("pallas_256x1024", lambda i: np.asarray(
        fused_sim_rank(txt * scales[i % 16], vis, gt, block_t=256,
                       block_v=1024, prenormalized=True)))
    print(json.dumps({"rtt_s": round(rtt, 5)}))


if __name__ == "__main__":
    main()
