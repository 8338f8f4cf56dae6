"""At-scale int8 ranking bench: AVS top-1000 over a 1M-shot gallery.

Compares three paths on the real chip (T=128 queries, V=2^20 shots,
D=4096 flat dims, k=1000):

  exact    — bf16 gallery (8 GB HBM): dense scores + lax.top_k
  int8     — int8 gallery (4 GB HBM, 2x capacity): approximate scores
             + top_k (serving mode; score error ~1e-2 of cosine scale)
  rescored — int8 nomination + exact re-score of (k+margin) candidates
             against the bf16 rows (needs both galleries resident)

Memory discipline (see verify skill): the gallery is generated AND
quantized blockwise inside jits — never an eager elementwise op over a
multi-GB array — and big arrays are always jit ARGUMENTS.

Run: python shell/bench_int8_topk.py [--v 1048576]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=1 << 20)
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None,
                    help="write a machine-readable artifact here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from laff_tpu.ops.quantized import int8_scores, quantize_rows

    T, V, D, K = args.t, args.v, args.d, args.k
    K = min(K, V)
    BLK = min(1 << 16, V)
    if V % BLK:
        # the fori_loop fills V // BLK full blocks; a ragged tail would
        # silently stay zero and corrupt every timing/overlap stat
        ap.error(f"--v {V} must be a multiple of {BLK} "
                 f"(or <= {1 << 16} to build in one block)")

    @jax.jit
    def build_gallery(key):
        """(V, D) bf16 + its int8 quantization, built block by block."""
        vis = jnp.zeros((V, D), jnp.bfloat16)
        q = jnp.zeros((V, D), jnp.int8)
        s = jnp.zeros((V,), jnp.float32)

        def body(i, c):
            vis, q, s = c
            blk = jax.random.normal(jax.random.fold_in(key, i), (BLK, D),
                                    jnp.bfloat16)
            bq, bs = quantize_rows(blk.astype(jnp.float32))
            vis = jax.lax.dynamic_update_slice_in_dim(vis, blk, i * BLK, 0)
            q = jax.lax.dynamic_update_slice_in_dim(q, bq, i * BLK, 0)
            s = jax.lax.dynamic_update_slice_in_dim(s, bs, i * BLK, 0)
            return vis, q, s

        return jax.lax.fori_loop(0, V // BLK, body, (vis, q, s))

    print(f"building gallery V={V} D={D} (bf16 {V*D*2/2**30:.1f} GB + "
          f"int8 {V*D/2**30:.1f} GB) ...", flush=True)
    vis, vq, vs = build_gallery(jax.random.key(0))
    jax.block_until_ready(vs)

    rng = np.random.default_rng(1)
    txt = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    tq, ts = quantize_rows(txt)
    txt_bf = txt.astype(jnp.bfloat16)

    dn = (((1,), (1,)), ((), ()))

    @jax.jit
    def exact_topk(txt_bf, vis):
        s = jax.lax.dot_general(txt_bf, vis, dn,
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)

    @jax.jit
    def int8_only(tq, ts, vq, vs):
        return jax.lax.top_k(int8_scores(tq, ts, vq, vs), K)

    C = min(K + K // 2, V)

    @jax.jit
    def rescored(tq, ts, vq, vs, txt_bf, vis):
        _, cand = jax.lax.top_k(int8_scores(tq, ts, vq, vs), C)

        # chunk the candidate gather + exact einsum over queries: XLA
        # materializes an f32 copy of the gathered (chunk, C, D) block,
        # so a full-T gather at the 1M design point overflows HBM
        def chunk(c):
            rows, tx = c
            gathered = vis[rows]  # (CH, C, D) bf16
            exact = jnp.einsum("td,tcd->tc", tx, gathered,
                               preferred_element_type=jnp.float32)
            vals, pos = jax.lax.top_k(exact, K)
            return vals, jnp.take_along_axis(rows, pos, axis=1)

        ch = 32 if T % 32 == 0 else T
        vals, idx = jax.lax.map(
            chunk, (cand.reshape(-1, ch, C), txt_bf.reshape(-1, ch, D))
        )
        return vals.reshape(T, K), idx.reshape(T, K)

    results = {}
    for name, fn, fargs in (
        ("exact_bf16", exact_topk, (txt_bf, vis)),
        ("int8_only", int8_only, (tq, ts, vq, vs)),
        ("int8_rescored", rescored, (tq, ts, vq, vs, txt_bf, vis)),
    ):
        out = fn(*fargs)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*fargs)
            jax.block_until_ready(out)
            np.asarray(out[0][:1])  # force a host materialization
            times.append(time.perf_counter() - t0)
        results[name] = (min(times), np.asarray(out[0]), np.asarray(out[1]))
        print(f"{name:14s}: {min(times)*1e3:8.1f} ms "
              f"({T/min(times):.0f} q/s)", flush=True)

    ev, ei = results["exact_bf16"][1:]
    rv, ri = results["int8_rescored"][1:]
    overlap = np.mean([
        len(set(ei[q]) & set(ri[q])) / K for q in range(T)
    ])
    max_err = np.max(np.abs(results["int8_only"][1] - ev))
    print(f"rescored top-{K} overlap with exact: {overlap:.4f}", flush=True)
    print(f"int8-only max |score - exact| over top-{K}: {max_err:.4f} "
          f"({max_err / np.std(ev):.3f} of top-score std)", flush=True)

    if args.json:
        import json

        artifact = {
            "workload": f"AVS top-{K} over {V}-shot gallery, T={T}, D={D}",
            "hbm_bytes": {"bf16_gallery": V * D * 2, "int8_gallery": V * D},
            "paths": {
                name: {"best_s": round(results[name][0], 4),
                       "queries_per_sec": round(T / results[name][0], 1)}
                for name in results
            },
            "rescored_topk_overlap_with_exact": round(float(overlap), 4),
            "int8_only_max_abs_score_err": round(float(max_err), 4),
        }
        with open(args.json, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
