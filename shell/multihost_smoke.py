"""Simulated multi-host (DCN) smoke: 2 CPU processes x 2 virtual devices.

The real deployment for v3c1-scale galleries is a pod slice where
``jax.devices()`` spans hosts and the same shard_map programs run with
XLA routing in-slice collectives over ICI and cross-slice ones over DCN
(Gloo here on CPU). This driver verifies that path end-to-end without
TPU pod hardware (VERDICT r2 item 9):

* ``laff_tpu.parallel.initialize_multihost`` joins the run,
* ``data_parallel_mesh`` spans all four global devices,
* ``sharded_t2v_ranks`` / ``sharded_topk`` run over a gallery that does
  NOT divide the dp axis (43 rows over 4 devices) and match a
  single-process numpy oracle bit-for-bit on the rank integers,
* a dp-sharded gradient psum (the train-step collective) agrees with the
  host gradient.

Run: python shell/multihost_smoke.py            (spawns the 2 workers)
     python shell/multihost_smoke.py --worker <pid> <port>   (internal)
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS env; config wins
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from laff_tpu.parallel import data_parallel_mesh, initialize_multihost

    n = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert n == 2, f"expected 2 processes, got {n}"
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from laff_tpu.ops.pallas_kernels import flatten_heads
    from laff_tpu.parallel.sim_engine import sharded_t2v_ranks, sharded_topk

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(0)  # identical data on both processes
    n_txt, n_vis, heads, dim = 16, 43, 4, 16  # 43 % 4 != 0
    txt = rng.standard_normal((n_txt, heads, dim)).astype(np.float32)
    vis = rng.standard_normal((n_vis, heads, dim)).astype(np.float32)
    gt = rng.integers(0, n_vis, (n_txt,)).astype(np.int32)

    ranks = sharded_t2v_ranks(
        jnp.asarray(txt), jnp.asarray(vis), jnp.asarray(gt), mesh
    )
    vals, idx = sharded_topk(jnp.asarray(txt), jnp.asarray(vis), 7, mesh)

    # single-process numpy oracle (same rank semantics)
    tn = np.asarray(flatten_heads(jnp.asarray(txt)))
    vn = np.asarray(flatten_heads(jnp.asarray(vis)))
    scores = tn @ vn.T  # raw flat dot, the sharded engine's score scale
    gt_s = scores[np.arange(n_txt), gt]
    cols = np.arange(n_vis)
    expect = 1 + (scores > gt_s[:, None]).sum(1) + (
        (scores == gt_s[:, None]) & (cols[None, :] > gt[:, None])
    ).sum(1)
    assert np.array_equal(ranks, expect), (ranks, expect)
    order = np.argsort(-scores, axis=1)[:, :7]
    np.testing.assert_allclose(
        vals, np.take_along_axis(scores, order, axis=1), rtol=1e-5, atol=1e-6
    )

    # train-step collective: dp-sharded batch, grad psum via GSPMD
    from jax.sharding import NamedSharding, PartitionSpec as P

    w = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32))
    x = rng.standard_normal((8, dim)).astype(np.float32)

    def loss(w, x):
        return jnp.mean(jnp.sum(x * w[None, :], axis=1) ** 2)

    gfn = jax.jit(jax.grad(loss), in_shardings=(
        NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    ))
    from laff_tpu.parallel import shard_batch

    local = x[pid * 4:(pid + 1) * 4]  # this host's slice of the batch
    xg = shard_batch({"x": local}, mesh)["x"]
    g = np.asarray(gfn(w, xg))
    np.testing.assert_allclose(
        g, np.asarray(jax.grad(loss)(w, jnp.asarray(x))), rtol=1e-5, atol=1e-6
    )

    # live-serving scorers (traced row count, gallery rows sharded over
    # the 4 global devices spanning both hosts): must match the host
    # oracle's top-k set with the tail masked
    from laff_tpu.engine.service import _make_sharded_scorers

    bf16_topk, _ = _make_sharded_scorers(mesh)
    cap = 44  # capacity padded to the mesh; live count stays 43
    vn_pad = np.zeros((cap, vn.shape[1]), np.float32)
    vn_pad[:n_vis] = vn
    svals, sidx = bf16_topk(
        jnp.asarray(tn).astype(jnp.bfloat16),
        shard_batch(jnp.asarray(vn_pad).astype(jnp.bfloat16), mesh),
        jnp.int32(n_vis), 7, heads)
    bf_scores = (tn.astype(np.float32) @ vn.T.astype(np.float32)) / heads
    # bf16 rounding: compare the top-k SETS per query at bf16 tolerance
    sidx = np.asarray(sidx)
    for q in range(n_txt):
        want = set(np.argsort(-bf_scores[q])[:7].tolist())
        got = set(sidx[q].tolist())
        assert len(got & want) >= 6, (q, got, want)  # 1 bf16 tie swap ok
        assert all(j < n_vis for j in got)  # masked tail never nominated
    print(f"MULTIHOST-OK proc={pid} ranks_head={ranks[:4].tolist()}", flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return 0

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=180)
        if p.returncode != 0 or f"MULTIHOST-OK proc={i}" not in out:
            ok = False
            print(f"--- worker {i} rc={p.returncode} ---\n{out}")
        else:
            print(out.strip().splitlines()[-1])
    print("multihost smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
