"""Decision benchmark for VERDICT r2 item 4: Pallas fused_gate_attention
vs the flax MultiHeadGateAttention (XLA-fused) at flagship dims.

The LAFF gate is a tiny bandwidth-bound op (B*L*H*dh elements, ~4M f32 at
eval dims); the question is whether a hand-fused VMEM pass beats XLA's
fusion inside a jitted step. Device time is measured by scanning R gate
applications inside ONE dispatch (the tunnel adds ~32.5 ms fixed RTT per
dispatch and does not pipeline), perturbing the carry each step so the
stack cannot elide repeats, and reducing the output to a scalar so
readback is 4 bytes.

Run: python shell/bench_gate.py           (real TPU)
     JAX_PLATFORMS=cpu python shell/bench_gate.py --cpu   (smoke)
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    np.asarray(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters


def null_rtt():
    f = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    return timed(f, z, iters=16)


def scan_wrap(gate_fn, repeats):
    @jax.jit
    def run(x, *params):
        def body(c, _):
            c = c * (1 + 1e-6)
            return c, jnp.sum(gate_fn(c, *params))

        _, s = jax.lax.scan(body, x, None, length=repeats)
        return jnp.sum(s)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dh", type=int, default=512)
    ap.add_argument("--L", type=int, default=4)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from laff_tpu.models.attention import MultiHeadGateAttention
    from laff_tpu.ops.pallas_kernels import fused_gate_attention

    rtt = null_rtt()
    print(f"null dispatch RTT: {rtt*1e3:.2f} ms")

    h, dh, L = args.heads, args.dh, args.L
    dim = h * dh
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(0, 0.02, (h, dh)).astype(np.float32))
    bias = jnp.zeros((h,), jnp.float32)

    mod = MultiHeadGateAttention(heads=h, with_ave=True, mul=False)
    variables = {
        "params": {"gate_kernel": kernel, "gate_bias": bias},
        "schedule": {"global_emb_weight": jnp.ones(())},
    }

    def flax_gate(x4, kernel, bias):
        # same (B, L, H, dh) input as the pallas kernel
        b = x4.shape[0]
        return mod.apply(variables, x4.reshape(b, L, dim))

    def pallas_gate(x4, kernel, bias):
        return fused_gate_attention(x4, kernel, bias, 1.0,
                                    with_ave=True, mul=False)

    R = args.repeats
    # CPU runs the pallas kernel in interpret mode (pure-python slow) —
    # smoke only the small batch there
    batches = (128,) if args.cpu else (128, 2048, 8192)
    for batch in batches:
        x = jnp.asarray(rng.normal(size=(batch, L, h, dh)).astype(np.float32))
        row = {}
        for name, fn in (("flax_xla", flax_gate), ("pallas", pallas_gate)):
            run = scan_wrap(fn, R)
            try:
                wall = timed(run, x, kernel, bias)
                row[name] = max(wall - rtt, 0.0) / R * 1e6
                print(f"B={batch:5d} L={L} H={h} dh={dh} {name:9s}: "
                      f"{row[name]:8.1f} us/app", flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"B={batch:5d} L={L} H={h} dh={dh} {name:9s}: "
                      f"FAILED ({type(e).__name__}: {msg})", flush=True)
        if "flax_xla" in row and "pallas" in row:
            print(f"B={batch:5d} pallas/xla = "
                  f"{row['pallas'] / max(row['flax_xla'], 1e-9):.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
