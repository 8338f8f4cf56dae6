"""Persistent XLA compile cache (``laff_tpu.utils.misc.enable_compile_cache``).

The reference sweep layer (``/root/reference/shell/retrieval_task.sh:118-155``)
launches many short single-purpose processes; the cache makes every process
after the first skip XLA compilation for byte-identical programs.
"""

import os
import subprocess
import sys

_CHILD = """
import os, jax, jax.numpy as jnp
from laff_tpu.utils.misc import enable_compile_cache
d = enable_compile_cache()
assert (d == os.environ["LAFF_TPU_COMPILE_CACHE"]) == (not os.environ.get("EXPECT_OFF")), d
f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
print(float(f(jnp.ones((64, 64)))))
"""


def _run(tmp_path, off=False):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LAFF_TPU_COMPILE_CACHE="off" if off else str(tmp_path))
    if off:
        env["EXPECT_OFF"] = "1"
    # generous bound: under a full-suite run the machine is CPU-saturated
    # and a bare jax import in the child can take minutes
    r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]


def test_cache_persists_across_processes(tmp_path):
    cache = tmp_path / "xla"
    cache.mkdir()
    _run(cache)
    entries = os.listdir(cache)
    assert entries, "first process wrote no cache entries"
    _run(cache)  # second process must load (and not corrupt) the cache
    assert set(os.listdir(cache)) >= set(entries)


def test_cache_disable_flag(tmp_path):
    _run(tmp_path, off=True)
    assert not os.listdir(tmp_path)


def test_idempotent_in_process(tmp_path, monkeypatch):
    from laff_tpu.utils import misc

    monkeypatch.setattr(misc, "_COMPILE_CACHE_DIR", None)
    monkeypatch.setenv("LAFF_TPU_COMPILE_CACHE", str(tmp_path))
    assert misc.enable_compile_cache() == str(tmp_path)
    # second call is a no-op that must not re-configure — and must still
    # report the directory actually in use (ADVICE r3)
    assert misc.enable_compile_cache() == str(tmp_path)
    monkeypatch.setenv("LAFF_TPU_COMPILE_CACHE", "0")
    monkeypatch.setattr(misc, "_COMPILE_CACHE_DIR", None)
    assert misc.enable_compile_cache() is None


def test_axon_tunnel_default_off(tmp_path, monkeypatch):
    """Remote-compile tunnels must not enable the cache implicitly (loading
    large persisted executables through the tunnel can cost more than the
    compile); an explicit env opt-in overrides the gate."""
    from laff_tpu.utils import misc

    monkeypatch.setattr(misc, "_COMPILE_CACHE_DIR", None)
    monkeypatch.delenv("LAFF_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert misc.enable_compile_cache() is None
    monkeypatch.setenv("LAFF_TPU_COMPILE_CACHE", str(tmp_path))
    assert misc.enable_compile_cache() == str(tmp_path)
