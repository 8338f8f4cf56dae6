"""int8 quantized ranking: roundtrip accuracy, rescored exactness, and
candidate recall vs the dense full-precision top-k."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from laff_tpu.ops.pallas_kernels import flatten_heads
from laff_tpu.ops.quantized import int8_scores, int8_topk, quantize_rows


@pytest.fixture
def embs():
    rng = np.random.default_rng(0)
    txt = rng.standard_normal((96, 4, 32)).astype(np.float32)
    vis = rng.standard_normal((1500, 4, 32)).astype(np.float32)
    tn = np.asarray(flatten_heads(jnp.asarray(txt)))
    vn = np.asarray(flatten_heads(jnp.asarray(vis)))
    return jnp.asarray(tn), jnp.asarray(vn)


def test_quantize_roundtrip(embs):
    tn, _ = embs
    q, scale = quantize_rows(tn)
    assert q.dtype == jnp.int8 and scale.shape == (tn.shape[0],)
    deq = np.asarray(q, np.float32) * np.asarray(scale)[:, None]
    # elementwise error <= scale/2 = absmax/254
    bound = np.asarray(jnp.max(jnp.abs(tn), axis=-1)).max() / 254 + 1e-7
    np.testing.assert_allclose(deq, np.asarray(tn), atol=bound)


def test_int8_scores_close_to_exact(embs):
    tn, vn = embs
    tq, ts = quantize_rows(tn)
    vq, vs = quantize_rows(vn)
    approx = np.asarray(int8_scores(tq, ts, vq, vs))
    exact = np.asarray(tn) @ np.asarray(vn).T
    np.testing.assert_allclose(approx, exact, atol=2e-2)


def test_int8_topk_rescored_is_exact(embs):
    tn, vn = embs
    tq, ts = quantize_rows(tn)
    vq, vs = quantize_rows(vn)
    k = 20
    vals, idx = int8_topk(tq, ts, vq, vs, k, rescore_embs=(tn, vn))
    exact = np.asarray(tn) @ np.asarray(vn).T
    # every returned score is the bit-exact full-precision score of its item
    picked = np.take_along_axis(exact, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(vals), picked, rtol=1e-6, atol=1e-7)
    # and the returned set recovers the true top-k (default margin)
    evals, _ = jax.lax.top_k(jnp.asarray(exact), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(evals),
                               rtol=1e-6, atol=1e-6)


def test_int8_candidate_recall(embs):
    """int8-only nomination: measure recall of the exact top-k inside the
    (k + margin) candidate cut — the guarantee the rescored path rests on."""
    tn, vn = embs
    tq, ts = quantize_rows(tn)
    vq, vs = quantize_rows(vn)
    k, margin = 50, 25
    _, cand = int8_topk(tq, ts, vq, vs, k + margin)
    exact = np.asarray(tn) @ np.asarray(vn).T
    _, true_idx = jax.lax.top_k(jnp.asarray(exact), k)
    cand_sets = [set(row) for row in np.asarray(cand)]
    hits = sum(
        len(set(row) & cand_sets[q])
        for q, row in enumerate(np.asarray(true_idx))
    )
    recall = hits / (tn.shape[0] * k)
    assert recall == 1.0, f"candidate recall {recall:.4f} < 1"


def test_int8_topk_approx_only(embs):
    tn, vn = embs
    tq, ts = quantize_rows(tn)
    vq, vs = quantize_rows(vn)
    vals, idx = int8_topk(tq, ts, vq, vs, 10)
    assert vals.shape == (tn.shape[0], 10) and idx.shape == vals.shape
    v = np.asarray(vals)
    assert (np.diff(v, axis=1) <= 1e-6).all()  # descending
