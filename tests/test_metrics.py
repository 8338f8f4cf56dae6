"""Metric parity tests: synthetic label matrices + device-rank equivalence."""

import jax.numpy as jnp
import numpy as np

from laff_tpu.eval import (
    eval_label_matrix,
    eval_qry2retro,
    label_matrix_from_scores,
    ranks_from_scores_device,
)
from laff_tpu.eval.metrics import eval_t2v, eval_v2t, metrics_from_ranks


def test_eval_label_matrix_hand_computed():
    # 3 queries; gt at ranked positions 1, 3, 2
    lm = np.array(
        [
            [1, 0, 0, 0],
            [0, 0, 1, 0],
            [0, 1, 0, 0],
        ]
    )
    r1, r5, r10, medr, meanr, mir, mAP = eval_label_matrix(lm)
    np.testing.assert_allclose(r1, 100.0 / 3)
    assert r5 == 100.0
    np.testing.assert_allclose(meanr, 2.0)
    np.testing.assert_allclose(medr, 2.0)
    np.testing.assert_allclose(mir, (1 + 1 / 3 + 1 / 2) / 3)
    np.testing.assert_allclose(mAP, mir)  # single positive -> mAP == MIR


def test_eval_label_matrix_multiple_positives():
    lm = np.array([[0, 1, 1, 0, 1]])
    r1, r5, r10, medr, meanr, mir, mAP = eval_label_matrix(lm)
    assert meanr == 2.0
    # AP = mean(1/2, 2/3, 3/5)
    np.testing.assert_allclose(mAP, (1 / 2 + 2 / 3 + 3 / 5) / 3)


def test_eval_qry2retro_medr_plus_one():
    sim = np.eye(4) + 0.001 * np.arange(16).reshape(4, 4)
    r1, r5, r10, medr, meanr, mir = eval_qry2retro(sim)
    assert r1 == 100.0
    assert medr == 1.0
    assert meanr == 1.0


def test_device_ranks_match_host_argsort(rng):
    scores = rng.standard_normal((50, 200)).astype(np.float32)
    # inject ties to exercise tie-breaking
    scores[:, 10] = scores[:, 20]
    gt = rng.integers(0, 200, size=50).astype(np.int32)
    txt_ids = [f"g{c}#i" for c in gt]
    vis_ids = [f"g{c}" for c in range(200)]

    lm = label_matrix_from_scores(scores, txt_ids, vis_ids)
    host_ranks = np.argmax(lm, axis=1) + 1

    dev_ranks = np.asarray(ranks_from_scores_device(jnp.asarray(scores), jnp.asarray(gt)))
    np.testing.assert_array_equal(dev_ranks, host_ranks)


def test_device_ranks_tie_semantics():
    # all-equal scores: reversed stable argsort puts larger index first
    scores = np.ones((1, 5), dtype=np.float32)
    for gt, expected in [(4, 1), (0, 5), (2, 3)]:
        r = int(ranks_from_scores_device(jnp.asarray(scores), jnp.asarray([gt], dtype=np.int32))[0])
        assert r == expected


def test_eval_t2v_v2t_consistency(rng):
    # 6 videos, 2 captions each; make caption i strongly match its video
    vis_ids = [f"v{i}" for i in range(6)]
    txt_ids = [f"v{i}#c{j}" for i in range(6) for j in range(2)]
    scores = rng.standard_normal((12, 6)).astype(np.float32) * 0.01
    for k, tid in enumerate(txt_ids):
        scores[k, int(tid[1])] = 1.0
    t2v = eval_t2v(scores, txt_ids, vis_ids)
    v2t = eval_v2t(scores, txt_ids, vis_ids)
    assert t2v[0] == 100.0  # R@1
    assert v2t[0] == 100.0


def test_metrics_from_ranks():
    out = metrics_from_ranks(np.array([1, 3, 2]))
    ref = eval_label_matrix(
        np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0]])
    )
    np.testing.assert_allclose(out, ref)


def test_hist_measure_eval_path(rng):
    """measure='hist' flows through score_matrix / t2v_ranks consistently
    with the loss-side hist_sim."""
    import jax.numpy as jnp

    from laff_tpu.engine.evaluator import score_matrix, t2v_ranks
    from laff_tpu.ops import hist_sim

    t = jnp.asarray(np.abs(rng.standard_normal((10, 8))).astype(np.float32))
    v = jnp.asarray(np.abs(rng.standard_normal((6, 8))).astype(np.float32))
    scores = score_matrix(t, v, measure="hist")
    np.testing.assert_allclose(scores, np.asarray(hist_sim(t, v)), rtol=1e-5)

    txt_ids = [f"v{i % 6}#0" for i in range(10)]
    vis_ids = [f"v{i}" for i in range(6)]
    ranks = t2v_ranks(t, v, txt_ids, vis_ids, measure="hist")
    gt = np.array([i % 6 for i in range(10)])
    expected = 1 + (scores > scores[np.arange(10), gt][:, None]).sum(1)
    np.testing.assert_array_equal(ranks, expected)

    # multi-head hist: per-head mean
    t3 = jnp.asarray(np.abs(rng.standard_normal((4, 2, 8))).astype(np.float32))
    v3 = jnp.asarray(np.abs(rng.standard_normal((5, 2, 8))).astype(np.float32))
    s3 = score_matrix(t3, v3, measure="hist")
    manual = np.mean(
        [np.asarray(hist_sim(t3[:, h], v3[:, h])) for h in range(2)], axis=0
    )
    np.testing.assert_allclose(s3, manual, rtol=1e-5)


def test_blockwise_flat_ranks_matches_flat(rng):
    import jax.numpy as jnp

    from laff_tpu.eval import blockwise_flat_ranks, flat_sim_ranks

    t, v, h, d = 64, 200, 2, 16
    txt = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    vis = jnp.asarray(rng.standard_normal((v, h, d)).astype(np.float32))
    gt = jnp.asarray(rng.integers(0, v, (t,)).astype(np.int32))
    full = np.asarray(flat_sim_ranks(txt, vis, gt))
    blocked = np.asarray(blockwise_flat_ranks(txt, vis, gt, block_t=16))
    np.testing.assert_array_equal(blocked, full)


def test_topk_two_stage_matches_direct(rng):
    import jax
    import jax.numpy as jnp

    from laff_tpu.eval import topk_two_stage

    t, v, k = 6, 512, 20
    scores = jnp.asarray(rng.standard_normal((t, v)).astype(np.float32))
    vals, idx = topk_two_stage(scores, k, block_v=64)
    dvals, didx = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(dvals), rtol=1e-6)
    # same candidate set (order within exact ties may differ)
    for q in range(t):
        assert set(np.asarray(idx[q])) == set(np.asarray(didx[q]))


def test_topk_two_stage_ragged_tail(rng):
    import jax
    import jax.numpy as jnp

    from laff_tpu.eval import topk_two_stage

    t, v, k = 4, 500, 16  # 500 % 64 != 0 -> -inf padded tail
    scores = jnp.asarray(rng.standard_normal((t, v)).astype(np.float32))
    vals, idx = topk_two_stage(scores, k, block_v=64)
    dvals, didx = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(dvals), rtol=1e-6)
    assert (np.asarray(idx) < v).all()


def test_topk_wide_value_exact(rng):
    import jax
    import jax.numpy as jnp

    from laff_tpu.eval import topk_wide

    t, v, k = 5, 4096, 50
    scores = jnp.asarray(rng.standard_normal((t, v)).astype(np.float32))
    vals, idx = topk_wide(scores, k)
    dvals, _ = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(dvals), rtol=0)
    # selected indices actually carry the selected values
    got = np.take_along_axis(np.asarray(scores), np.asarray(idx), axis=1)
    np.testing.assert_allclose(got, np.asarray(vals), rtol=0)
