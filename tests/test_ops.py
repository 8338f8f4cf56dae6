"""Numerics tests: norms / similarities / losses vs. torch-CPU oracles
implementing the reference formulas independently."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from laff_tpu.ops import (
    cosine_sim,
    cross_entropy_loss,
    dual_softmax_loss,
    hist_sim,
    l2norm,
    multi_head_cosine_sim,
    triplet_loss,
    triplet_loss_from_scores,
    triplet_loss_multi_space,
)


def torch_l2norm(x, eps=1e-13, dim=1):
    norm = torch.pow(x, 2).sum(dim=dim, keepdim=True).sqrt() + eps + 1e-14
    return x / norm


def torch_cosine_sim(q, r):
    return torch_l2norm(q) @ torch_l2norm(r).t()


def torch_triplet(s, im, margin=0.2, max_violation=True, direction="t2i", cost="sum"):
    scores = torch_cosine_sim(im, s)
    diagonal = scores.diag().view(im.size(0), 1)
    d1 = diagonal.expand_as(scores)
    d2 = diagonal.t().expand_as(scores)
    eye = torch.eye(scores.size(0)) > 0.5
    cost_s = cost_im = None
    if direction in ("i2t", "bidir"):
        cost_s = (margin + scores - d1).clamp(min=0).masked_fill(eye, 0)
    if direction in ("t2i", "bidir"):
        cost_im = (margin + scores - d2).clamp(min=0).masked_fill(eye, 0)
    if max_violation:
        if cost_s is not None:
            cost_s = cost_s.max(1)[0]
        if cost_im is not None:
            cost_im = cost_im.max(0)[0]
    cost_s = torch.zeros(1) if cost_s is None else cost_s
    cost_im = torch.zeros(1) if cost_im is None else cost_im
    if cost == "sum":
        return (cost_s.sum() + cost_im.sum()).item()
    return (cost_s.mean() + cost_im.mean()).item()


@pytest.fixture
def embs(rng):
    t = rng.standard_normal((12, 16)).astype(np.float32)
    v = rng.standard_normal((12, 16)).astype(np.float32)
    return t, v


def test_l2norm_matches_torch(embs):
    t, _ = embs
    ours = np.asarray(l2norm(jnp.asarray(t)))
    theirs = torch_l2norm(torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_cosine_sim_matches_torch(embs):
    t, v = embs
    ours = np.asarray(cosine_sim(jnp.asarray(t), jnp.asarray(v)))
    theirs = torch_cosine_sim(torch.from_numpy(t), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("direction", ["t2i", "i2t", "bidir"])
@pytest.mark.parametrize("max_violation", [True, False])
@pytest.mark.parametrize("cost", ["sum", "mean"])
def test_triplet_matches_torch(embs, direction, max_violation, cost):
    t, v = embs
    ours = float(
        triplet_loss(
            jnp.asarray(t), jnp.asarray(v),
            margin=0.2, direction=direction,
            max_violation=max_violation, cost_style=cost,
        )
    )
    theirs = torch_triplet(
        torch.from_numpy(t), torch.from_numpy(v),
        margin=0.2, max_violation=max_violation, direction=direction, cost=cost,
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_triplet_from_scores_equals_embedding_path(embs):
    t, v = embs
    scores = cosine_sim(jnp.asarray(v), jnp.asarray(t))
    a = float(triplet_loss_from_scores(scores))
    b = float(triplet_loss(jnp.asarray(t), jnp.asarray(v)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_multi_space_triplet_is_sum_of_heads(rng):
    t = rng.standard_normal((8, 4, 16)).astype(np.float32)
    v = rng.standard_normal((8, 4, 16)).astype(np.float32)
    total = float(triplet_loss_multi_space(jnp.asarray(t), jnp.asarray(v)))
    per_head = sum(
        float(triplet_loss(jnp.asarray(t[:, h]), jnp.asarray(v[:, h])))
        for h in range(4)
    )
    np.testing.assert_allclose(total, per_head, rtol=1e-5)


def test_multi_head_cosine_sim_mean(rng):
    t = rng.standard_normal((5, 3, 8)).astype(np.float32)
    v = rng.standard_normal((7, 3, 8)).astype(np.float32)
    mean_sim = np.asarray(multi_head_cosine_sim(jnp.asarray(t), jnp.asarray(v)))
    assert mean_sim.shape == (5, 7)
    manual = np.mean(
        [
            np.asarray(cosine_sim(jnp.asarray(t[:, h]), jnp.asarray(v[:, h])))
            for h in range(3)
        ],
        axis=0,
    )
    np.testing.assert_allclose(mean_sim, manual, rtol=1e-5, atol=1e-6)


def test_hist_sim(rng):
    a = np.abs(rng.standard_normal((4, 6))).astype(np.float32)
    b = np.abs(rng.standard_normal((5, 6))).astype(np.float32)
    ours = np.asarray(hist_sim(jnp.asarray(a), jnp.asarray(b)))
    at, bt = torch.from_numpy(a), torch.from_numpy(b)
    inter = torch.min(at.unsqueeze(1), bt.unsqueeze(0)).sum(-1)
    union = torch.max(at.unsqueeze(1), bt.unsqueeze(0)).sum(-1) + 1e-14
    np.testing.assert_allclose(ours, (inter / union).numpy(), rtol=1e-5)


def test_dual_softmax_loss_matches_torch(embs):
    t, v = embs
    ours = float(dual_softmax_loss(jnp.asarray(t), jnp.asarray(v)))

    sim1 = torch_cosine_sim(torch.from_numpy(t), torch.from_numpy(v))

    def side(sim, temp=1000.0):
        sim = sim * torch.nn.functional.softmax(sim / temp, dim=0) * len(sim)
        return -torch.diag(torch.nn.functional.log_softmax(sim, dim=-1)).sum()

    theirs = ((side(sim1) + side(sim1.T)) / 2).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_cross_entropy_loss(embs):
    t, v = embs
    ours = float(cross_entropy_loss(jnp.asarray(t), jnp.asarray(v)))
    sim = torch_cosine_sim(torch.from_numpy(t), torch.from_numpy(v))
    theirs = ((-sim.diag().sum()) + (-sim.t().diag().sum())).item() / 2
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
