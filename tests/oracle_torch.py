"""A compact pure-PyTorch (CPU) oracle of the reference semantics.

This is the test-side re-implementation of the reference's KGEModel math
(reference: codes/model.py) used for allclose parity checks against the JAX
path (SURVEY.md §4 item a). It is written from the published RotatE paper /
upstream semantics — NOT copied from the reference repo (which is an empty
mount on this machine).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F

PI = math.pi


def split2(x):
    return torch.chunk(x, 2, dim=-1)


def transe(h, r, t, gamma, mode):
    if mode == "head-batch":
        score = h + (r - t)
    else:
        score = (h + r) - t
    return gamma - torch.norm(score, p=1, dim=-1)


def distmult(h, r, t, mode):
    if mode == "head-batch":
        score = h * (r * t)
    else:
        score = (h * r) * t
    return score.sum(dim=-1)


def complex_(h, r, t, mode):
    re_h, im_h = split2(h)
    re_r, im_r = split2(r)
    re_t, im_t = split2(t)
    if mode == "head-batch":
        re_score = re_r * re_t + im_r * im_t
        im_score = re_r * im_t - im_r * re_t
        score = re_h * re_score + im_h * im_score
    else:
        re_score = re_h * re_r - im_h * im_r
        im_score = re_h * im_r + im_h * re_r
        score = re_score * re_t + im_score * im_t
    return score.sum(dim=-1)


def rotate(h, r, t, gamma, embedding_range, mode):
    re_h, im_h = split2(h)
    re_t, im_t = split2(t)
    phase_r = r / (embedding_range / PI)
    re_r = torch.cos(phase_r)
    im_r = torch.sin(phase_r)
    if mode == "head-batch":
        re_score = re_r * re_t + im_r * im_t
        im_score = re_r * im_t - im_r * re_t
        re_score = re_score - re_h
        im_score = im_score - im_h
    else:
        re_score = re_h * re_r - im_h * im_r
        im_score = re_h * im_r + im_h * re_r
        re_score = re_score - re_t
        im_score = im_score - im_t
    score = torch.stack([re_score, im_score], dim=0).norm(dim=0)
    return gamma - score.sum(dim=-1)


def protate(h, r, t, gamma, embedding_range, modulus, mode):
    scale = embedding_range / PI
    ph, pr, pt = h / scale, r / scale, t / scale
    if mode == "head-batch":
        score = ph + (pr - pt)
    else:
        score = (ph + pr) - pt
    score = torch.sin(score).abs()
    return gamma - score.sum(dim=-1) * modulus


def score(model_name, h, r, t, gamma, embedding_range, modulus=None, mode="single"):
    if model_name == "TransE":
        return transe(h, r, t, gamma, mode)
    if model_name == "DistMult":
        return distmult(h, r, t, mode)
    if model_name == "ComplEx":
        return complex_(h, r, t, mode)
    if model_name == "RotatE":
        return rotate(h, r, t, gamma, embedding_range, mode)
    if model_name == "pRotatE":
        return protate(h, r, t, gamma, embedding_range, modulus, mode)
    raise ValueError(model_name)


def forward(entity_emb, relation_emb, pos, neg, mode, model_name, gamma,
            embedding_range, modulus=None):
    """Gather + score, mirroring codes/model.py §KGEModel.forward."""
    if mode == "single":
        h = entity_emb[pos[:, 0]].unsqueeze(1)
        r = relation_emb[pos[:, 1]].unsqueeze(1)
        t = entity_emb[pos[:, 2]].unsqueeze(1)
    elif mode == "head-batch":
        h = entity_emb[neg]  # [B, n, de]
        r = relation_emb[pos[:, 1]].unsqueeze(1)
        t = entity_emb[pos[:, 2]].unsqueeze(1)
    else:
        h = entity_emb[pos[:, 0]].unsqueeze(1)
        r = relation_emb[pos[:, 1]].unsqueeze(1)
        t = entity_emb[neg]
    return score(model_name, h, r, t, gamma, embedding_range, modulus, mode)


def loss_fn(entity_emb, relation_emb, pos, neg, weight, mode, model_name,
            gamma, embedding_range, modulus=None, adv=False, adv_temp=1.0,
            uni_weight=False, regularization=0.0):
    """The reference's train_step loss (codes/model.py ≈L267-330)."""
    negative_score = forward(
        entity_emb, relation_emb, pos, neg, mode, model_name, gamma,
        embedding_range, modulus,
    )
    if adv:
        w = F.softmax(negative_score * adv_temp, dim=1).detach()
        negative_score = (w * F.logsigmoid(-negative_score)).sum(dim=1)
    else:
        negative_score = F.logsigmoid(-negative_score).mean(dim=1)
    positive_score = forward(
        entity_emb, relation_emb, pos, None, "single", model_name, gamma,
        embedding_range, modulus,
    )
    positive_score = F.logsigmoid(positive_score).squeeze(dim=1)
    if uni_weight:
        positive_sample_loss = -positive_score.mean()
        negative_sample_loss = -negative_score.mean()
    else:
        positive_sample_loss = -(weight * positive_score).sum() / weight.sum()
        negative_sample_loss = -(weight * negative_score).sum() / weight.sum()
    loss = (positive_sample_loss + negative_sample_loss) / 2
    if regularization != 0.0:
        reg = regularization * (
            entity_emb.norm(p=3) ** 3 + relation_emb.norm(p=3) ** 3
        )
        loss = loss + reg
    return loss, positive_sample_loss, negative_sample_loss
