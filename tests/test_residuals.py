"""Residual equivalence tests: low-rank residual ≡ dense residual in norm,
over a grid of inner-factor kinds (analog of /root/reference/test/residual.jl).
"""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import GALEProblem, GAREProblem, lowrank
from differentialriccatiequations_jl_tpu.lowrank import lr_norm, lr_to_dense, lr_zero
from differentialriccatiequations_jl_tpu.models import residual
from differentialriccatiequations_jl_tpu.models.residuals import (
    residual_gale_dense,
    residual_gare_dense,
)

T = np.float64
N, C_RANK, Q_RANK, Z_RANK = 20, 4, 3, 2
rng = np.random.default_rng(1)

E = rng.standard_normal((N, N)) * (rng.random((N, N)) < 1.0 / N) + np.eye(N)
A = rng.standard_normal((N, N)) * (rng.random((N, N)) < 1.0 / N) - np.eye(N)
Z = rng.standard_normal((N, Z_RANK))
Y_INDEF = np.eye(Z_RANK)[:, ::-1].copy()

KINDS = ["definite", "scaled", "indefinite"]


def factor(kind, s):
    if kind == "definite":
        return np.eye(s)
    if kind == "scaled":
        return 2.0 * np.eye(s)
    return np.eye(s)[:, ::-1].copy()


def C_of(kind, rank=C_RANK, seed=5):
    g = np.random.default_rng(seed)
    return lowrank(g.standard_normal((N, rank)), factor(kind, rank))


@pytest.mark.parametrize("kind", KINDS)
def test_gale_residual_zero_X(kind):
    C = C_of(kind)
    prob = GALEProblem(E, A, C)
    res = residual(prob, lr_zero(N, 8, T))
    assert np.isclose(float(lr_norm(res)), float(lr_norm(C)))
    res_dense = residual_gale_dense(prob.E, prob.A, C, np.zeros((N, N)))
    assert np.isclose(np.linalg.norm(np.asarray(res_dense)), float(lr_norm(C)))


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("xkind", ["definite", "indefinite"])
def test_gale_residual_lowrank_equals_dense(kind, xkind):
    C = C_of(kind)
    X = lowrank(Z, 2.0 * (Y_INDEF if xkind == "indefinite" else np.eye(Z_RANK)))
    prob = GALEProblem(E, A, C)
    res_lr = residual(prob, X)
    res_d = residual_gale_dense(prob.E, prob.A, C, np.asarray(lr_to_dense(X)))
    assert np.isclose(float(lr_norm(res_lr)), np.linalg.norm(np.asarray(res_d)),
                      rtol=1e-10)
    assert np.allclose(np.asarray(lr_to_dense(res_lr)), np.asarray(res_d),
                       atol=1e-10)


@pytest.mark.parametrize("ckind", KINDS)
@pytest.mark.parametrize("qkind", KINDS)
def test_gare_residual_lowrank_equals_dense(ckind, qkind):
    G = C_of(ckind, rank=C_RANK, seed=6)
    Q = C_of(qkind, rank=Q_RANK, seed=7)
    X = lowrank(Z, 2.0 * Y_INDEF)
    prob = GAREProblem(E, A, G, Q)
    res_lr = residual(prob, X)
    res_d = residual_gare_dense(prob.E, prob.A, G, Q, np.asarray(lr_to_dense(X)))
    assert np.isclose(float(lr_norm(res_lr)), np.linalg.norm(np.asarray(res_d)),
                      rtol=1e-10)
    assert np.allclose(np.asarray(lr_to_dense(res_lr)), np.asarray(res_d),
                       atol=1e-10)
