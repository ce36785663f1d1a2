"""Shift strategy tests, mirroring /root/reference/test/Shifts.jl."""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import ADI, DenseOp, lowrank
from differentialriccatiequations_jl_tpu.lowrank import lr_zero
from differentialriccatiequations_jl_tpu.models import shifts as S


def penzl(p):
    return np.array([[-1.0, p], [-p, -1.0]])


def modified_penzl(v):
    return abs(np.real(v)) * penzl(np.imag(v) / np.real(v))


class _Prob:
    def __init__(self, E, A):
        self.E = DenseOp(E)
        self.A = DenseOp(A)


def make_prob():
    n = 3
    E = np.eye(n)
    A = np.zeros((n, n))
    A[:2, :2] = penzl(1.0)
    A[2, 2] = -0.5
    return _Prob(E, A)


def test_helpers():
    assert not S.is_stable(0)
    assert not S.is_stable(1j)
    assert S.is_stable(-1)
    assert S.is_stable(-1 - 2j)
    assert S.flip(np.array(1.0)) == -1.0
    assert S.flip(np.array(2 + 1j)) == -2 + 1j


@pytest.mark.parametrize("cplx", [False, True])
def test_stabilize_ritz_values(cplx):
    rng = np.random.default_rng(0)
    n = 3
    v = rng.random(n) + (1j * rng.random(n) if cplx else 0)
    with pytest.warns(UserWarning, match="All Ritz values"):
        w = S.stabilize_ritz_values(np.array(v), "test")
    assert len(w) == n and np.all(S.is_stable(w))
    v2 = np.array(v)
    v2[0] = -v2[0].real + 1j * v2[0].imag if cplx else -v2[0]
    with pytest.warns(UserWarning, match="Discarding unstable"):
        w2 = S.stabilize_ritz_values(v2, "test")
    assert len(w2) == 1 and np.all(S.is_stable(w2))
    v3 = -rng.random(n) + (1j * rng.random(n) if cplx else 0)
    w3 = S.stabilize_ritz_values(np.array(v3), "test")
    assert len(w3) == n


def test_heuristic_penzl():
    # naive Arnoldi Ritz values are inaccurate (reference marks the exact
    # values @test_broken, test/Shifts.jl:71-96); check structure only.
    prob = make_prob()
    shifts = S.init_shifts(S.Heuristic(2, 2, 2), prob).take_many()
    assert 2 <= len(shifts) <= 3
    assert all(np.real(s) < 0 for s in shifts)
    # complex shifts adjacent as conjugate pairs
    i = 0
    while i < len(shifts):
        if abs(np.imag(shifts[i])) > 0:
            assert np.isclose(shifts[i + 1], np.conj(shifts[i]))
            i += 2
        else:
            i += 1


def test_cyclic():
    o = S.init_shifts(S.Cyclic([1.0, 2.0, 3.0]), None)
    assert [o.take() for _ in range(4)] == [1.0, 2.0, 3.0, 1.0]

    prob = make_prob()
    o = S.init_shifts(S.Cyclic(S.Heuristic(1, 1, 1)), prob)
    p = o.take()
    if p.imag == 0:
        assert o.take() == p
    else:
        assert np.isclose(o.take(), np.conj(p))
        assert np.isclose(o.take(), p)


def test_wrapped():
    class Dummy(S.BufferedOracle):
        def take_many(self):
            return [1.0, 2.0, 3.0]

    o = S.WrappedOracle(lambda v: list(reversed(v)), Dummy())
    assert [o.take() for _ in range(3)] == [3.0, 2.0, 1.0]

    prob = make_prob()
    o = S.init_shifts(S.Wrapped(lambda v: [42.0], S.Heuristic(1, 1, 1)), prob)
    assert o.take() == 42.0
    assert o.take() == 42.0


def test_projection_known_value():
    # rank-one residual of ones → single shift −5/6 (test/Shifts.jl:165-183)
    prob = make_prob()
    o = S.init_shifts(S.Projection(2), prob)
    assert isinstance(o, S.BufferedOracle)
    X0 = lr_zero(3, 1, np.float64)
    o.update(X0, np.ones((3, 1)))
    assert np.isclose(o.take(), -5.0 / 6.0)


def test_projection_rejects_odd_history():
    with pytest.raises(ValueError):
        S.Projection(1)


def _preserves_conj_pairs(oracle, n):
    i = 0
    while i < n:
        i += 1
        v = oracle.take()
        if abs(np.imag(v)) > 0:
            i += 1
            w = oracle.take()
            if not np.isclose(w, np.conj(v)):
                return False
    return True


@pytest.mark.parametrize("f", [lambda a: -np.exp(a * 1j), lambda a: -1 - a * 1j])
def test_conjugate_pairs(f):
    vals = np.array([f(v) for v in range(-3, 4, 2)])
    s = S.safe_sort(vals)
    o = S.CyclicOracle(s)
    assert _preserves_conj_pairs(o, len(s))

    # full-spectrum projection (test/Shifts.jl:205-215)
    A = np.zeros((4, 4))
    A[:2, :2] = modified_penzl(f(1))
    A[2:, 2:] = modified_penzl(f(2))
    o = S.init_shifts(S.Projection(2), _Prob(np.eye(4), A))
    o.update(None, None, np.eye(4))
    assert _preserves_conj_pairs(o, 4)


def test_config_hash_stability():
    # analog of test/hash.jl — frozen dataclasses hash stably
    def twice(x):
        return 2 * x

    builders = [
        lambda: S.Cyclic((1.0,)),
        lambda: S.Cyclic(S.Heuristic(1, 2, 3)),
        lambda: S.Projection(2),
    ]
    for b in builders:
        assert hash(b()) == hash(b())
    assert hash(ADI(shifts=S.Projection(2))) == hash(ADI(shifts=S.Projection(2)))
