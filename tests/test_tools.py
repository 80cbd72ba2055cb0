"""tools/: marginalized alignment probabilities (dual implementation vs
scalar-loop oracle) and the alphabet auditor."""

import numpy as np

import jax.numpy as jnp

from torch_tts_tpu.tools import alignment as al


def naive_alignment(P, T):
    """Scalar-loop oracle of Q and A with the module's conventions."""
    N, Dp1 = P.shape
    max_d = Dp1 - 1
    Q = np.zeros((N, T))
    Q[0, : min(Dp1, T)] = P[0, : min(Dp1, T)]
    for i in range(1, N):
        for j in range(T):
            for m in range(max(0, j - max_d), j + 1):
                Q[i, j] += Q[i - 1, m] * P[i, j - m]
    Pcum = np.cumsum(P[:, ::-1], axis=1)[:, ::-1]
    starts = np.zeros((N, T))
    starts[0, 0] = 1.0
    for i in range(1, N):
        starts[i, 1:] = Q[i - 1, :-1]
    A = np.zeros((N, T))
    for i in range(N):
        for j in range(T):
            for s in range(0, j + 1):
                d = j - s + 1
                if 1 <= d <= max_d:
                    A[i, j] += starts[i, s] * Pcum[i, d]
    return Q, A


def test_alignment_probabilities_match_oracle(rng):
    P = al.random_duration_probs(rng, 5, 4)
    T = 20
    Qn, An = naive_alignment(P.astype(np.float64), T)
    Q1, A1 = al.alignment_probabilities(jnp.asarray(P), T)
    Q2, A2 = al.alignment_probabilities_conv(jnp.asarray(P), T)
    np.testing.assert_allclose(np.asarray(Q1), Qn, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Q2), Qn, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A1), An, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A2), An, atol=1e-5)
    # Q rows are end-time distributions; each sums to <= 1 (1 if T big enough)
    np.testing.assert_allclose(np.asarray(Q1).sum(1), 1.0, atol=1e-4)


def test_self_test_passes():
    assert al.self_test()


def test_alphabet_audit():
    from torch_tts_tpu.tools.helper import audit_alphabet

    report = audit_alphabet(["hello world", "héllo!", "abc abc"])
    assert report["counts"]["l"] == 5
    assert "é" in report["rare"]
    assert report["categories"]["Ll"] >= 10
