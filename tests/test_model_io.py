"""LibSVM model text format round-trip (S4 parity; FIXTURES.md §B.3)."""

from __future__ import annotations

import numpy as np

from parallel_svms_spark.io.model_io import from_libsvm_text, to_libsvm_text
from parallel_svms_spark.ml.smo import train_svc


def _toy_model(n_classes=3):
    rng = np.random.default_rng(7)
    X = np.vstack([rng.normal(loc=2.5 * c, scale=0.7, size=(40, 6))
                   for c in range(n_classes)])
    y = np.repeat(np.arange(n_classes), 40)
    return train_svc(X, y), X, y


def test_header_fields():
    m, _, _ = _toy_model()
    text = to_libsvm_text(m)
    lines = text.splitlines()
    assert lines[0] == "svm_type c_svc"
    assert lines[1] == "kernel_type rbf"
    assert lines[2].startswith("gamma ")
    assert f"nr_class 3" in text and "SV" in text
    rho_line = next(l for l in lines if l.startswith("rho "))
    assert len(rho_line.split()) - 1 == 3  # k(k-1)/2 machines


def test_roundtrip_predictions_identical():
    m, X, y = _toy_model()
    m2 = from_libsvm_text(to_libsvm_text(m))
    assert np.array_equal(m.predict(X), m2.predict(X))
    assert m2.n_sv == m.n_sv
    # decision values match numerically, not just votes
    from parallel_svms_spark.ml.smo import rbf_kernel
    K1 = rbf_kernel(X, m.X_sv, m.gamma)
    K2 = rbf_kernel(X, m2.X_sv, m2.gamma)
    for pair in m.pair_coefs:
        d1 = m.decision_pair(K1, pair)
        d2 = m2.decision_pair(K2, pair)
        assert np.allclose(d1, d2, atol=1e-10)


def test_binary_model_roundtrip():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(80, 4))
    y = (X[:, 0] > 0).astype(int)
    m = train_svc(X, y)
    m2 = from_libsvm_text(to_libsvm_text(m))
    assert np.array_equal(m.predict(X), m2.predict(X))
