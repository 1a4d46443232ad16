"""Unit oracle for the numpy SMO solver (SURVEY §5.3)."""

from __future__ import annotations

import numpy as np

from parallel_svms_spark.ml.smo import (
    linear_kernel, rbf_kernel, smo_solve, train_svc,
)


def test_hand_computed_dual():
    # x=0 (y=-1), x=1 (y=+1): alpha=(2,2), rho=1, margin at ±1
    X = np.array([[0.0], [1.0]])
    y = np.array([-1.0, 1.0])
    a, rho = smo_solve(linear_kernel(X, X), y, C=10.0)
    assert np.allclose(a, [2.0, 2.0], atol=1e-6)
    assert abs(rho - 1.0) < 1e-6


def test_kkt_and_box_constraints():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 8))
    y = np.where(X[:, 0] + 0.3 * rng.normal(size=200) > 0, 1.0, -1.0)
    C = 1.0
    K = rbf_kernel(X, X, gamma=1 / 8)
    a, rho = smo_solve(K, y, C=C)
    assert (a >= -1e-9).all() and (a <= C + 1e-9).all()
    assert abs(np.dot(a, y)) < 1e-6          # equality constraint
    # KKT residual within eps tolerance
    grad = (y[:, None] * K * y[None, :]) @ a - 1.0
    yg = -y * grad
    up = ((y > 0) & (a < C - 1e-9)) | ((y < 0) & (a > 1e-9))
    low = ((y < 0) & (a < C - 1e-9)) | ((y > 0) & (a > 1e-9))
    assert yg[up].max() - yg[low].min() < 2e-3


def test_shrinking_reaches_same_kkt_optimum():
    # shrinking may take a different iteration path but must land on an
    # eps-KKT point of the FULL problem with the same decision geometry
    rng = np.random.default_rng(4)
    X = rng.normal(size=(400, 8))
    y = np.where(X[:, 0] + 0.3 * rng.normal(size=400) > 0, 1.0, -1.0)
    C = 1.0
    K = rbf_kernel(X, X, gamma=1 / 8)
    a_ns, rho_ns = smo_solve(K, y, C=C, shrinking=False)
    a_s, rho_s = smo_solve(K, y, C=C, shrinking=True)
    for a in (a_ns, a_s):
        assert (a >= -1e-9).all() and (a <= C + 1e-9).all()
        assert abs(np.dot(a, y)) < 1e-6
        grad = (y[:, None] * K * y[None, :]) @ a - 1.0
        yg = -y * grad
        up = ((y > 0) & (a < C - 1e-9)) | ((y < 0) & (a > 1e-9))
        low = ((y < 0) & (a < C - 1e-9)) | ((y > 0) & (a > 1e-9))
        assert yg[up].max() - yg[low].min() < 2e-3
    # same decision values up to solver tolerance
    d_ns = K @ (a_ns * y) - rho_ns
    d_s = K @ (a_s * y) - rho_s
    assert (np.sign(d_ns) == np.sign(d_s)).mean() > 0.99


def test_separable_blobs_multiclass():
    rng = np.random.default_rng(0)
    X = np.vstack([rng.normal(loc=3 * c, scale=0.5, size=(60, 4))
                   for c in range(3)])
    y = np.repeat([0, 1, 2], 60)
    m = train_svc(X, y)
    assert (m.predict(X) == y).mean() == 1.0
    # SVs live near boundaries: far fewer SVs than points
    assert m.n_sv < len(y) * 0.7


def test_nonseparable_converges():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(300, 16))
    y = rng.integers(0, 2, size=300)  # pure noise — must still terminate
    m = train_svc(X, y, C=1.0)
    assert m.n_sv <= 300
    assert set(np.unique(m.predict(X))) <= {0, 1}


def test_determinism():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(150, 8))
    y = (X[:, 0] > 0).astype(int)
    m1, m2 = train_svc(X, y), train_svc(X, y)
    assert np.array_equal(m1.sv_orig_idx, m2.sv_orig_idx)
    assert np.array_equal(m1.predict(X), m2.predict(X))


def test_fit_global_distributed_matches_serial(spark, sf_dir):
    """The pair-parallel global trainer matches smo.train_svc up to
    kernel-evaluation float noise (per-pair RBF vs sliced full Gram
    differ in the last ulp, so duals can differ at ~1e-6)."""
    import numpy as np
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.ml import smo, trainer

    emb = load_table(spark, sf_dir, "embeddings").limit(200).localCheckpoint()
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    y = np.asarray([r.label for r in rows])
    serial = smo.train_svc(X, y, gamma=2.0)
    dist = trainer.fit_global_distributed(emb, gamma=2.0)
    assert list(dist.classes) == list(serial.classes)
    assert dist.n_sv == serial.n_sv
    assert set(dist.rhos) == set(serial.rhos)
    for pair in serial.rhos:
        assert abs(dist.rhos[pair] - serial.rhos[pair]) < 1e-3
        si, sc = serial.pair_coefs[pair]
        di, dc = dist.pair_coefs[pair]
        assert len(dc) == len(sc)
    # near-identical predictions (boundary-tie flips only)
    agree = float((dist.predict(X) == serial.predict(X)).mean())
    assert agree >= 0.97


def test_fast_path_bitwise_equals_general_loop():
    """r10 optimization pin: smo_solve's buffer-reusing no-shrink fast
    path returns the BITWISE-identical (alpha, rho) the original loop
    (_smo_solve_general, shrinking=False) produces — same ops, same
    operand order, over a battery spanning converged and
    iteration-capped duals, both kernels, and C extremes."""
    import numpy as np
    from parallel_svms_spark.ml import smo

    rng = np.random.RandomState(20251104)
    checked = 0
    for trial in range(10):
        n = int(rng.choice([15, 60, 200, 400]))
        d = int(rng.choice([4, 8, 64]))
        X = rng.randn(n, d)
        y = np.where(rng.rand(n) > rng.rand(), 1.0, -1.0)
        if len(set(y.tolist())) < 2:
            continue
        K = smo.KERNELS["rbf" if trial % 2 else "linear"](X, X, 1.0 / d)
        C = float(rng.choice([0.5, 1.0, 10.0]))
        mi = max(10_000, min(100 * n, 250_000))
        a_ref, r_ref = smo._smo_solve_general(K, y, C, 1e-3, mi, False)
        a_new, r_new = smo.smo_solve(K, y, C=C)
        assert np.array_equal(a_ref, a_new)
        assert r_ref == r_new
        checked += 1
    assert checked >= 6


def test_native_loop_bitwise_equals_numpy_fast_path():
    """r10 optimization pin: the compiled no-shrink loop (_smo_native,
    gcc -ffp-contract=off, op-for-op port) returns BITWISE-identical
    (alpha, rho) to the numpy fast path over a battery that includes
    iteration-capped degenerate duals (duplicated rows force the
    zigzag regime where the cap binds, so deep trajectories are
    compared, not just early-converged ones)."""
    import numpy as np
    import pytest
    from parallel_svms_spark.ml import _smo_native, smo

    lib = _smo_native.load()
    if lib is None:
        pytest.skip("no native build on this host (numpy fallback active)")
    rng = np.random.RandomState(77031)
    checked = 0
    for trial in range(12):
        n = int(rng.choice([15, 60, 200, 400, 640]))
        d = int(rng.choice([4, 8, 64]))
        X = rng.randn(n, d)
        if trial % 3 == 2:  # rank-deficient: duplicate half the rows
            X[n // 2:] = X[: n - n // 2]
        y = np.where(rng.rand(n) > rng.rand(), 1.0, -1.0)
        if len(set(y.tolist())) < 2:
            continue
        K = smo.KERNELS["rbf" if trial % 2 else "linear"](X, X, 1.0 / d)
        C = float(rng.choice([0.5, 1.0, 10.0]))
        mi = max(10_000, min(100 * n, 250_000))
        a_np, r_np = smo._smo_solve_noshrink_np(K, y, C, 1e-3, mi)
        a_c, r_c = smo._smo_solve_noshrink_native(lib, K, y, C, 1e-3, mi)
        assert np.array_equal(a_np, a_c)
        assert r_np == r_c
        checked += 1
    assert checked >= 8
