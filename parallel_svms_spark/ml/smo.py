"""Pure-numpy C-SVC dual solver (SMO) with one-vs-one multiclass.

Clean-room replacement for the LibSVM solver the reference calls via
``LibSVM_modified.buildClassifier`` (cascade_svm/Midcascade.java:121-122;
parameter block at Midcascade.java:62-94: C-SVC, RBF kernel,
γ = 1/max_feature_index, C=1, eps=1e-3, shrinking on, probability off).
Multiclass is one-vs-one — N(N−1)/2 binary machines, matching LibSVM
(PDF slide 6) — with LibSVM's vote + lowest-class tie-break.

Solver: SMO with LibSVM's second-order working-set selection (WSS2 of
Fan, Chen & Lin 2005, "Working Set Selection Using Second Order
Information for Training SVM", JMLR 6 — public literature). The full
kernel matrix is precomputed: per-bucket problems in this engine are
a few thousand rows by design (that is the entire premise of
cascade/bagging/iterative partitioned training), so O(n²) memory is
the right trade against per-iteration kernel recomputation.

This module is driver/executor-agnostic pure numpy — Spark never
imports it directly; ``ml.trainer`` wraps it in applyInPandas.
"""

from __future__ import annotations

import numpy as np

TAU = 1e-12


def rbf_kernel(X1: np.ndarray, X2: np.ndarray, gamma: float) -> np.ndarray:
    """K(a,b) = exp(-γ ||a-b||²), computed blockwise-vectorized."""
    sq1 = np.sum(X1 * X1, axis=1)[:, None]
    sq2 = np.sum(X2 * X2, axis=1)[None, :]
    d2 = np.maximum(sq1 + sq2 - 2.0 * (X1 @ X2.T), 0.0)
    return np.exp(-gamma * d2)


def linear_kernel(X1: np.ndarray, X2: np.ndarray, gamma: float = 0.0) -> np.ndarray:
    return X1 @ X2.T


KERNELS = {"rbf": rbf_kernel, "linear": linear_kernel}


def smo_solve(K: np.ndarray, y: np.ndarray, C: float = 1.0,
              eps: float = 1e-3, max_iter: int | None = None,
              shrinking: bool = False):
    """Solve min ½αᵀQα − eᵀα, 0 ≤ α ≤ C, yᵀα = 0 with Q=yyᵀ∘K.

    Returns (alpha, rho) with LibSVM's sign convention:
    decision(x) = Σ αᵢ yᵢ K(xᵢ,x) − rho.

    max_iter None → clamp(100·n, 10⁴, 250·10³): on degenerate duals
    (rank-deficient kernels over near-random data) SMO zigzags with
    ~0 objective progress per step; an unscaled ceiling turns one such
    sub-problem into minutes of spin for an α no better than the
    capped one. The absolute ceiling only binds for single problems
    past ~2.5k rows, which under the engine's bucket-sizing contract
    occur only in the no-SV-reduction degenerate regime (where more
    iterations don't help either); convergent problems stop on the
    eps gap long before any cap.

    ``shrinking``: LibSVM's §4 heuristic (the reference trains with
    param.shrinking = 1, cascade_svm/Midcascade.java:74): every
    min(n, 1000) iterations, variables provably stuck at a bound —
    at-bound AND outside the current (m, M) violating band — are
    frozen out of the working arrays, so every per-iteration O(n)
    vector op shrinks to O(active). Once the gap reaches 10·eps the
    full set is reactivated and re-shrunk (LibSVM's one-shot
    unshrink), and ANY termination on a shrunk set first reconstructs
    the full gradient and re-checks optimality over all n variables —
    the final α is eps-KKT on the FULL problem either way.

    Default OFF, by measurement: LibSVM's shrinking pays because its
    per-iteration cost is on-demand kernel ROW computation (O(active
    × d) each), which shrinking directly reduces. This solver
    precomputes the Gram matrix (the right trade at ≤ few-thousand-row
    bucket sizes — module docstring), so per-iteration cost is ~12
    short numpy vector ops whose fixed call overhead, not length,
    dominates at bucket scale; measured min-of-3 at n∈{2k,3k,4k,6k,
    10k}, label noise 0-100%: shrinking is 0-110% SLOWER (reslice
    copies + reactivation checks, no row work to save). The switch
    stays for semantic parity and for callers feeding genuinely large
    dense problems through a row-on-demand kernel variant.
    """
    n = len(y)
    if max_iter is None:
        max_iter = max(10_000, min(100 * n, 250_000))
    if not shrinking:
        # the hot path every engine caller takes (module docstring: the
        # precomputed-Gram trade makes shrinking a loss here) — r10
        # buffer-reusing rewrite, bit-identical by construction (same
        # ops, same operand order; verified np.array_equal against
        # _smo_solve_general over a random battery in tests/test_smo.py)
        return _smo_solve_noshrink(K, y, C, eps, max_iter)
    return _smo_solve_general(K, y, C, eps, max_iter, shrinking)


def _smo_solve_general(K: np.ndarray, y: np.ndarray, C: float,
                       eps: float, max_iter: int, shrinking: bool):
    """The original (pre-r10) loop, with the optional shrinking
    machinery. ``smo_solve`` routes shrinking=True here; it also
    serves as the reference implementation the fast path's bitwise-
    equality pytest runs against (shrinking=False here follows the
    identical trajectory the fast path reproduces)."""
    n = len(y)
    y = np.asarray(y, dtype=np.float64)
    alpha = np.zeros(n)                 # full-problem α, kept current
    Kdiag_full = np.ascontiguousarray(np.diag(K)).astype(np.float64)
    NEG_INF, POS_INF = -np.inf, np.inf

    # compact active-set state (global index map + per-active arrays);
    # K_a is re-sliced CONTIGUOUS on shrink so the hot loop reads
    # cache-friendly rows instead of paying a gather per iteration
    ia = np.arange(n)
    K_a = K
    y_a = y.copy()
    alpha_a = np.zeros(n)
    grad_a = -np.ones(n)                # ∇f(α) = Qα − e, α=0 ⇒ −e
    Kd_a = Kdiag_full.copy()
    shrink_every = min(n, 1000)
    counter = shrink_every
    unshrunk = False

    def full_grad() -> np.ndarray:
        nz = np.flatnonzero(alpha > TAU)
        if len(nz) == 0:
            return -np.ones(n)
        return (K[:, nz] @ (alpha[nz] * y[nz])) * y - 1.0

    def reactivate():
        nonlocal ia, K_a, y_a, alpha_a, grad_a, Kd_a
        ia = np.arange(n)
        K_a = K
        y_a = y.copy()
        alpha_a = alpha.copy()
        grad_a = full_grad()
        Kd_a = Kdiag_full.copy()

    for _ in range(max_iter):
        yg = -y_a * grad_a
        # feasible-direction masks as single fused selects
        up = np.where(y_a > 0, alpha_a < C, alpha_a > 0.0)
        low = np.where(y_a > 0, alpha_a > 0.0, alpha_a < C)
        yg_up = np.where(up, yg, NEG_INF)
        li = int(np.argmax(yg_up))
        m = yg_up[li]
        yg_low = np.where(low, yg, POS_INF)
        M = yg_low.min()
        stalled = (m == NEG_INF) or (M == POS_INF) or (m - M < eps)
        lj = -1
        if not stalled:
            # second-order j selection among violators, row-vectorized
            Krow_i = K_a[li]
            b = m - yg
            a = Kd_a[li] + Kd_a - (2.0 * y_a[li]) * (y_a * Krow_i)
            np.maximum(a, TAU, out=a)
            obj = np.where(low & (b > TAU), -(b * b) / a, POS_INF)
            lj = int(np.argmin(obj))
            stalled = obj[lj] == POS_INF
        if stalled:
            # optimal (or numerically stuck) on the ACTIVE set: verify
            # on the full set before accepting (LibSVM Solve loop)
            if shrinking and len(ia) < n:
                reactivate()
                counter = 1
                continue
            break

        # two-variable analytic update (keep yᵀα constant, box-clip)
        Krow_j = K_a[lj]
        quad = max(Kd_a[li] + Kd_a[lj]
                   - 2.0 * y_a[li] * y_a[lj] * Krow_i[lj], TAU)
        delta = (m - yg[lj]) / quad  # step along (y_i e_i − y_j e_j)
        old_ai, old_aj = alpha_a[li], alpha_a[lj]
        ai = old_ai + y_a[li] * delta
        # clip to the box while preserving the equality constraint
        s = y_a[li] * old_ai + y_a[lj] * old_aj
        ai = min(max(ai, 0.0), C)
        aj = y_a[lj] * (s - y_a[li] * ai)
        if aj < 0.0:
            aj = 0.0
            ai = y_a[li] * (s - y_a[lj] * aj)
        elif aj > C:
            aj = C
            ai = y_a[li] * (s - y_a[lj] * aj)
        dai, daj = ai - old_ai, aj - old_aj
        if abs(dai) < TAU and abs(daj) < TAU:
            if shrinking and len(ia) < n:
                reactivate()
                counter = 1
                continue
            break
        alpha_a[li], alpha_a[lj] = ai, aj
        alpha[ia[li]], alpha[ia[lj]] = ai, aj
        grad_a += (y_a * Krow_i) * (y_a[li] * dai) \
            + (y_a * Krow_j) * (y_a[lj] * daj)

        if shrinking:
            counter -= 1
            if counter <= 0:
                counter = shrink_every
                yg2 = -y_a * grad_a
                up2 = np.where(y_a > 0, alpha_a < C, alpha_a > 0.0)
                low2 = np.where(y_a > 0, alpha_a > 0.0, alpha_a < C)
                m2 = np.where(up2, yg2, NEG_INF).max()
                M2 = np.where(low2, yg2, POS_INF).min()
                if not unshrunk and m2 - M2 <= 10.0 * eps and len(ia) < n:
                    # LibSVM's one-shot unshrink near convergence
                    unshrunk = True
                    reactivate()
                    yg2 = -y_a * grad_a
                    up2 = np.where(y_a > 0, alpha_a < C, alpha_a > 0.0)
                    low2 = np.where(y_a > 0, alpha_a > 0.0, alpha_a < C)
                    m2 = np.where(up2, yg2, NEG_INF).max()
                    M2 = np.where(low2, yg2, POS_INF).min()
                pos = y_a > 0
                at_up = alpha_a >= C - TAU
                at_low = alpha_a <= TAU
                shrink_mask = (
                    ((at_up & pos) | (at_low & ~pos)) & (yg2 > m2)
                ) | (
                    ((at_up & ~pos) | (at_low & pos)) & (yg2 < M2)
                )
                # apply only when the drop pays for the O(|A|²) K
                # re-slice: a <12.5% shrink saves less per iteration
                # than the contiguous copy costs (LibSVM's swap-based
                # shrink is free per element; an array re-slice isn't)
                n_shrink = int(shrink_mask.sum())
                n_keep = len(ia) - n_shrink
                if n_keep >= 2 and n_shrink >= max(64, len(ia) // 8):
                    keep = ~shrink_mask
                    ia = ia[keep]
                    y_a = y_a[keep]
                    alpha_a = alpha_a[keep]
                    grad_a = grad_a[keep]
                    Kd_a = Kd_a[keep]
                    K_a = np.ascontiguousarray(K[np.ix_(ia, ia)])

    # rho: average of y∇f over free SVs, else midpoint (LibSVM's
    # calculate_rho) — on the FULL gradient (grad_a IS it when the
    # final active set is the whole problem)
    yg = y * (grad_a if len(ia) == n else full_grad())
    free = (alpha > TAU) & (alpha < C - TAU)
    if free.any():
        rho = yg[free].mean()
    else:
        up = ((y > 0) & (alpha < C)) | ((y < 0) & (alpha > 0))
        low = ((y < 0) & (alpha < C)) | ((y > 0) & (alpha > 0))
        ub = yg[up].max() if up.any() else 0.0
        lb = yg[low].min() if low.any() else 0.0
        rho = (ub + lb) / 2.0
    return alpha, rho


def _rho_epilogue(y: np.ndarray, alpha: np.ndarray, grad: np.ndarray,
                  C: float) -> float:
    """Shared rho computation over the final (alpha, grad) iterate —
    identical to the reference epilogue; grad IS the full gradient on
    the no-shrink paths. One implementation so the numpy and native
    loops cannot drift."""
    yg_f = y * grad
    free = (alpha > TAU) & (alpha < C - TAU)
    if free.any():
        return yg_f[free].mean()
    up_ = ((y > 0) & (alpha < C)) | ((y < 0) & (alpha > 0))
    low_ = ((y < 0) & (alpha < C)) | ((y > 0) & (alpha > 0))
    ub = yg_f[up_].max() if up_.any() else 0.0
    lb = yg_f[low_].min() if low_.any() else 0.0
    return (ub + lb) / 2.0


def _smo_solve_noshrink(K: np.ndarray, y: np.ndarray, C: float,
                        eps: float, max_iter: int):
    """Dispatch the no-shrink loop to the compiled build when the host
    can provide one (guide §1.2 step 2: the per-iteration cost here is
    numpy ufunc DISPATCH, not arithmetic — ~12 short vector ops per
    iteration whose fixed overhead dominates at bucket sizes). The C
    loop is a bit-for-bit port (same ops, same operand order, IEEE
    doubles, no FMA contraction — _smo_native docstring) and the numpy
    path remains both the fallback and the equality oracle the tests
    pin the native build against."""
    from parallel_svms_spark.ml import _smo_native
    lib = _smo_native.load()
    if lib is not None:
        return _smo_solve_noshrink_native(lib, K, y, C, eps, max_iter)
    return _smo_solve_noshrink_np(K, y, C, eps, max_iter)


def _smo_solve_noshrink_native(lib, K: np.ndarray, y: np.ndarray,
                               C: float, eps: float, max_iter: int):
    import ctypes
    n = len(y)
    y = np.ascontiguousarray(np.asarray(y, dtype=np.float64))
    Kc = np.ascontiguousarray(K, dtype=np.float64)
    Kd = np.ascontiguousarray(np.diag(Kc)).astype(np.float64)
    alpha = np.empty(n)
    grad = np.empty(n)
    p = ctypes.POINTER(ctypes.c_double)
    rc = lib.smo_noshrink_loop(
        Kc.ctypes.data_as(p), Kd.ctypes.data_as(p), y.ctypes.data_as(p),
        alpha.ctypes.data_as(p), grad.ctypes.data_as(p),
        n, float(C), float(eps), int(max_iter))
    if rc != 0:  # scratch allocation failed — numpy computes the same
        return _smo_solve_noshrink_np(K, y, C, eps, max_iter)
    return alpha, _rho_epilogue(y, alpha, grad, C)


def _smo_solve_noshrink_np(K: np.ndarray, y: np.ndarray, C: float,
                           eps: float, max_iter: int):
    """``smo_solve(shrinking=False)``'s loop with per-iteration
    allocations hoisted out (guide §1.2 step 2 — per-task work): every
    n-length temporary is a preallocated buffer written with ``out=``
    ufuncs, ``np.where`` selects become fill+``np.copyto(where=)``,
    and ``y·K`` rows are precomputed once as a row-scaled matrix
    (YK[i, j] = K[i, j]·y[j] — the exact product the loop forms per
    iteration). The up/low feasibility masks are maintained
    incrementally (only alpha[li]/alpha[lj] move per iteration), and
    yg is formed as (−y)·grad with a precomputed −y — exact under
    IEEE (±1 multiplies and sign flips are lossless). Every remaining
    arithmetic op keeps the reference path's operand ORDER, so
    results are bit-identical (pytest-pinned equality over a random
    problem battery + the existing golden oracles); measured 1.1-1.4×
    for the buffer pass (n=512: 2.6 → 1.9 s) and a further ~1.3× for
    the incremental masks."""
    n = len(y)
    y = np.asarray(y, dtype=np.float64)
    alpha = np.zeros(n)
    Kd = np.ascontiguousarray(np.diag(K)).astype(np.float64)
    NEG_INF, POS_INF = -np.inf, np.inf
    grad = -np.ones(n)                  # ∇f(α) = Qα − e, α=0 ⇒ −e
    YK = K * y[None, :]                 # YK[i] == y * K[i] bitwise
    pos = y > 0
    yneg = -y                           # (−y)·g ≡ −(y·g) bitwise: the
    yg = np.empty(n)                    # sign bit is exact under IEEE
    yg_up = np.empty(n)
    yg_low = np.empty(n)
    b = np.empty(n)
    a = np.empty(n)
    obj = np.empty(n)
    t1 = np.empty(n)
    t2 = np.empty(n)
    m1 = np.empty(n, dtype=bool)
    # feasibility masks depend only on alpha, and each iteration moves
    # exactly alpha[li] and alpha[lj] — maintain up/low INCREMENTALLY
    # at those two indices instead of rebuilding all four n-length
    # boolean temporaries every pass (the masks are equal element-wise
    # to the rebuilt ones, so the trajectory is unchanged bit-for-bit)
    # up = pos ? (α<C) : (α>0);  low = pos ? (α>0) : (α<C)
    lt = alpha < C
    gt = alpha > 0.0
    up = np.where(pos, lt, gt)
    low = np.where(pos, gt, lt)

    def _upd_mask(i: int, ai: float) -> None:
        lt_i = ai < C
        gt_i = ai > 0.0
        if pos[i]:
            up[i] = lt_i
            low[i] = gt_i
        else:
            up[i] = gt_i
            low[i] = lt_i

    for _ in range(max_iter):
        np.multiply(yneg, grad, out=yg)  # yg = −y∇f, as the reference
        yg_up.fill(NEG_INF)
        np.copyto(yg_up, yg, where=up)
        li = int(np.argmax(yg_up))
        m = yg_up[li]
        yg_low.fill(POS_INF)
        np.copyto(yg_low, yg, where=low)
        M = yg_low.min()
        stalled = (m == NEG_INF) or (M == POS_INF) or (m - M < eps)
        lj = -1
        if not stalled:
            # second-order j selection among violators (WSS2), same
            # expressions as the reference loop
            Krow_i = K[li]
            np.subtract(m, yg, out=b)
            np.add(Kd, Kd[li], out=t2)          # Kd[li] + Kd
            np.multiply(YK[li], 2.0 * y[li], out=t1)
            np.subtract(t2, t1, out=a)
            np.maximum(a, TAU, out=a)
            np.multiply(b, b, out=t1)
            np.negative(t1, out=t1)
            np.divide(t1, a, out=t1)            # −b²/a everywhere
            np.greater(b, TAU, out=m1)
            np.logical_and(low, m1, out=m1)
            obj.fill(POS_INF)
            np.copyto(obj, t1, where=m1)
            lj = int(np.argmin(obj))
            stalled = obj[lj] == POS_INF
        if stalled:
            break
        quad = max(Kd[li] + Kd[lj]
                   - 2.0 * y[li] * y[lj] * Krow_i[lj], TAU)
        delta = (m - yg[lj]) / quad
        old_ai, old_aj = alpha[li], alpha[lj]
        ai = old_ai + y[li] * delta
        s = y[li] * old_ai + y[lj] * old_aj
        ai = min(max(ai, 0.0), C)
        aj = y[lj] * (s - y[li] * ai)
        if aj < 0.0:
            aj = 0.0
            ai = y[li] * (s - y[lj] * aj)
        elif aj > C:
            aj = C
            ai = y[li] * (s - y[lj] * aj)
        dai, daj = ai - old_ai, aj - old_aj
        if abs(dai) < TAU and abs(daj) < TAU:
            break
        alpha[li], alpha[lj] = ai, aj
        _upd_mask(li, ai)
        _upd_mask(lj, aj)
        np.multiply(YK[li], y[li] * dai, out=t1)
        np.multiply(YK[lj], y[lj] * daj, out=t2)
        np.add(t1, t2, out=t1)
        np.add(grad, t1, out=grad)              # += (y·Kᵢ)(yᵢδᵢ) + (y·Kⱼ)(yⱼδⱼ)
    return alpha, _rho_epilogue(y, alpha, grad, C)


class SVCModel:
    """One-vs-one multiclass C-SVC model (LibSVM-equivalent surface).

    Attributes mirror LibSVM's svm_model (cascade_svm/Lastcascade.java:33-104
    writes these fields): classes (ordered), support vectors, per-pair
    dual coefficients and rho, kernel params.
    """

    def __init__(self, classes, X_sv, sv_labels, pair_coefs, rhos,
                 kernel="rbf", gamma=0.0, C=1.0, sv_orig_idx=None):
        self.classes = np.asarray(classes)
        self.X_sv = np.asarray(X_sv)
        self.sv_labels = np.asarray(sv_labels)
        self.pair_coefs = pair_coefs  # {(ci,cj): (idx_into_sv, coef)} with ci<cj
        self.rhos = rhos              # {(ci,cj): rho}
        self.kernel = kernel
        self.gamma = gamma
        self.C = C
        # positions of the SVs in the training arrays (M2: sv_indices,
        # cascade_svm/Midcascade.java:123-128) — caller-relative
        self.sv_orig_idx = (np.asarray(sv_orig_idx)
                            if sv_orig_idx is not None else None)

    @property
    def n_sv(self) -> int:
        return len(self.X_sv)

    def decision_pair(self, K_sv: np.ndarray, pair) -> np.ndarray:
        idx, coef = self.pair_coefs[pair]
        return K_sv[:, idx] @ coef - self.rhos[pair]

    def predict(self, X: np.ndarray) -> np.ndarray:
        """OvO vote; ties → lowest class index (LibSVM's argmax-first)."""
        if len(X) == 0:
            return np.empty(0, dtype=self.classes.dtype)
        K_sv = KERNELS[self.kernel](np.asarray(X, dtype=np.float64),
                                    self.X_sv, self.gamma)
        k = len(self.classes)
        votes = np.zeros((len(X), k), dtype=np.int64)
        for a in range(k):
            for b in range(a + 1, k):
                d = self.decision_pair(K_sv, (a, b))
                votes[:, a] += d > 0
                votes[:, b] += ~(d > 0)
        return self.classes[np.argmax(votes, axis=1)]

    def to_dict(self) -> dict:
        return {
            "classes": self.classes.tolist(),
            "X_sv": self.X_sv.tolist(),
            "sv_labels": self.sv_labels.tolist(),
            "pair_coefs": {f"{a},{b}": [idx.tolist(), coef.tolist()]
                           for (a, b), (idx, coef) in self.pair_coefs.items()},
            "rhos": {f"{a},{b}": r for (a, b), r in self.rhos.items()},
            "kernel": self.kernel, "gamma": self.gamma, "C": self.C,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "SVCModel":
        pair_coefs = {tuple(map(int, k.split(","))):
                      (np.asarray(v[0], dtype=np.int64),
                       np.asarray(v[1], dtype=np.float64))
                      for k, v in d["pair_coefs"].items()}
        rhos = {tuple(map(int, k.split(","))): float(v)
                for k, v in d["rhos"].items()}
        return cls(np.asarray(d["classes"]),
                   np.asarray(d["X_sv"], dtype=np.float64),
                   np.asarray(d["sv_labels"]), pair_coefs, rhos,
                   d["kernel"], d["gamma"], d["C"])


def train_svc(X: np.ndarray, y: np.ndarray, C: float = 1.0,
              gamma: float | str | None = None, kernel: str = "rbf",
              eps: float = 1e-3) -> SVCModel:
    """Train one-vs-one C-SVC (reference defaults: C=1, γ=1/n_features,
    eps=1e-3 — cascade_svm/Midcascade.java:62-81).

    gamma: numeric, None → 1/n_features (the reference's
    γ=1/max_feature_index, Midcascade.java:70), or "scale" →
    1/(n_features·Var[X]) — needed when features are unit-normalized
    (then pairwise ‖a−b‖²≈2 and 1/n_features makes the kernel nearly
    constant).

    Classes are ordered by sorted value (LibSVM orders by first
    appearance; sorted is deterministic under any partitioning —
    documented semantic delta, SURVEY §7).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y)
    if gamma is None:
        gamma = 1.0 / X.shape[1]
    elif gamma == "scale":
        v = float(X.var())
        gamma = 1.0 / (X.shape[1] * v) if v > 0 else 1.0 / X.shape[1]
    classes = np.unique(y)  # sorted
    kern = KERNELS[kernel]
    K_full = kern(X, X, gamma)

    sv_mask = np.zeros(len(y), dtype=bool)
    raw = {}
    for a in range(len(classes)):
        for b in range(a + 1, len(classes)):
            sel = np.flatnonzero((y == classes[a]) | (y == classes[b]))
            ys = np.where(y[sel] == classes[a], 1.0, -1.0)
            Ks = K_full[np.ix_(sel, sel)]
            alpha, rho = smo_solve(Ks, ys, C=C, eps=eps)
            nz = alpha > TAU
            raw[(a, b)] = (sel[nz], alpha[nz] * ys[nz], rho)
            sv_mask[sel[nz]] = True

    sv_idx = np.flatnonzero(sv_mask)          # ascending original order
    pos_of = {orig: p for p, orig in enumerate(sv_idx)}
    pair_coefs, rhos = {}, {}
    for pair, (orig_idx, coef, rho) in raw.items():
        pair_coefs[pair] = (np.asarray([pos_of[i] for i in orig_idx],
                                       dtype=np.int64),
                            np.asarray(coef, dtype=np.float64))
        rhos[pair] = float(rho)
    return SVCModel(classes, X[sv_idx], y[sv_idx], pair_coefs, rhos,
                    kernel=kernel, gamma=gamma, C=C, sv_orig_idx=sv_idx)
