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
              eps: float = 1e-3, max_iter: int | None = None):
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
    """
    n = len(y)
    if max_iter is None:
        max_iter = max(10_000, min(100 * n, 250_000))
    alpha = np.zeros(n)
    grad = -np.ones(n)          # ∇f(α) = Qα − e, α=0 ⇒ −e
    yQ = y[:, None] * K * y[None, :]  # Q (small n — see module docstring)
    y_pos = y > 0
    Kdiag = np.ascontiguousarray(np.diag(K))
    NEG_INF, POS_INF = -np.inf, np.inf

    for _ in range(max_iter):
        yg = -y * grad
        # feasible-direction masks as single fused selects
        up = np.where(y_pos, alpha < C, alpha > 0.0)
        low = np.where(y_pos, alpha > 0.0, alpha < C)
        yg_up = np.where(up, yg, NEG_INF)
        i = int(np.argmax(yg_up))
        m = yg_up[i]
        if m == NEG_INF:
            break
        yg_low = np.where(low, yg, POS_INF)
        M = yg_low.min()
        if M == POS_INF or m - M < eps:
            break
        # second-order j selection among violators, full-row vectorized
        b = m - yg
        a = Kdiag[i] + Kdiag - (2.0 * y[i]) * (y * K[i])
        np.maximum(a, TAU, out=a)
        obj = np.where(low & (b > TAU), -(b * b) / a, POS_INF)
        j = int(np.argmin(obj))
        if obj[j] == POS_INF:
            break

        # two-variable analytic update (keep yᵀα constant, box-clip)
        quad = max(K[i, i] + K[j, j] - 2.0 * y[i] * y[j] * K[i, j], TAU)
        delta = (m - yg[j]) / quad  # step along (y_i e_i − y_j e_j)
        old_ai, old_aj = alpha[i], alpha[j]
        ai = old_ai + y[i] * delta
        aj = old_aj - y[j] * delta
        # clip to the box while preserving the equality constraint
        s = y[i] * old_ai + y[j] * old_aj
        ai = min(max(ai, 0.0), C)
        aj = y[j] * (s - y[i] * ai)
        if aj < 0.0:
            aj = 0.0
            ai = y[i] * (s - y[j] * aj)
        elif aj > C:
            aj = C
            ai = y[i] * (s - y[j] * aj)
        dai, daj = ai - old_ai, aj - old_aj
        if abs(dai) < TAU and abs(daj) < TAU:
            break
        alpha[i], alpha[j] = ai, aj
        grad += yQ[:, i] * dai + yQ[:, j] * daj

    # rho: average of y∇f over free SVs, else midpoint (LibSVM's calculate_rho)
    yg = y * grad
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
