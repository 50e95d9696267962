"""Numpy-only histogram gradient-boosted regression trees.

A real (nonlinear, interaction-capturing) learner with the sklearn
estimator contract, so the M3 booster path — CV folds → collect-sample
fit → broadcast → ``mapInPandas`` score → M6 quality gate — runs
end-to-end numerically in this container, where xgboost/lightgbm are not
installed. The algorithm is the standard histogram GBM the real
backends implement (quantile binning, per-node gradient histograms,
gain = G_L²/(n_L+λ) + G_R²/(n_R+λ) − G²/(n+λ), shrinkage), scoped to
squared loss and depth-wise growth; it is a production-shaped learner,
not a test double (`tests/test_boosters.py` keeps the linear stub for
plumbing-only tests).

Reference parity note: the reference trains XGB/LGBM single-node on the
sampled frame (`setup/training.py:68-139`); this class slots into the
exact same ``model_factory`` seam (`ml/boosters.py`) with the same
fit/predict surface, and the real backends still activate by import.
"""

from __future__ import annotations

import numpy as np

_LEAF = -1  # sentinel in the feature column of the node table


class NumpyHistGBM:
    """Histogram GBM for regression (squared loss).

    Parameters mirror the xgboost/lightgbm names the booster configs
    use, so paper-parameter dicts can be passed through where they
    apply: ``n_estimators``, ``learning_rate``, ``max_depth``,
    ``max_bin``, ``min_child_weight`` (min samples per leaf),
    ``reg_lambda``.
    """

    def __init__(
        self,
        n_estimators: int = 100,
        learning_rate: float = 0.1,
        max_depth: int = 4,
        max_bin: int = 64,
        min_child_weight: int = 5,
        reg_lambda: float = 1.0,
        **_ignored,  # accepts-and-ignores backend-specific params (n_jobs…)
    ):
        self.n_estimators = int(n_estimators)
        self.learning_rate = float(learning_rate)
        self.max_depth = int(max_depth)
        self.max_bin = int(max_bin)
        self.min_child_weight = int(min_child_weight)
        self.reg_lambda = float(reg_lambda)

    # sklearn contract used by the booster plumbing
    def set_params(self, **kw):
        for k, v in kw.items():
            if hasattr(self, k):
                setattr(self, k, v)
        return self

    def get_params(self, deep: bool = True) -> dict:
        return {
            k: getattr(self, k)
            for k in (
                "n_estimators",
                "learning_rate",
                "max_depth",
                "max_bin",
                "min_child_weight",
                "reg_lambda",
            )
        }

    # -- binning ------------------------------------------------------------

    def _fit_bins(self, X: np.ndarray) -> None:
        qs = np.linspace(0.0, 1.0, self.max_bin + 1)[1:-1]
        self.bin_edges_ = []
        for j in range(X.shape[1]):
            col = X[:, j]
            finite = col[~np.isnan(col)]
            if finite.size == 0:
                self.bin_edges_.append(np.empty(0))
            else:
                self.bin_edges_.append(np.unique(np.quantile(finite, qs)))

    def _bin(self, X: np.ndarray) -> np.ndarray:
        """Bin values; NaN gets its OWN bin past the value bins (the
        lightgbm/xgboost missing-value treatment: splits can separate
        missing from any value range instead of NaN silently collapsing
        the quantile edges, which would discard the whole feature)."""
        cols = []
        for j in range(X.shape[1]):
            edges = self.bin_edges_[j]
            col = X[:, j]
            b = np.searchsorted(edges, col, side="right")
            b[np.isnan(col)] = len(edges) + 1  # dedicated missing bin
            cols.append(b)
        return np.stack(cols, axis=1).astype(np.int32)

    # -- tree construction --------------------------------------------------

    def _build_tree(self, Xb: np.ndarray, resid: np.ndarray) -> np.ndarray:
        """Depth-wise greedy tree on binned features. Returns a node table
        (n_nodes, 5) float64: [feature, threshold_bin, left, right,
        miss_left] for splits, [_LEAF, value, -1, -1, 0] for leaves.

        Missing values get a LEARNED default direction, like the real
        backends: every candidate threshold is scored twice — missing
        bin folded left and folded right — and the better side is stored
        in ``miss_left`` (ties prefer right, the historical behavior)."""
        n_features = Xb.shape[1]
        lam = self.reg_lambda
        nodes: list[list[float]] = []

        def leaf(idx: np.ndarray) -> int:
            value = resid[idx].sum() / (len(idx) + lam)
            nodes.append([_LEAF, value, -1, -1, 0.0])
            return len(nodes) - 1

        def grow(idx: np.ndarray, depth: int) -> int:
            n = len(idx)
            if depth >= self.max_depth or n < 2 * self.min_child_weight:
                return leaf(idx)
            g = resid[idx]
            G = g.sum()
            score_parent = G * G / (n + lam)
            best = None  # (gain, feature, threshold_bin, miss_left)
            for j in range(n_features):
                nb = len(self.bin_edges_[j]) + 2  # value bins + missing bin
                if len(self.bin_edges_[j]) == 0:
                    continue  # constant or all-missing feature: no split
                b = Xb[idx, j]
                gh = np.bincount(b, weights=g, minlength=nb)
                ch = np.bincount(b, minlength=nb)
                g_miss, c_miss = gh[nb - 1], ch[nb - 1]
                # thresholds run over value bins only (the missing bin is
                # last and never crossed by <= t); default-right keeps
                # missing on the right, default-left folds it into GL
                GL = np.cumsum(gh)[:-1]
                NL = np.cumsum(ch)[:-1]
                for miss_left in (0, 1) if c_miss else (0,):
                    GLd = GL + (g_miss if miss_left else 0.0)
                    NLd = NL + (c_miss if miss_left else 0)
                    NRd = n - NLd
                    ok = (NLd >= self.min_child_weight) & (
                        NRd >= self.min_child_weight
                    )
                    if not ok.any():
                        continue
                    GRd = G - GLd
                    gain = (
                        GLd * GLd / (NLd + lam)
                        + GRd * GRd / (NRd + lam)
                        - score_parent
                    )
                    gain = np.where(ok, gain, -np.inf)
                    t = int(np.argmax(gain))
                    if gain[t] > 1e-12 and (best is None or gain[t] > best[0]):
                        best = (float(gain[t]), j, t, miss_left)
            if best is None:
                return leaf(idx)
            _, j, t, miss_left = best
            b = Xb[idx, j]
            nb = len(self.bin_edges_[j]) + 2
            mask = (b <= t) | ((b == nb - 1) & bool(miss_left))
            me = len(nodes)
            nodes.append([j, t, -1, -1, float(miss_left)])  # patched below
            left = grow(idx[mask], depth + 1)
            right = grow(idx[~mask], depth + 1)
            nodes[me][2], nodes[me][3] = left, right
            return me

        grow(np.arange(len(resid)), 0)
        return np.asarray(nodes, dtype=np.float64)

    def _predict_tree(self, tree: np.ndarray, Xb: np.ndarray) -> np.ndarray:
        out = np.empty(len(Xb))
        miss_bin = self._miss_bin_per_feature()
        # vectorized level walk: every row tracks its current node id
        node = np.zeros(len(Xb), dtype=np.int64)
        active = np.arange(len(Xb))
        while active.size:
            nd = tree[node[active]]
            is_leaf = nd[:, 0] == _LEAF
            done = active[is_leaf]
            out[done] = nd[is_leaf, 1]
            live = active[~is_leaf]
            nd = nd[~is_leaf]
            feat = nd[:, 0].astype(np.int64)
            vals = Xb[live, feat]
            is_missing = vals == miss_bin[feat]
            go_left = np.where(is_missing, nd[:, 4] == 1.0, vals <= nd[:, 1])
            node[live] = np.where(go_left, nd[:, 2], nd[:, 3]).astype(np.int64)
            active = live
        return out

    def _miss_bin_per_feature(self) -> np.ndarray:
        return np.array(
            [len(e) + 1 for e in self.bin_edges_], dtype=np.int64
        )

    # -- public API ---------------------------------------------------------

    def fit(self, X, y) -> "NumpyHistGBM":
        X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
        y = np.asarray(y, dtype=np.float64)
        if X.ndim != 2 or len(X) != len(y):
            raise ValueError(f"bad shapes X{X.shape} y{y.shape}")
        self._fit_bins(X)
        Xb = self._bin(X)
        self.base_score_ = float(y.mean())
        pred = np.full(len(y), self.base_score_)
        self.trees_ = []
        for _ in range(self.n_estimators):
            resid = y - pred
            tree = self._build_tree(Xb, resid)
            self.trees_.append(tree)
            pred += self.learning_rate * self._predict_tree(tree, Xb)
            if len(tree) == 1:  # pure leaf — residuals exhausted
                break
        return self

    def predict(self, X) -> np.ndarray:
        X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
        Xb = self._bin(X)
        out = np.full(len(X), self.base_score_)
        for tree in self.trees_:
            out += self.learning_rate * self._predict_tree(tree, Xb)
        return out
