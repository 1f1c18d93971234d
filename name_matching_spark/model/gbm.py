"""Pure-numpy gradient-boosted decision trees (binary logloss).

Replaces the reference's LGBMClassifier (train_model.py:155-237 in
vietexob/name-matching) in an environment with no ML libraries.  Standard
second-order boosting: per-node exact greedy splits on pre-sorted features
with gradient/hessian prefix sums (the published XGBoost objective), shallow
trees, shrinkage.  The fitted model is a set of flat arrays — cheap to
broadcast to executors and to evaluate vectorized over Arrow batches.

Training data here is ~45k rows x 8 features, so driver-side fitting in
numpy is the right scale choice (same call the reference makes by fitting
sklearn on a pandas frame); only *inference* is distributed.
"""

from __future__ import annotations

import json

import numpy as np


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


class _Tree:
    """Flat-array binary tree: feature[i] < 0 marks a leaf with value[i]."""

    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self):
        self.feature: list[int] = []
        self.threshold: list[float] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.value: list[float] = []

    def _new_node(self) -> int:
        self.feature.append(-1)
        self.threshold.append(0.0)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(0.0)
        return len(self.feature) - 1

    def predict(self, X: np.ndarray) -> np.ndarray:
        feat = np.asarray(self.feature)
        thr = np.asarray(self.threshold)
        left = np.asarray(self.left)
        right = np.asarray(self.right)
        val = np.asarray(self.value)
        node = np.zeros(len(X), dtype=np.int64)
        # Depth-bounded vectorized descent.
        for _ in range(64):
            f = feat[node]
            active = f >= 0
            if not active.any():
                break
            fx = X[np.arange(len(X)), np.where(active, f, 0)]
            go_left = fx <= thr[node]
            nxt = np.where(go_left, left[node], right[node])
            node = np.where(active, nxt, node)
        return val[node]


class GBMClassifier:
    def __init__(
        self,
        n_estimators: int = 300,
        learning_rate: float = 0.1,
        max_depth: int = 4,
        min_child_weight: float = 1.0,
        reg_lambda: float = 1.0,
        min_gain: float = 1e-6,
    ):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.min_child_weight = min_child_weight
        self.reg_lambda = reg_lambda
        self.min_gain = min_gain
        self.base_score = 0.0
        self.trees: list[_Tree] = []
        # Optional serving contract: the feature-column names (in order)
        # the model was fitted on.  Set by model.train.train() before
        # save; load_artifacts() enforces append-only evolution against
        # the current features.FEATURE_COLS.
        self.feature_cols: list[str] | None = None

    # -- training -------------------------------------------------------------

    def fit(
        self,
        X: np.ndarray,
        y: np.ndarray,
        verbose_every: int = 0,
        sample_weight: np.ndarray | None = None,
    ) -> "GBMClassifier":
        """``sample_weight`` scales each row's gradient/hessian (standard
        second-order weighting, as in XGBoost/LightGBM): a row at weight w
        contributes w times the loss of an unweighted row.  None = all 1."""
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if sample_weight is None:
            w = np.ones(len(y), dtype=np.float64)
        else:
            w = np.asarray(sample_weight, dtype=np.float64)
            if w.shape != y.shape:
                raise ValueError(f"sample_weight shape {w.shape} != y shape {y.shape}")
        p0 = np.clip(np.average(y, weights=w), 1e-6, 1 - 1e-6)
        self.base_score = float(np.log(p0 / (1 - p0)))
        margin = np.full(len(y), self.base_score)
        # Pre-sort every feature once; nodes reuse the global order.
        order = np.argsort(X, axis=0, kind="stable")
        self.trees = []
        self._packed_n = -1  # invalidate any packed forest from a prior fit
        for t in range(self.n_estimators):
            p = _sigmoid(margin)
            g = (p - y) * w
            h = np.maximum(p * (1.0 - p), 1e-12) * w
            tree = _Tree()
            self._build_node(tree, X, g, h, np.arange(len(y)), order, depth=0)
            self.trees.append(tree)
            margin += self.learning_rate * tree.predict(X)
            if verbose_every and (t + 1) % verbose_every == 0:
                loss = -np.mean(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12))
                print(f"tree {t + 1}/{self.n_estimators} logloss={loss:.6f}")
        return self

    def _build_node(self, tree, X, g, h, idx, order, depth) -> int:
        node = tree._new_node()
        G, H = g[idx].sum(), h[idx].sum()
        leaf_val = -G / (H + self.reg_lambda)
        if depth >= self.max_depth or len(idx) < 2:
            tree.value[node] = leaf_val
            return node
        best = None
        parent_score = G * G / (H + self.reg_lambda)
        in_node = np.zeros(X.shape[0], dtype=bool)
        in_node[idx] = True
        for f in range(X.shape[1]):
            ordered = order[:, f][in_node[order[:, f]]]
            vals = X[ordered, f]
            gc = np.cumsum(g[ordered])
            hc = np.cumsum(h[ordered])
            # Splits only between distinct consecutive values.
            cut = np.nonzero(vals[:-1] < vals[1:])[0]
            if len(cut) == 0:
                continue
            Gl, Hl = gc[cut], hc[cut]
            Gr, Hr = G - Gl, H - Hl
            ok = (Hl >= self.min_child_weight) & (Hr >= self.min_child_weight)
            if not ok.any():
                continue
            gain = (
                Gl * Gl / (Hl + self.reg_lambda)
                + Gr * Gr / (Hr + self.reg_lambda)
                - parent_score
            )
            gain[~ok] = -np.inf
            k = int(np.argmax(gain))
            if gain[k] > self.min_gain and (best is None or gain[k] > best[0]):
                thr = 0.5 * (vals[cut[k]] + vals[cut[k] + 1])
                best = (float(gain[k]), f, thr)
        if best is None:
            tree.value[node] = leaf_val
            return node
        _, f, thr = best
        go_left = X[idx, f] <= thr
        li = self._build_node(tree, X, g, h, idx[go_left], order, depth + 1)
        ri = self._build_node(tree, X, g, h, idx[~go_left], order, depth + 1)
        tree.feature[node] = f
        tree.threshold[node] = thr
        tree.left[node] = li
        tree.right[node] = ri
        return node

    # -- inference --------------------------------------------------------------

    def _pack(self) -> None:
        """Precompute, per tree, the root-to-leaf path decomposition:
        every leaf becomes (value, [(feature, threshold, is_left), ...]).
        Shallow trees (depth <= 4-ish) then evaluate as a handful of
        full-column compares + boolean ANDs on contiguous arrays — which
        beats pointer-chasing gathers on memory-bandwidth-starved hosts."""
        packed = []
        for tree in self.trees:
            leaves: list = []
            stack: list = [(0, [])]
            while stack:
                node, path = stack.pop()
                f = tree.feature[node]
                if f < 0:
                    leaves.append((tree.value[node], path))
                else:
                    thr = tree.threshold[node]
                    stack.append((tree.left[node], path + [(f, thr, True)]))
                    stack.append((tree.right[node], path + [(f, thr, False)]))
            # The comparison (feature, thr, side) triples reused across
            # leaves of one tree are deduped: compute each cond once.
            conds: dict = {}
            for _, path in leaves:
                for f, thr, _left in path:
                    conds.setdefault((f, thr), len(conds))
            packed.append((leaves, list(conds)))
        self._leafpack = packed
        self._packed_n = len(self.trees)

    def predict_margin(self, X: np.ndarray) -> np.ndarray:
        """Raw additive margin (pre-sigmoid log-odds).  The sigmoid
        SATURATES above ~0.99 probability — thousands of pairs collapse
        onto 0.9999+ — while the margin keeps ranking them; cluster
        refinement uses it where probability carries no signal."""
        X = np.ascontiguousarray(X, dtype=np.float64)
        n = len(X)
        if not self.trees:
            return np.full(n, self.base_score)
        if getattr(self, "_packed_n", -1) != len(self.trees):
            self._pack()
        cols = [np.ascontiguousarray(X[:, j]) for j in range(X.shape[1])]
        margin = np.full(n, self.base_score)
        lr = self.learning_rate
        for leaves, cond_keys in self._leafpack:
            cond_cache = {k: cols[k[0]] <= k[1] for k in cond_keys}
            for value, path in leaves:
                mask = None
                for f, thr, left in path:
                    c = cond_cache[(f, thr)]
                    term = c if left else ~c
                    mask = term if mask is None else (mask & term)
                contrib = lr * value
                if mask is None:  # single-leaf tree
                    margin += contrib
                else:
                    margin[mask] += contrib
        return margin

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return _sigmoid(self.predict_margin(X))

    # -- (de)serialization --------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "base_score": self.base_score,
                "learning_rate": self.learning_rate,
                **(
                    {"feature_cols": self.feature_cols}
                    if self.feature_cols is not None
                    else {}
                ),
                "trees": [
                    {
                        "feature": t.feature,
                        "threshold": t.threshold,
                        "left": t.left,
                        "right": t.right,
                        "value": t.value,
                    }
                    for t in self.trees
                ],
            }
        )

    @classmethod
    def from_json(cls, payload: str) -> "GBMClassifier":
        obj = json.loads(payload)
        model = cls(learning_rate=obj["learning_rate"])
        model.base_score = obj["base_score"]
        model.feature_cols = obj.get("feature_cols")
        model.trees = []
        for td in obj["trees"]:
            t = _Tree()
            t.feature = td["feature"]
            t.threshold = td["threshold"]
            t.left = td["left"]
            t.right = td["right"]
            t.value = td["value"]
            model.trees.append(t)
        return model
