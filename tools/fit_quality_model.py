#!/usr/bin/env python3
"""Offline fit of the model-based quality filter's weights (VERDICT r6
#6). Run:

    python3 tools/fit_quality_model.py [sf_dir]

Computes the five integer-snapped features (the ORACLE formulation, via
DuckDB — identical by construction to the Spark lane) and the Gopher
rule pack's pass verdict as pseudo-labels, then fits a full-batch
logistic regression with DETERMINISTIC settings: zero init, fixed
learning rate 0.5 on z-scored features, exactly 3000 steps, float64.
The fitted coefficients are converted back to raw-feature space and
scaled/rounded to the INTEGER weights the query embeds as literals
(micro-unit features x small integer weights -> exact BIGINT logit).

Prints the _QM_W dict to paste into queries/llm_ops.py plus train-set
precision/recall vs the pseudo-labels. Re-running reproduces the same
numbers bit-for-bit (numpy full-batch ops, no randomness).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import uts_spark.registry  # noqa: F401,E402  (registry first: import trap)
from uts_spark.queries.llm_ops import (  # noqa: E402
    _duck_gopher,
    _duck_quality_model_features,
)

FEATS = ["x_len", "x_stop", "x_mwl", "x_ttr", "x_rep"]


def fit(sf_dir: str) -> tuple[dict, dict]:
    """Deterministic fit; returns (weights_dict, stats). The weights
    embedded in queries/llm_ops._QM_W must reproduce from this exactly
    (pinned in tests/test_llm_ops.py — weight provenance, not vibes)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    df = con.sql(
        f"""WITH {_duck_quality_model_features()},
        g AS ({_duck_gopher()})
        SELECT qf.*, g.gopher_pass
        FROM qf JOIN g USING (doc_id) ORDER BY doc_id"""
    ).df()

    X = df[FEATS].to_numpy(dtype=np.float64)
    y = df["gopher_pass"].to_numpy(dtype=np.float64)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Z = (X - mu) / sd

    # deterministic full-batch logistic regression
    w = np.zeros(Z.shape[1])
    b = 0.0
    lr, steps = 0.5, 3000
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g_w = Z.T @ (p - y) / len(y)
        g_b = float(np.mean(p - y))
        w -= lr * g_w
        b -= lr * g_b

    # back to raw-feature space: logit = b' + sum(w'_i * x_i)
    w_raw = w / sd
    b_raw = b - float((w * (mu / sd)).sum())

    # integer scaling: choose S so the smallest |weight| lands >= 1
    # after rounding; features are ~1e6-scale, so S ~ 1e6/|w| keeps
    # products within BIGINT comfortably
    s = 1.0 / np.abs(w_raw[np.abs(w_raw) > 0]).min()
    w_int = {f: int(round(float(wr * s))) for f, wr in zip(FEATS, w_raw)}
    w0 = int(round(b_raw * s))

    logit = w0 + (df[FEATS].to_numpy(dtype=np.int64) * np.array(
        [w_int[f] for f in FEATS], dtype=np.int64)).sum(axis=1)
    pred = logit >= 0
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    weights = {"w0": w0, **w_int}
    stats = {
        "precision": tp / max(tp + fp, 1),
        "recall": tp / max(tp + fn, 1),
        "n": len(y),
        "pos": int(y.sum()),
    }
    return weights, stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    weights, stats = fit(sf_dir)
    print("_QM_W = {")
    for key, val in weights.items():
        print(f'    "{key}": {val},')
    print("}")
    print(f"# train precision={stats['precision']:.4f} "
          f"recall={stats['recall']:.4f} "
          f"n={stats['n']} pos={stats['pos']}")


if __name__ == "__main__":
    main()
