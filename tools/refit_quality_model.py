#!/usr/bin/env python3
"""Quality-model REFIT harness with a held-out-F1 swap gate (ROADMAP
r8: frozen weights must never be swapped on vibes). Run:

    python3 tools/refit_quality_model.py [sf_dir]

Protocol:

- deterministic split: ``doc_id % 5 == 0`` -> HOLDOUT, else TRAIN;
- TWO label sources (``--labels``): ``gopher`` (the original fit's
  pseudo-labels — the Gopher rule pack, a FUNCTION of the five
  incumbent features, so the gate is structurally un-winnable there:
  the incumbent already encodes the labels; VERDICT r9 "what's
  missing" #2) and ``xent`` (round 10 — labels with signal OUTSIDE
  the feature set: a doc is labeled quality iff its BIGRAM-LM
  cross-entropy against a TRAIN-only add-one model sits at or below
  the TRAIN median; sequence-aware perplexity is correlated with but
  not derivable from the five surface features, so incumbent and
  candidates genuinely differ and the gate makes a real decision);
- INCUMBENT: the shipped ``_QM_W`` integer literals, scored on the
  holdout as-is;
- CANDIDATE refit: same five features, refit on TRAIN ONLY with the
  exact deterministic recipe of tools/fit_quality_model.py;
- CANDIDATE expanded: six features — the five plus ``x_xent``, the
  integer-snapped per-doc unigram cross-entropy against a TRAIN-corpus
  unigram model (holdout terms unseen in train get add-half-smoothed
  surprise; the model is train-only, so there is no label/feature
  leakage into the holdout);
- SWAP GATE: recommend swapping the frozen weights ONLY if a
  candidate's holdout F1 STRICTLY exceeds the incumbent's. The
  decision record prints as one JSON line; the refit weights print
  only when the gate passes (they are what a human pastes into
  ``_QM_W`` / a ``_QM_W6`` literal after review).

Everything is deterministic (full-batch float64, zero init, fixed
steps, no RNG): re-running reproduces the decision bit-for-bit. The
harness is offline tooling — the SHIPPED lanes keep their frozen
integer weights until a gate-passing refit is reviewed in.
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import uts_spark.registry  # noqa: F401,E402  (registry first: import trap)
from uts_spark.functions.text import LOG_SCALE  # noqa: E402
from uts_spark.queries.llm_ops import (  # noqa: E402
    _QM_W,
    _duck_gopher,
    _duck_quality_model_features,
)

FEATS5 = ["x_len", "x_stop", "x_mwl", "x_ttr", "x_rep"]
FEATS6 = FEATS5 + ["x_xent"]

# label SQL per mode: a boolean `label` column per doc_id.
# xent mode: bigram cross-entropy per doc against the TRAIN-corpus
# add-one-smoothed conditional model (same integer-snapped kernel as
# the text_bigram_xent lane, restricted to train counts), thresholded
# at the TRAIN-median integer rate — holdout labels use the SAME
# train-fitted model + threshold, so nothing leaks from holdout.


def _label_sql(mode: str) -> str:
    if mode == "gopher":
        return "SELECT doc_id, gopher_pass AS label FROM g"
    from uts_spark.functions.text import duck_tokens, duck_word_ngrams

    toks = duck_tokens("text")
    return f"""
        SELECT doc_id,
               xe_rate <= (SELECT CAST(ROUND(MEDIAN(xe_rate)) AS BIGINT)
                           FROM xe_bg WHERE doc_id % 5 != 0) AS label
        FROM xe_bg"""


def _xent_label_ctes() -> str:
    from uts_spark.functions.text import duck_tokens, duck_word_ngrams

    toks = duck_tokens("text")
    return f"""
        lt AS (SELECT doc_id, {toks} AS toks FROM documents),
        lbg AS (SELECT doc_id, unnest({duck_word_ngrams('toks', 2)}) AS bigram
                FROM lt),
        lbf AS (SELECT doc_id, bigram, COUNT(*) AS bf FROM lbg
                GROUP BY doc_id, bigram),
        lc12 AS (SELECT bigram, SUM(bf) AS c12 FROM lbf
                 WHERE doc_id % 5 != 0 GROUP BY bigram),
        luni AS (SELECT unnest(toks) AS term FROM lt WHERE doc_id % 5 != 0),
        lc1 AS (SELECT term, COUNT(*) AS c1 FROM luni GROUP BY term),
        lv AS (SELECT COUNT(*) AS vocab FROM lc1),
        xe_bg AS (
          SELECT lbf.doc_id,
                 CAST(ROUND(SUM(lbf.bf * CAST(ROUND(
                     -LN((CAST(COALESCE(lc12.c12, 0) AS DOUBLE) + 1)
                         / (COALESCE(lc1.c1, 0) + lv.vocab))
                     * {LOG_SCALE}) AS BIGINT)) / SUM(lbf.bf)) AS BIGINT)
                   AS xe_rate
          FROM lbf
          LEFT JOIN lc12 ON lc12.bigram = lbf.bigram
          LEFT JOIN lc1 ON lc1.term = split_part(lbf.bigram, ' ', 1)
          CROSS JOIN lv
          GROUP BY lbf.doc_id
        )"""


def _features(sf_dir: str, labels: str = "gopher"):
    """Per-doc features + pseudo-label + split flag. x_xent uses a
    TRAIN-ONLY unigram model (add-half smoothing for unseen terms)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    label_ctes = (
        "" if labels == "gopher" else "," + _xent_label_ctes()
    )
    return con.sql(
        f"""WITH {_duck_quality_model_features()},
        g AS ({_duck_gopher()}){label_ctes},
        t AS (SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS term
              FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t
               GROUP BY doc_id, term),
        ct AS (SELECT term, SUM(tf) AS ct FROM tf
               WHERE doc_id % 5 != 0 GROUP BY term),
        tot AS (SELECT SUM(ct) AS tot FROM ct),
        xe AS (
          SELECT f.doc_id,
                 CAST(ROUND(SUM(f.tf * CAST(ROUND(
                     -LN(CAST(COALESCE(c.ct, 0.5) AS DOUBLE) / t.tot)
                     * {LOG_SCALE}) AS BIGINT)) / SUM(f.tf)) AS BIGINT)
                   AS x_xent
          FROM tf f LEFT JOIN ct c USING (term) CROSS JOIN tot t
          GROUP BY f.doc_id
        ),
        lab AS ({_label_sql(labels)})
        SELECT qf.*, COALESCE(xe.x_xent, 0) AS x_xent,
               lab.label AS gopher_pass,
               (qf.doc_id % 5 = 0) AS holdout
        FROM qf JOIN g USING (doc_id)
        JOIN lab USING (doc_id)
        LEFT JOIN xe USING (doc_id)
        ORDER BY doc_id"""
    ).df()


def _fit_int(X: np.ndarray, y: np.ndarray, feats: list[str]) -> dict:
    """The deterministic recipe of tools/fit_quality_model.py,
    parameterized over the feature list: full-batch logistic
    regression on z-scores, integer weights in raw-feature space."""
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Z = (X - mu) / sd
    w = np.zeros(Z.shape[1])
    b = 0.0
    for _ in range(3000):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        w -= 0.5 * (Z.T @ (p - y) / len(y))
        b -= 0.5 * float(np.mean(p - y))
    w_raw = w / sd
    b_raw = b - float((w * (mu / sd)).sum())
    s = 1.0 / np.abs(w_raw[np.abs(w_raw) > 0]).min()
    out = {f: int(round(float(wr * s))) for f, wr in zip(feats, w_raw)}
    out["w0"] = int(round(b_raw * s))
    return out


def _f1(weights: dict, X: np.ndarray, y: np.ndarray, feats: list[str]):
    wv = np.array([weights[f] for f in feats], dtype=np.int64)
    logit = weights["w0"] + (X.astype(np.int64) * wv).sum(axis=1)
    pred = logit >= 0
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return 2 * prec * rec / max(prec + rec, 1e-12), prec, rec


def refit(sf_dir: str, labels: str = "gopher") -> dict:
    df = _features(sf_dir, labels)
    tr, ho = df[~df["holdout"]], df[df["holdout"]]
    y_tr = tr["gopher_pass"].to_numpy(dtype=np.float64)
    y_ho = ho["gopher_pass"].to_numpy(dtype=np.float64)

    f1_inc, p_inc, r_inc = _f1(
        _QM_W, ho[FEATS5].to_numpy(np.float64), y_ho, FEATS5
    )
    cand5 = _fit_int(tr[FEATS5].to_numpy(np.float64), y_tr, FEATS5)
    f1_c5, p_c5, r_c5 = _f1(
        cand5, ho[FEATS5].to_numpy(np.float64), y_ho, FEATS5
    )
    cand6 = _fit_int(tr[FEATS6].to_numpy(np.float64), y_tr, FEATS6)
    f1_c6, p_c6, r_c6 = _f1(
        cand6, ho[FEATS6].to_numpy(np.float64), y_ho, FEATS6
    )

    best_name, best_f1, best_w = max(
        [("refit5", f1_c5, cand5), ("refit6_xent", f1_c6, cand6)],
        key=lambda t: t[1],
    )
    decision = {
        "sf_dir": sf_dir,
        "labels": labels,
        "n_train": int(len(tr)),
        "n_holdout": int(len(ho)),
        "f1_incumbent": round(f1_inc, 6),
        "f1_refit5": round(f1_c5, 6),
        "f1_refit6_xent": round(f1_c6, 6),
        "swap_recommended": bool(best_f1 > f1_inc),
        "best_candidate": best_name,
    }
    if decision["swap_recommended"]:
        decision["candidate_weights"] = best_w
    return decision


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    labels = "gopher"
    for a in sys.argv[1:]:
        if a.startswith("--labels"):
            labels = a.split("=", 1)[1] if "=" in a else "xent"
    if labels not in ("gopher", "xent"):
        raise SystemExit(f"unknown --labels {labels!r} (gopher | xent)")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    print(json.dumps(refit(sf_dir, labels)))


if __name__ == "__main__":
    main()
