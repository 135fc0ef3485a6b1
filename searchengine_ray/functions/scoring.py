"""Scoring kernels — used by BOTH the serving path (state/shards.py) and
the brute-force oracle (oracle.py), so the floating-point expression shape
is identical by construction and rank-identity is well-defined.

Two modes:
- "bm25": the north-star scorer. k1=1.2, b=0.75, Lucene idf
  ln(1 + (N - df + 0.5)/(df + 0.5)); multiplied by query-term multiplicity
  qtf (the reference weights repeated query words the same way,
  /root/reference/Engine/Engine/Engine.cs:139,162,172).
- "reference": the reference Engine's exact formula (SURVEY.md §1.3.4):
  title posting: 100 * tf * qtf (TitleScore const, Engine.cs:18,162);
  body posting:  qtf * tf * (N / cf)   (tf/r_mean with r_mean=cf/N, Engine.cs:151,172).

Tie-break everywhere: score desc, then doc_id asc (the deterministic
version of the reference's stable orderby over CRC-ascending enumeration,
Engine.cs:176-179).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75
TITLE_SCORE = 100.0  # /root/reference/Engine/Engine/Engine.cs:18


def round6(x):
    """Half-up rounding to 6 decimals, formula-identical to the SQL oracle's
    floor(x*1000000 + 0.5)/1000000 (np.round is half-to-even, DuckDB round
    is half-away — both would hash-mismatch on exact .5 boundaries)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def bm25_idf(df: float, n_docs: float) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def bm25_term_scores(
    tf: np.ndarray, dl: np.ndarray, idf: float, qtf: float, avgdl: float
) -> np.ndarray:
    """Per-posting BM25 contribution. tf/dl are integer arrays; float64 out.

    Expression shape (keep in sync with the DuckDB oracle SQL):
      (qtf * idf) * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))
    """
    tff = tf.astype(np.float64)
    dlf = dl.astype(np.float64)
    return (qtf * idf) * (tff / (tff + K1 * (1.0 - B + B * (dlf / avgdl))))


def ref_body_term_scores(tf: np.ndarray, qtf: float, n_docs: float, cf: float) -> np.ndarray:
    """Reference body contribution: (tf / r_mean) * qtf with r_mean = cf/N
    == (tf * qtf) * (N / cf)."""
    return (tf.astype(np.float64) * qtf) * (n_docs / cf)


def ref_title_term_scores(tf: np.ndarray, qtf: float) -> np.ndarray:
    """Reference title contribution: 100 * tf * qtf."""
    return TITLE_SCORE * tf.astype(np.float64) * qtf


def topk_by_score(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, doc_id asc); deterministic."""
    if len(doc_ids) == 0:
        return doc_ids[:0], scores[:0]
    if len(doc_ids) > k * 8:  # partial-select before full sort
        idx = np.argpartition(-scores, min(k, len(scores) - 1))[: max(k * 2, k)]
        # argpartition on score alone may split a tie group; widen by the
        # boundary score to keep tie-break exact
        boundary = scores[idx].min()
        idx = np.flatnonzero(scores >= boundary)
    else:
        idx = np.arange(len(doc_ids))
    order = np.lexsort((doc_ids[idx], -scores[idx]))[:k]
    sel = idx[order]
    return doc_ids[sel], scores[sel]
