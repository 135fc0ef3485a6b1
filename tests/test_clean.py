"""clean_corpus verdicts on crafted inputs — exercises every reason code
(the sf fixtures have no exact-duplicate pair that passes the quality
filters, so 'dup'/'short'/'alpha' need crafted rows)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.pipelines.clean import clean_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox sleeps "
    "while the dog watches the quiet field in the morning light"
)


def _write_documents(tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_clean_corpus_reasons(tmp_path, ray_session):
    rows = [
        (1, GOOD, "en"),                      # kept (canonical of the dup pair)
        (2, GOOD, "en"),                      # exact dup of 1 -> 'dup'
        (3, GOOD, "fr"),                      # same text, wrong lang -> 'lang'
        (4, "the cat sat", "en"),             # 3 tokens -> 'short'
        (5, "aa bb cc dd ee ff gg hh ii jj kk ll " + "0" * 300, "en"),
        # ^ 12 letter-run tokens but digit-dominated chars -> 'alpha'
        (6, ("zzyzx " * 12).strip(), "en"),   # 12 tokens, zero stopwords -> 'stopword'
        (7, GOOD + " extra tail words here", "en"),  # kept (distinct text)
        (8, "", "en"),                        # empty -> 'short'
    ]
    d = _write_documents(tmp_path, rows)
    out = clean_corpus(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    verdicts = dict(zip(out.doc_id, out.reason))
    assert verdicts == {
        1: "", 2: "dup", 3: "lang", 4: "short",
        5: "alpha", 6: "stopword", 7: "", 8: "short",
    }
    assert dict(zip(out.doc_id, out.keep)) == {
        1: True, 2: False, 3: False, 4: False,
        5: False, 6: False, 7: True, 8: False,
    }


def test_clean_corpus_precedence(tmp_path, ray_session):
    """A doc failing several checks reports the highest-precedence reason:
    lang > short > alpha > stopword."""
    rows = [
        (1, "x", "de"),            # lang AND short -> 'lang'
        (2, "123 456 789", "en"),  # short AND alpha -> 'short'
        (3, GOOD, "en"),
    ]
    d = _write_documents(tmp_path, rows)
    out = clean_corpus(d).to_pandas().sort_values("doc_id")
    assert list(out.reason) == ["lang", "short", ""]
