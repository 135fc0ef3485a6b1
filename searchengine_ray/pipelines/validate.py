"""Input validation: the per-row invariant extract(html) == text
(BASELINE.json input_hint), checked as a streaming Ray op.

Returns per-batch counts, so the cost is one pass over (html, text) with
zero driver-side materialization. Run it before an index build when the
corpus provenance is untrusted; the build itself extracts from `html` so a
violation means the golden `text` column disagrees with the extractor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.runtime import cap_worker_threads
from ..stages.extract import extract_text


def check_extract_invariant(pages_path: str) -> dict:
    """-> {'rows': N, 'mismatches': M, 'mismatch_urls': first few}."""

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        _, text = extract_text(t.column("html"))
        bad = pc.not_equal(text, t.column("text"))
        bad_urls = t.column("url").filter(pc.fill_null(bad, True))
        return pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "mismatches": pa.array([pc.sum(pc.cast(bad, pa.int64())).as_py() or 0], pa.int64()),
                "sample_urls": pa.array([bad_urls.slice(0, 3).to_pylist()], pa.list_(pa.string())),
            }
        )

    out = (
        rd.read_parquet(pages_path, columns=["url", "html", "text"])
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    samples = [u for lst in out["sample_urls"] for u in lst][:10]
    return {
        "rows": int(out["rows"].sum()),
        "mismatches": int(out["mismatches"].sum()),
        "mismatch_urls": samples,
    }
