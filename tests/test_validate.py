from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.pipelines.validate import check_extract_invariant
from searchengine_ray.synth import make_pages_table


def test_invariant_holds_on_fixture(pages_dir, ray_session):
    out = check_extract_invariant(pages_dir)
    assert out["rows"] == 1000
    assert out["mismatches"] == 0
    assert out["mismatch_urls"] == []


def test_invariant_catches_corruption(tmp_path, ray_session):
    t = make_pages_table(0, 50)
    texts = t.column("text").to_pylist()
    texts[7] = texts[7] + "CORRUPTED"
    texts[21] = "x" + texts[21]
    t = t.set_column(3, "text", pa.array(texts, pa.large_string()))
    pq.write_table(t, str(tmp_path / "pages.parquet"))
    out = check_extract_invariant(str(tmp_path))
    assert out["rows"] == 50
    assert out["mismatches"] == 2
    assert len(out["mismatch_urls"]) == 2
