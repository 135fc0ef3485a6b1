from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.serve import serve
from searchengine_ray.state.aliases import collapse_chains, resolve_aliases
from searchengine_ray.state.shards import SearchEngine


@pytest.fixture(scope="module")
def index_dir(pages_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_serve"))
    build_index(
        pages_dir,
        d,
        BuildConfig(num_partitions=4, term_strings=True),  # /suggest needs the sidecar
        source="pages",
    )
    return d


def test_hydrate(index_dir, ray_session):
    engine = SearchEngine(index_dir, n_shards=2)
    res = engine.search_hydrated("taaa", k=5)
    assert len(res) == 5
    for url, score in res:
        assert url.startswith("https://example.org/wiki/Doc_")
        assert score > 0


def test_http_server(index_dir, ray_session):
    server = serve(index_dir, port=18731, n_shards=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen("http://127.0.0.1:18731/healthz") as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen("http://127.0.0.1:18731/search?q=taaa+tabc&k=3") as r:
            body = json.loads(r.read())
        assert len(body["results"]) == 3
        assert body["results"][0]["url"].startswith("https://example.org/")
        assert body["took_ms"] >= 0
        # descending scores
        scores = [x["score"] for x in body["results"]]
        assert scores == sorted(scores, reverse=True)
        with urllib.request.urlopen(
            "http://127.0.0.1:18731/search?q=taaa&format=html"
        ) as r:
            page = r.read().decode()
        assert "<ol>" in page and "example.org" in page
        # OOV query -> empty result, not an error
        with urllib.request.urlopen("http://127.0.0.1:18731/search?q=zzzz") as r:
            assert json.loads(r.read())["results"] == []
        # bad k -> HTTP 400, not a handler traceback (ADVICE fix)
        for bad in ("abc", "0", "-3"):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:18731/search?q=taaa&k={bad}")
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        # huge k is clamped, not an error
        with urllib.request.urlopen(
            "http://127.0.0.1:18731/search?q=taaa&k=999999999"
        ) as r:
            assert json.loads(r.read())["results"]
        # autocomplete: completions of 'ta' by cf desc, term asc
        with urllib.request.urlopen("http://127.0.0.1:18731/suggest?p=ta&k=3") as r:
            sug = json.loads(r.read())["suggestions"]
        assert 1 <= len(sug) <= 3
        assert all(s["term"].startswith("ta") and s["cf"] > 0 for s in sug)
        cfs = [s["cf"] for s in sug]
        assert cfs == sorted(cfs, reverse=True)
        # missing prefix -> 400
        try:
            urllib.request.urlopen("http://127.0.0.1:18731/suggest?k=3")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen("http://127.0.0.1:18731/nope") as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        server.shutdown()


def test_resolve_aliases(ray_session):
    aliases = pa.table(
        {
            "alias_id": pa.array([10, 20, 30, 40], pa.int64()),
            "target_id": pa.array([1, 10, 30, 41], pa.int64()),  # 20->10->1 chain; 30->30 cycle
        }
    )
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([10, 20, 30, 40, 99], pa.int64())}))
    out = resolve_aliases(ds, aliases).to_pandas().doc_id.tolist()
    assert out == [1, 1, 30, 41, 99]


def test_collapse_chains_cycle_guard():
    a, f = collapse_chains(np.array([1, 2], np.int64), np.array([2, 1], np.int64))
    assert f.tolist() == [1, 2]  # cycles left unresolved


def test_cli_query_and_validate(index_dir, pages_dir, ray_session, capsys):
    from searchengine_ray.cli import main

    # NB: cli._ray_init reuses the session; ray.shutdown in cli would kill the
    # test session, so call the underlying pieces instead for query.
    from searchengine_ray.pipelines.validate import check_extract_invariant

    assert check_extract_invariant(pages_dir)["mismatches"] == 0


def test_size_suffix():
    """F4 (DataStructures/DataStructs/Functions.cs:13-28)."""
    from searchengine_ray.functions.runtime import size_suffix

    assert size_suffix(0) == "0.0 B"
    assert size_suffix(1023) == "1023.0 B"
    assert size_suffix(1024) == "1.0 KB"
    assert size_suffix(1536) == "1.5 KB"
    assert size_suffix(3 * 1024**3) == "3.0 GB"
    assert size_suffix(-2048) == "-2.0 KB"


def test_http_search_ops_syntax(index_dir, ray_session):
    server = serve(index_dir, port=18737, n_shards=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        plain = json.loads(
            urllib.request.urlopen(
                "http://127.0.0.1:18737/search?q=taag&k=1000"
            ).read()
        )["results"]
        # under plain syntax a '-word' is just an unknown positive word
        ops = json.loads(
            urllib.request.urlopen(
                "http://127.0.0.1:18737/search?q=taag+-taeq&k=1000&syntax=ops"
            ).read()
        )["results"]
        assert 0 < len(ops) < len(plain)
        assert {r["doc_id"] for r in ops} < {r["doc_id"] for r in plain}
        # invalid syntax value -> 400
        try:
            urllib.request.urlopen(
                "http://127.0.0.1:18737/search?q=taag&syntax=bogus"
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def index_dir_text(pages_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_snip"))
    build_index(
        pages_dir, d, BuildConfig(num_partitions=4, store_text=True), source="pages"
    )
    return d


def test_snippets(index_dir_text, ray_session):
    engine = SearchEngine(index_dir_text, n_shards=1)
    try:
        results = engine.search("taeq", k=5)
        assert results
        snips = engine.snippets([d for d, _ in results], "taeq")
        assert set(snips) == {d for d, _ in results}
        for s in snips.values():
            # window centers on the matched term and stays word-aligned
            assert "taeq" in s.lower()
            assert len(s) <= 160 + 2 * 20 + 4  # width + snap slack + ellipses
        # rarest-first centering: for a two-term query the rarer term wins
        # when both occur (taaa is the Zipf head => taeq is rarer)
        snips2 = engine.snippets([d for d, _ in results], "taaa taeq")
        for s in snips2.values():
            assert "taeq" in s.lower()
        # url hydration still works alongside text storage
        urls = engine.hydrate([results[0][0]])
        assert urls[results[0][0]].startswith("https://example.org/")
    finally:
        engine.shutdown()


def test_snippets_absent_without_store_text(index_dir, ray_session):
    engine = SearchEngine(index_dir, n_shards=1)
    try:
        results = engine.search("taaa", k=3)
        assert engine.snippets([d for d, _ in results], "taaa") == {}
    finally:
        engine.shutdown()


def test_http_snippets(index_dir_text, ray_session):
    server = serve(index_dir_text, port=18739, n_shards=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.loads(
            urllib.request.urlopen(
                "http://127.0.0.1:18739/search?q=taeq&k=3&snippets=1"
            ).read()
        )
        assert body["results"]
        for r in body["results"]:
            assert "taeq" in r["snippet"].lower()
        # without the flag the field is absent
        body2 = json.loads(
            urllib.request.urlopen(
                "http://127.0.0.1:18739/search?q=taeq&k=3"
            ).read()
        )
        assert "snippet" not in body2["results"][0]
    finally:
        server.shutdown()
