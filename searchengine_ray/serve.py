"""Thin HTTP serving front-end over the shard-actor pool.

Reference analog: the Engine's HttpListener accept loop + HTML templates
(/root/reference/Engine/Engine/Engine.cs:37-95, Functions.cs:12-27,
Resources/*.html). Serving is OUT of the data plane (SURVEY.md §2.1 S6):
this is a stdlib ThreadingHTTPServer whose handlers call the
`SearchEngine` coordinator; the data-plane work (scatter-gather over
IndexShardActor, merge) is unchanged.

GET /search?q=<query>&k=10        -> JSON {results: [{doc_id, url, score}], took_ms}
GET /search?q=...&syntax=ops      -> enables `-word` (NOT), `word*` (prefix),
                                     `title:word` / `body:word` (field
                                     scoping) and whole-query `"a phrase"` /
                                     `"a phrase"~N` (proximity) operators
                                     (rebuild extensions; plain is the
                                     reference-compatible default)
GET /search?q=...&snippets=1      -> adds a `snippet` field per result
                                     (indexes built with store_text=True;
                                     empty string otherwise)
GET /search?q=<query>&format=html -> minimal HTML results page (F6 analog)
GET /explain?q=<query>&k=10       -> JSON per-term score breakdown (the debug
                                     surface; contributions sum to each score)
GET /suggest?p=<prefix>&k=5       -> JSON autocomplete {suggestions:
                                     [{term, cf}]} by cf desc, term asc
GET /healthz                      -> ok
"""

from __future__ import annotations

import html as html_mod
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .state.shards import SearchEngine

MAX_K = 1000  # reference caps results at 1000 (Engine/Engine/Engine.cs:181)

_PAGE = """<!doctype html><html><head><title>searchengine_ray</title></head>
<body><h2>searchengine_ray</h2>
<form action="/search"><input name="q" value="{q}"/>
<input type="hidden" name="format" value="html"/>
<button>Search</button></form>
<p>{n} results in {ms} ms</p><ol>{rows}</ol></body></html>"""


def make_handler(engine: SearchEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            # http.server decodes the request line as latin-1; clients that
            # put raw UTF-8 in the URL (curl does) need re-decoding
            path = self.path
            try:
                path = path.encode("latin-1").decode("utf-8")
            except UnicodeDecodeError:
                pass
            u = urlparse(path)
            if u.path == "/healthz":
                self._send(200, b"ok", "text/plain")
                return
            if u.path not in ("/search", "/explain", "/suggest"):
                self._send(404, b"not found", "text/plain")
                return
            qs = parse_qs(u.query)
            if u.path == "/suggest":
                prefix = (qs.get("p") or [""])[0]
                try:
                    sk = int((qs.get("k") or ["5"])[0])
                except ValueError:
                    self._send(400, b"invalid k", "text/plain")
                    return
                if not prefix or sk < 1:
                    self._send(400, b"missing prefix or invalid k", "text/plain")
                    return
                t0 = time.perf_counter()
                sug, truncated = engine.suggest(prefix, k=min(sk, MAX_K), with_meta=True)
                ms = round((time.perf_counter() - t0) * 1000, 2)
                self._send(
                    200,
                    json.dumps(
                        {
                            "prefix": prefix,
                            "took_ms": ms,
                            "suggestions": sug,
                            # candidate scan hit its cap: top-cf completions
                            # beyond it may be missing (round-3 ADVICE)
                            "truncated": truncated,
                        }
                    ).encode(),
                    "application/json",
                )
                return
            query = (qs.get("q") or [""])[0]
            try:
                k = int((qs.get("k") or ["10"])[0])
            except ValueError:
                self._send(400, b"invalid k", "text/plain")
                return
            if k < 1:
                self._send(400, b"invalid k", "text/plain")
                return
            k = min(k, MAX_K)  # a huge k would force full-corpus sorts per shard
            if u.path == "/explain":
                t0 = time.perf_counter()
                entries = engine.explain(query, k=k)
                urls = engine.hydrate([e["doc_id"] for e in entries])
                for e in entries:
                    e["url"] = urls[e["doc_id"]]
                ms = round((time.perf_counter() - t0) * 1000, 2)
                self._send(
                    200,
                    json.dumps({"query": query, "took_ms": ms, "results": entries}).encode(),
                    "application/json",
                )
                return
            syntax = (qs.get("syntax") or ["plain"])[0]
            if syntax not in ("plain", "ops"):
                self._send(400, b"invalid syntax", "text/plain")
                return
            want_snippets = (qs.get("snippets") or ["0"])[0] == "1"
            t0 = time.perf_counter()
            results = engine.search(query, k=k, syntax=syntax)
            urls = engine.hydrate([d for d, _ in results])
            snips = (
                engine.snippets([d for d, _ in results], query, syntax=syntax)
                if want_snippets
                else {}
            )
            ms = round((time.perf_counter() - t0) * 1000, 2)
            if (qs.get("format") or ["json"])[0] == "html":
                rows = "".join(
                    f"<li>{html_mod.escape(urls[d])} <small>({s:.4f})</small></li>"
                    for d, s in results
                )
                body = _PAGE.format(q=html_mod.escape(query), n=len(results), ms=ms, rows=rows)
                self._send(200, body.encode(), "text/html; charset=utf-8")
            else:
                body = json.dumps(
                    {
                        "query": query,
                        "took_ms": ms,
                        "results": [
                            {"doc_id": d, "url": urls[d], "score": s}
                            | ({"snippet": snips.get(d, "")} if want_snippets else {})
                            for d, s in results
                        ],
                    }
                )
                self._send(200, body.encode(), "application/json")

    return Handler


def serve(index_dir: str, port: int = 8080, n_shards: int = 4, mode: str = "bm25"):
    """Blocking serve loop. Returns the server object if you need to stop it
    from another thread (server.shutdown())."""
    engine = SearchEngine(index_dir, n_shards=n_shards, mode=mode)
    engine.search("warmup", k=1)
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine))
    return server
