r"""Tokenizer — exact reference semantics, fully vectorized.

Reference (duplicated at /root/reference/Indexer/Program.cs:97-121 and
:263-298): scan chars; a Unicode letter extends the current word
(lowercased); any non-letter terminates it; the word is KEPT only if every
source char was ASCII (< 128) and its length is <= 20. Equivalent spec
(SURVEY.md §1.3.2): tokens are maximal runs of Unicode letters; keep a run
iff it matches ^[A-Za-z]{1,20}$; lowercase it.

The query-side parser is intentionally different (plain split(' ') +
lower, /root/reference/Engine/Engine/Engine.cs:127): see `parse_query`.

Everything here runs as pyarrow C++ kernels (RE2) — no Python loop over
rows or tokens.

Unicode-version note: "letter" is decided by RE2's \pL table (pyarrow AND
the DuckDB oracle SQL use RE2, so engine and oracle agree by
construction). `tokenize_py` uses Python's `str.isalpha`, whose Unicode
table can lag RE2's by a version — codepoints added recently (e.g. CJK
Ext-H, U+31350) are letters to RE2 but not to CPython 3.11. The divergence
only changes the fate of ASCII letters ADJACENT to such a codepoint
(kept tokens themselves are ASCII-only); the reference has yet another
behavior there (.NET char.IsLetter over UTF-16 units treats astral chars
as two non-letter surrogates). RE2 is authoritative for this rebuild.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codec import varbyte_encode
from .hashing import hash64

# RE2: \pL = Unicode letter. Split on non-letter runs -> maximal letter runs.
SPLIT_PATTERN = r"[^\pL]+"
# Keep: all-ASCII letters, length 1..20 (also rejects the empty strings that
# split_pattern_regex produces at string boundaries).
KEEP_PATTERN = r"^[A-Za-z]{1,20}$"
MAX_TOKEN_LEN = 20


def tokenize_flat(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, pa.Array]:
    """Tokenize a string column.

    Returns (row_indices, tokens): `tokens` is a flat lowercased string
    array of every kept token occurrence, `row_indices` (int64 ndarray)
    maps each token back to its source row.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    runs = pc.split_pattern_regex(texts, pattern=SPLIT_PATTERN)
    parents = pc.list_parent_indices(runs).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(runs)
    keep = pc.match_substring_regex(flat, KEEP_PATTERN)
    keep_np = keep.to_numpy(zero_copy_only=False)
    tokens = pc.ascii_lower(flat.filter(keep))
    return parents[keep_np], tokens


def count_postings(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Per-(row, term) term frequencies + per-row kept-token counts.

    Returns (terms, row_indices, tf, dl_per_row):
      - terms: string array, one entry per distinct (row, term) pair
      - row_indices: int64 ndarray aligned with `terms`
      - tf: occurrence count per (row, term)  (reference: Indexer/Program.cs:283-293)
      - dl_per_row: kept-token count for EVERY input row (len == len(texts))
    """
    parents, tokens = tokenize_flat(texts)
    n_rows = len(texts)
    dl = np.bincount(parents, minlength=n_rows).astype(np.uint32)
    if len(parents) == 0:
        return pa.array([], type=pa.string()), np.zeros(0, np.int64), np.zeros(0, np.uint32), dl
    pairs = pa.table({"i": pa.array(parents, type=pa.int64()), "term": tokens})
    grouped = pairs.group_by(["i", "term"]).aggregate([([], "count_all")])
    return (
        grouped.column("term").combine_chunks(),
        grouped.column("i").to_numpy(zero_copy_only=False),
        grouped.column("count_all").to_numpy(zero_copy_only=False).astype(np.uint32),
        dl,
    )


def encode_group_positions(
    group_ids_sorted: np.ndarray,
    positions_sorted: np.ndarray,
) -> tuple[bytes, np.ndarray]:
    """Varbyte-encode per-group token positions (delta within group, first
    absolute). Returns (buffer, byte_offsets[n_groups+1]) for zero-copy
    per-group slicing. Everything vectorized."""
    n = len(positions_sorted)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = group_ids_sorted[1:] != group_ids_sorted[:-1]
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = positions_sorted[0]
    deltas[1:] = positions_sorted[1:] - positions_sorted[:-1]
    starts = np.flatnonzero(new_group)
    deltas[starts] = positions_sorted[starts]
    buf, sizes = varbyte_encode(deltas.astype(np.uint64))
    byte_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=byte_off[1:])
    return buf, byte_off[np.append(starts, n)]


def count_postings_hashed(
    texts: pa.Array | pa.ChunkedArray,
    with_positions: bool = False,
    token_limit: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | tuple[
    np.ndarray, np.ndarray, np.ndarray, np.ndarray, pa.LargeBinaryArray
]:
    """Build-pipeline fast path: per-(row, term) tf with terms already
    HASHED (the index never needs the strings). Replaces the per-batch
    Arrow group_by (measured ~74% of count_postings) with a numpy unique
    over packed (row, dictionary-code) keys; hashing touches only the
    batch-local dictionary.

    Returns (term_hashes int64, row_indices int64, tf int64, dl_per_row)
    and, with_positions=True, additionally a large_binary array of
    per-posting varbyte-encoded token positions (delta-coded, first value
    absolute; position = token index within the row's kept-token stream).

    token_limit=K keeps only each row's FIRST K kept tokens (the synthetic
    title-field contract for sources without a real title: title = first K
    tokens of the body stream; SQL mirror is list_slice(toks, 1, K)).
    """
    parents, tokens = tokenize_flat(texts)
    n_rows = len(texts)
    if token_limit is not None and len(parents):
        full_dl = np.bincount(parents, minlength=n_rows).astype(np.int64)
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(full_dl, out=starts[1:])
        pos_in_row = np.arange(len(parents), dtype=np.int64) - starts[parents]
        keep_first = pos_in_row < token_limit
        parents = parents[keep_first]
        tokens = tokens.filter(pa.array(keep_first))
    dl = np.bincount(parents, minlength=n_rows).astype(np.uint32)
    if len(parents) == 0:
        empty = (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            dl,
        )
        if with_positions:
            return (*empty, pa.array([], pa.large_binary()))
        return empty
    dic = pc.dictionary_encode(tokens)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dic.dictionary.to_pylist()
    v = len(vocab)
    key = parents.astype(np.int64) * v + codes
    uk, counts = np.unique(key, return_counts=True)
    rows = uk // v
    ucodes = uk % v
    hash_table = np.fromiter((hash64(w) for w in vocab), dtype=np.int64, count=v)
    if not with_positions:
        return hash_table[ucodes], rows, counts.astype(np.int64), dl
    # token position within the row's kept-token stream
    row_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(dl, out=row_starts[1:])
    pos = np.arange(len(parents), dtype=np.int64) - row_starts[parents]
    order = np.argsort(key, kind="stable")  # stable -> positions ascending per group
    buf, group_off = encode_group_positions(key[order], pos[order])
    positions = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(uk), [None, pa.py_buffer(group_off.tobytes()), pa.py_buffer(buf)]
    )
    return hash_table[ucodes], rows, counts.astype(np.int64), dl, positions


def tokenize_py(text: str) -> list[str]:
    """Pure-Python reference tokenizer (oracle; mirrors Indexer/Program.cs:97-121)."""
    out: list[str] = []
    word: list[str] = []
    ascii_ok = True
    for ch in text:
        if ch.isalpha():
            word.append(ch)
            if ord(ch) >= 128:
                ascii_ok = False
        else:
            if word and ascii_ok and len(word) <= MAX_TOKEN_LEN:
                out.append("".join(word).lower())
            word = []
            ascii_ok = True
    if word and ascii_ok and len(word) <= MAX_TOKEN_LEN:
        out.append("".join(word).lower())
    return out


def parse_query(query: str) -> Counter[str]:
    """Query-side parser: split on ' ', lowercase, count multiplicity.

    Mirrors /root/reference/Engine/Engine/Engine.cs:127-139 — no
    letter/ASCII/length filtering; unknown words simply miss the lexicon
    and contribute nothing.
    """
    return Counter(w.lower() for w in query.split(" ") if w)


def parse_query_prefix(query: str) -> tuple[Counter[str], Counter[str]]:
    """Prefix query parser: a trailing `*` marks a prefix pattern
    (`jo*` expands to vocabulary terms starting with 'jo'). Returns
    (literal word counts, prefix counts); a bare '*' is dropped. Literal
    words parse exactly as parse_query. A rebuild extension — the
    reference query language has no operators."""
    lit: Counter[str] = Counter()
    pre: Counter[str] = Counter()
    for w in query.split(" "):
        if not w:
            continue
        if w.endswith("*"):
            if len(w) > 1:
                pre[w[:-1].lower()] += 1
        else:
            lit[w.lower()] += 1
    return lit, pre


def parse_query_ops(query: str) -> tuple[Counter[str], Counter[str], frozenset[str]]:
    """Combined operator parser for the online serving surface:
    `-word` excludes, `word*` prefix-expands, everything else is a literal.
    Returns (literals, prefix patterns, negated words). A negated prefix
    (`-pre*`) is treated as the negated literal 'pre*'-minus-dash word,
    i.e. NOT supported as an expansion (kept simple; document at the API).
    Bare '-' / '*' are dropped."""
    lit: Counter[str] = Counter()
    pre: Counter[str] = Counter()
    neg: set[str] = set()
    for w in query.split(" "):
        if not w:
            continue
        if w.startswith("-"):
            if len(w) > 1:
                neg.add(w[1:].lower())
        elif w.endswith("*"):
            if len(w) > 1:
                pre[w[:-1].lower()] += 1
        else:
            lit[w.lower()] += 1
    return lit, pre, frozenset(neg)


def parse_query_signed(query: str) -> tuple[Counter[str], frozenset[str]]:
    """Signed query parser: a `-` prefix marks an EXCLUDED word
    (`alpha -beta` ranks docs with alpha that do NOT contain beta).

    Positive words follow parse_query exactly (reference semantics,
    Engine.cs:127-139); negation is a rebuild extension — the reference
    query language has no operators. A bare '-' is dropped."""
    pos: Counter[str] = Counter()
    neg: set[str] = set()
    for w in query.split(" "):
        if not w:
            continue
        if w.startswith("-"):
            if len(w) > 1:
                neg.add(w[1:].lower())
        else:
            pos[w.lower()] += 1
    return pos, frozenset(neg)
