"""BPE tokenizer training: engine vs SQL oracle vs an independent
canonical greedy-merge Python reference.  The double-space sequence
encoding must make literal non-overlapping replacement EXACTLY
canonical BPE — the reference here merges with the classic index loop,
not string replace, so it would catch any encoding-semantics drift
(runs like 'aaaa', multi-char follow-up merges)."""

import re
from collections import Counter

import duckdb
import pyarrow.parquet as pq

from ifctordf_ray.stages.terms import BPE_N_MERGES, bpe_merges, bpe_merges_sql


def _canonical_bpe(texts, n_merges):
    wc = Counter()
    for x in texts:
        wc.update(re.findall(r"[a-z0-9]+", (x or "").lower()))
    seqs = {w: list(w) for w in wc}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc[w]
        if not pairs:
            break
        mx = max(pairs.values())
        l, r = sorted(k for k, v in pairs.items() if v == mx)[0]
        merges.append((rank, l, r, mx))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_merges_cross_engine(sf_small):
    got = bpe_merges(sf_small).to_pandas()
    rows = [tuple(r) for r in got.itertuples(index=False)]

    texts = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    assert rows == _canonical_bpe(texts, BPE_N_MERGES)

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"'{sf_small}/documents.parquet'"
    )
    sql_rows = [
        tuple(r) for r in con.sql(bpe_merges_sql()).df().itertuples(index=False)
    ]
    assert rows == sql_rows


def test_bpe_merges_adversarial_sql_arm():
    """SQL arm alone on runs / multi-char-merge shapes the corpus may
    not produce (engine arm shares the replace semantics verbatim)."""
    docs = [
        "aaaa aaaa aaa aaaaa banana bananana abab ababab",
        "aaaa banana banana xyxyxy xxyy aabb aabbaabb",
        "zzz zzzz zzzzz banana aaaa abab",
    ]
    con = duckdb.connect()
    con.sql(
        "create table documents as select * from (values "
        + ",".join(f"('{d}')" for d in docs)
        + ") t(text)"
    )
    sql_rows = [
        tuple(r)
        for r in con.sql(bpe_merges_sql(8)).df().itertuples(index=False)
    ]
    assert sql_rows == _canonical_bpe(docs, 8)
    # the fifth merge is same-symbol ('an','an') and the seventh merges a
    # 4-char symbol — the shapes the naive single-space encoding gets wrong
    assert sql_rows[4][1] == sql_rows[4][2] == "an"
    assert sql_rows[6][2] == "anan"


def _canonical_encode(texts, n_merges):
    """Independent reference: canonical trainer + canonical per-word
    index-loop encoder (merges applied in learned order)."""
    merges = [(l, r) for _, l, r, _ in _canonical_bpe(texts, n_merges)]

    def enc_word(w):
        syms = list(w)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    return [
        sum(enc_word(w) for w in re.findall(r"[a-z0-9]+", (x or "").lower()))
        for x in texts
    ]


def test_bpe_encode_cross_engine(sf_small):
    from ifctordf_ray.stages.terms import bpe_encode, bpe_encode_sql

    got = (
        bpe_encode(sf_small)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"'{sf_small}/documents.parquet'"
    )
    exp = con.sql(bpe_encode_sql()).df().sort_values(
        "doc_id", ignore_index=True
    )
    assert got.equals(exp)

    t = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    ).sort_by("doc_id")
    ref = _canonical_encode(t["text"].to_pylist(), BPE_N_MERGES)
    assert got["n_bpe_tokens"].tolist() == ref
