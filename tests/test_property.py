"""Property-based test (hypothesis): for arbitrary small transcript
tables, the vectorized batch extractor agrees EXACTLY with the
pure-Python oracle — no Ray involved, so hundreds of examples run fast.
The reference has no property tests (SURVEY.md §5.1); this guards the
tokenizer/mention edge cases its 19 goldens cannot enumerate."""

import datetime as dt
import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ifctordf_ray import oracle
from ifctordf_ray import schema as S
from ifctordf_ray.stages import extract

ALPHABET = "ab9 #01'\"\\\n(),.Ü→xF"  # x/F: exercise the 0x hex arm

texts = st.text(alphabet=ALPHABET, min_size=0, max_size=16)
roles = st.sampled_from(list(S.ROLES) + ["bad", "usre", ""])
tools = st.sampled_from(list(S.TOOLS) + [None, None, "xtool"])


@st.composite
def transcript_rows(draw):
    rows = []
    n_convs = draw(st.integers(1, 3))
    for c in range(n_convs):
        n_turns = draw(st.integers(1, 5))
        for i in range(n_turns):  # dense 0-based (fast-path contract)
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": i,
                    "role": draw(roles),
                    "text": draw(texts),
                    "tool": draw(tools),
                    "ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                }
            )
    return rows


def pure_fast_path(rows):
    """The fast path's semantics without Ray: drop dangling convs, one
    extract_batch_triples call, global set-dedup, decode."""
    ref_re = re.compile(S.REF_RE)
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    live = []
    for cid, turns in by_conv.items():
        idx_set = {t["turn_idx"] for t in turns}
        ok = all(
            int(m) in idx_set
            for t in turns
            for m in ref_re.findall(t["text"] or "")
        )
        if ok:
            live.extend(turns)
    if not live:
        return set()
    tbl = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in live], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in live], pa.int32()),
            "role": pa.array([r["role"] for r in live], pa.string()),
            "text": pa.array([r["text"] for r in live], pa.string()),
            "tool": pa.array([r["tool"] for r in live], pa.string()),
            "ts": pa.array([r["ts"] for r in live], pa.timestamp("us")),
        }
    )
    out = extract.extract_batch_triples(
        tbl,
        num_re=re.compile(S.NUM_RE),
        ref_re=ref_re,
        roles=frozenset(S.ROLES),
        tools=frozenset(S.TOOLS),
        ref_targets=None,
    )
    dec = extract.decode_compact_batch(out)
    return {
        (s, p, o, k)
        for s, p, o, k in zip(
            dec["subj"].to_pylist(),
            dec["pred"].to_pylist(),
            dec["obj"].to_pylist(),
            dec["obj_kind"].to_pylist(),
        )
    }


@settings(max_examples=300, deadline=None)
@given(transcript_rows())
def test_batch_extractor_matches_oracle(rows):
    got = pure_fast_path(rows)
    exp, _ = oracle.extract_reference(rows)
    assert got == exp, (sorted(got - exp)[:4], sorted(exp - got)[:4])


def test_distinct_equal_keys_never_span_blocks():
    """Pins the contract distinct() relies on (stages/extract.py:596-602):
    Ray's range sort assigns equal leading keys to ONE output block and
    batch_size=None preserves block boundaries, so per-block adjacent
    dedup is an exact global distinct.  Many duplicated keys across many
    input blocks: any cross-block leakage of equal keys would overcount.
    Breaks loudly if Ray's sort-block semantics ever change."""
    import ray.data

    n_keys, reps = 40, 50
    subj = [f"k{i:03d}" for i in range(n_keys) for _ in range(reps)]
    rng = __import__("random").Random(7)
    rng.shuffle(subj)
    t = pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred_id": pa.array([i % 3 for i in range(len(subj))], pa.int8()),
            "obj": pa.array(["o"] * len(subj), pa.string()),
        }
    )
    # many small input blocks -> the sort must still co-locate equal keys
    ds = ray.data.from_arrow(t).repartition(16)
    out = extract.distinct(ds, ["subj", "pred_id", "obj"]).take_all()
    seen = {(r["subj"], r["pred_id"], r["obj"]) for r in out}
    assert len(out) == len(seen), "adjacent dedup leaked duplicates across blocks"
    # expected: per key, the pred_id cycle covers {0,1,2} (reps >> 3)
    assert len(seen) == n_keys * 3
