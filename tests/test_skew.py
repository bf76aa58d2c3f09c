"""f19: salted-key pre-split for skewed conversation lengths — output
identical to the unsalted grouped path (FIXTURES.md f19; north-rule skew
requirement)."""

import ray.data

from ifctordf_ray.sources.transcripts import transcripts_table
from ifctordf_ray.stages import extract


def _skewed_rows(n_giant=3000, n_small=40):
    rows = [
        {"conv_id": "giant", "turn_idx": i, "role": "user",
         "text": f"turn {i} sees #{max(0, i - 1)}"}
        for i in range(n_giant)
    ]
    for j in range(n_small):
        for k in range(2):
            rows.append(
                {"conv_id": f"s{j}", "turn_idx": k, "role": "assistant",
                 "text": f"small {j} {k}"}
            )
    return rows


def tset(ds):
    return {(r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in ds.take_all()}


def test_salted_equals_grouped():
    ds = ray.data.from_arrow(transcripts_table(_skewed_rows())).materialize()
    grouped = tset(extract.extract_grouped(ds))
    salted = tset(extract.extract_salted(ds, chunk_size=256))
    assert salted == grouped
    # the giant conversation's chain is complete: exactly n-1 nextTurn edges
    chain = [t for t in salted
             if t[1] == "ont:nextTurn" and "/giant/" in t[0]]
    assert len(chain) == 3000 - 1


def test_salted_chunk_boundaries_stitched():
    ds = ray.data.from_arrow(transcripts_table(_skewed_rows(600, 0))).materialize()
    salted = tset(extract.extract_salted(ds, chunk_size=100))
    # boundary edges exist: 99 -> 100, 199 -> 200, ...
    for b in (99, 199, 299, 399, 499):
        assert ("inst:turn/giant/" + str(b), "ont:nextTurn",
                "inst:turn/giant/" + str(b + 1), "uri") in salted
