"""Multi-version vocabulary dispatch — the getExpressSchema analog
(IfcSpfReader.java:186-223): per-file footer sniff, per-row vocab
validation, two generations mixed in ONE run."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ifctordf_ray import schema as S
from ifctordf_ray.sources.transcripts import (
    read_transcripts_versioned,
    transcripts_table,
)
from ifctordf_ray.stages.extract import extract_fast


def _write_versioned(tmp_path, name, rows, version=None):
    t = transcripts_table(rows)
    if version is not None:
        t = t.replace_schema_metadata({S.VOCAB_METADATA_KEY: version.encode()})
    p = str(tmp_path / name)
    pq.write_table(t, p)
    return p


ROWS = [
    {"conv_id": "cA-0", "turn_idx": 0, "role": "user", "text": "hi"},
    # 'view' role + 'mailer' tool: OUTSIDE v1's vocab, INSIDE v2's
    {"conv_id": "cA-0", "turn_idx": 1, "role": "view", "text": "pg", "tool": "mailer"},
]


def test_sniff_vocab_version(tmp_path):
    p1 = _write_versioned(tmp_path, "f1.parquet", ROWS)  # untagged -> default
    p2 = _write_versioned(tmp_path, "f2.parquet", ROWS, version="v2")
    assert S.sniff_vocab_version(p1) == S.DEFAULT_VOCAB_VERSION == "v1"
    assert S.sniff_vocab_version(p2) == "v2"
    p3 = _write_versioned(tmp_path, "f3.parquet", ROWS, version="v99")
    with pytest.raises(ValueError, match="unknown vocab_version"):
        S.sniff_vocab_version(p3)


def test_sniff_vocab_version_corrupt_file_errors(tmp_path):
    """A corrupt/unreadable file must hard-error (the reference aborts on
    an unconvertible file) — NOT be silently tagged as the default
    generation (ADVICE r4)."""
    bad = tmp_path / "corrupt.parquet"
    bad.write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception):
        S.sniff_vocab_version(str(bad))
    with pytest.raises(Exception):
        S.sniff_vocab_version(str(tmp_path / "missing.parquet"))


def test_two_versions_one_run(tmp_path):
    """The done-criterion fixture: one run over a v1 file and a v2 file
    holding the SAME rows; each file's rows are validated under its own
    vocabulary, so the v2 file emits hasRole/usedTool triples for
    'view'/'mailer' and the v1 file does not."""
    rows_v1 = [dict(r, conv_id="v1-" + r["conv_id"]) for r in ROWS]
    rows_v2 = [dict(r, conv_id="v2-" + r["conv_id"]) for r in ROWS]
    p1 = _write_versioned(tmp_path, "g1.parquet", rows_v1)  # default v1
    p2 = _write_versioned(tmp_path, "g2.parquet", rows_v2, version="v2")

    tr = read_transcripts_versioned([p1, p2])
    trip = extract_fast(tr, prevalidated=True).to_pandas()

    def objs(conv_prefix, pred):
        m = trip[
            trip["subj"].str.startswith(f"inst:turn/{conv_prefix}")
            & (trip["pred"] == pred)
        ]
        return set(m["obj"])

    # v2 file: 'view' is a sanctioned role, 'mailer' a sanctioned tool
    assert "ont:role/view" in objs("v2-", S.P_HAS_ROLE)
    assert "ont:tool/mailer" in objs("v2-", S.P_USED_TOOL)
    # v1 file, same rows: both are vocabulary violations -> NO triple
    assert "ont:role/view" not in objs("v1-", S.P_HAS_ROLE)
    assert objs("v1-", S.P_USED_TOOL) == set()
    # vocabulary-INdependent triples identical across versions
    assert "ont:role/user" in objs("v1-", S.P_HAS_ROLE)
    assert "ont:role/user" in objs("v2-", S.P_HAS_ROLE)
    n_flag_v1 = (trip["pred"] == S.P_TOOL_FLAG).sum()
    assert n_flag_v1 == 4  # one per turn, both files


def test_vocab_dispatch_oracle_parity(sf_small):
    from ifctordf_ray.pipelines import kg
    from ifctordf_ray.sql_oracle import kg_vocab_dispatch_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    a = kg.kg_vocab_dispatch(sf_small).to_pandas()
    b = con.execute(kg_vocab_dispatch_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # both generations are present in the tagged corpus
    assert (a["obj"] == "ont:role/view").any()  # only possible under v2
    assert (a["obj"] == "ont:role/user").any()
