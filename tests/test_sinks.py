import os

import pyarrow as pa
import ray.data

from ifctordf_ray.sources import sinks


def _triples_table():
    return pa.table(
        {
            "subj": ["inst:turn/c/0", "inst:text/ab", "inst:turn/c/0"],
            "pred": ["rdf:type", "ont:hasString", "ont:turnIndex"],
            "obj": ["ont:Turn", 'he said "hi"\n\t\\^^xsd:string', "0^^xsd:integer"],
            "obj_kind": ["uri", "literal", "literal"],
        }
    )


def test_format_ntriples_escaping():
    out = sinks.format_ntriples(_triples_table())
    lines = out.strip().split("\n")
    assert lines[0] == (
        "<https://w3id.org/conv/inst/turn/c/0> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<https://w3id.org/conv/ont#Turn> ."
    )
    # escaped quote/newline/tab/backslash; datatype expanded
    assert '\\"hi\\"' in lines[1] and "\\n" in lines[1] and "\\t" in lines[1]
    assert lines[1].endswith('^^<http://www.w3.org/2001/XMLSchema#string> .')
    assert '"0"^^<http://www.w3.org/2001/XMLSchema#integer>' in lines[2]


def test_write_ntriples_idempotent(tmp_path):
    ds = ray.data.from_arrow(_triples_table())
    out = str(tmp_path / "nt")
    m1 = sinks.write_ntriples(ds, out)
    assert sum(x["n_triples"] for x in m1) == 3
    assert not any(x["skipped"] for x in m1)
    files1 = sorted(os.listdir(out))
    # rerun: content-addressed parts are skipped, not rewritten
    m2 = sinks.write_ntriples(ds, out)
    assert all(x["skipped"] for x in m2)
    assert sorted(os.listdir(out)) == files1


def test_graph_parquet_buckets(tmp_path):
    ds = ray.data.from_arrow(_triples_table())
    out = str(tmp_path / "pq")
    sinks.write_graph_parquet(ds, out)
    back = ray.data.read_parquet(out)
    assert back.count() == 3
    assert any(d.startswith("bucket=") for d in os.listdir(out))
