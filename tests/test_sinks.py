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


def test_turtle_round_trip(tmp_path):
    """write_turtle output parses back (prefix resolution + escaping) to
    exactly the triple set that went in — the reference's primary .ttl
    output contract (RDFWriter.java:111-122)."""
    from ifctordf_ray.sources.transcripts import transcripts_table
    from ifctordf_ray.stages import extract

    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "user",
         "text": 'num 12 dec 3.14 "quoted"\nnewline'},
        {"conv_id": "c", "turn_idx": 1, "role": "tool", "tool": "search",
         "text": "see #0"},
    ]
    ds = ray.data.from_arrow(transcripts_table(rows))
    triples = extract.extract_grouped(ds)
    expected = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in triples.take_all()
    }
    out = str(tmp_path / "ttl")
    manifest = sinks.write_turtle(triples, out)
    assert sum(m["n_triples"] for m in manifest) == len(expected)
    got = set()
    for name in os.listdir(out):
        with open(os.path.join(out, name)) as f:
            text = f.read()
        assert text.startswith("# baseURI:")
        assert "@prefix ont: <https://w3id.org/conv/ont#> ." in text
        got |= sinks.parse_turtle(text)
    assert got == expected


def test_turtle_prefixed_vs_full_iri_terms():
    t = _triples_table()
    out = sinks.format_turtle(t)
    lines = out.strip().split("\n")
    # subject local part has '/': falls back to full IRI; class is prefixed
    assert lines[0] == "<https://w3id.org/conv/inst/turn/c/0> a ont:Turn ."
    assert '^^xsd:string' in lines[1]
    assert '"0"^^xsd:integer' in lines[2]


def test_iter_triples_streams_all_batches():
    """S9 consumer (parseModelToStreamRdf analog): incremental batches
    cover the full set exactly once."""
    ds = ray.data.from_arrow(_triples_table())
    seen = []
    for batch in sinks.iter_triples(ds, batch_size=2):
        assert isinstance(batch, pa.Table)
        assert batch.num_rows <= 2
        seen.extend(zip(*[batch[c].to_pylist()
                          for c in ("subj", "pred", "obj", "obj_kind")]))
    tt = _triples_table()
    assert sorted(seen) == sorted(
        zip(*[tt[c].to_pylist() for c in ("subj", "pred", "obj", "obj_kind")])
    )


def test_graph_parquet_round_trip(tmp_path):
    ds = ray.data.from_arrow(_triples_table())
    out = str(tmp_path / "pq2")
    sinks.write_graph_parquet(ds, out)
    back = sinks.read_graph_parquet(out).take_all()
    orig = {tuple(r.values()) for r in
            ray.data.from_arrow(_triples_table()).take_all()}
    got = {(r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in back}
    assert got == orig


def test_format_single_dtype_strip():
    """A string literal whose TEXT ends in '^^xsd:double' must strip only
    the final (real) datatype tag — r2 ADVICE double-strip regression."""
    t = pa.table(
        {
            "subj": ["inst:text/x", "inst:text/y"],
            "pred": ["ont:hasString", "ont:hasString"],
            "obj": ["5^^xsd:double^^xsd:string", "plain^^xsd:string"],
            "obj_kind": ["literal", "literal"],
        }
    )
    nt = sinks.format_ntriples(t).strip().split("\n")
    assert nt[0].endswith(
        '"5^^xsd:double"^^<http://www.w3.org/2001/XMLSchema#string> .'
    )
    ttl = sinks.format_turtle(t).strip().split("\n")
    assert '"5^^xsd:double"^^xsd:string' in ttl[0]


def test_expand_curies_anchored():
    """A CURIE whose LOCAL part contains 'rdf:' / 'inst:' must only have
    its leading prefix expanded (first-colon-only semantics)."""
    arr = pa.array(["inst:conv/weird rdf:stuff inst:tail", "ont:Turn"])
    out = sinks._expand_curies_vec(arr).to_pylist()
    assert out[0] == "<https://w3id.org/conv/inst/conv/weird rdf:stuff inst:tail>"
    assert out[1] == "<https://w3id.org/conv/ont#Turn>"


def test_ntriples_round_trip(tmp_path):
    """write_ntriples -> read_ntriples is the identity on the triple set
    (the .nt sink/source pair; escapes, typed + plain literals, CURIEs)."""
    t = pa.table(
        {
            "subj": ["inst:turn/c/0", "inst:text/ab", "inst:turn/c/0",
                     "inst:hex/DEAD"],
            "pred": ["rdf:type", "ont:hasString", "ont:turnIndex",
                     "ont:hasHexBinary"],
            "obj": ["ont:Turn", 'he said "hi"\n\t\\^^xsd:string',
                    "0^^xsd:integer", "DEAD^^xsd:hexBinary"],
            "obj_kind": ["uri", "literal", "literal", "literal"],
        }
    )
    out = str(tmp_path / "nt")
    sinks.write_ntriples(ray.data.from_arrow(t), out, sort=True)
    back = sinks.read_ntriples(out).take_all()
    got = {(r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in back}
    exp = {tuple(r.values()) for r in t.to_pylist()}
    assert got == exp


def test_ntriples_round_trip_flagship(tmp_path):
    """Full-pipeline .nt round trip at sf0.001: the triple SET survives
    write_ntriples -> read_ntriples exactly (10.7k triples)."""
    from ifctordf_ray.pipelines import kg

    triples = kg.kg_from_events("/root/testdata/sf0.001", mode="fast")
    exp = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in triples.take_all()
    }
    out = str(tmp_path / "nt")
    sinks.write_ntriples(
        kg.kg_from_events("/root/testdata/sf0.001", mode="fast"), out
    )
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in sinks.read_ntriples(out).take_all()
    }
    assert got == exp


def test_subject_triples_pruned_lookup(tmp_path):
    """Point lookup reads only the subject's hive bucket and returns
    exactly that subject's triples."""
    from ifctordf_ray.pipelines import kg

    triples = kg.kg_from_events("/root/testdata/sf0.001", mode="fast")
    out = str(tmp_path / "graph")
    sinks.write_graph_parquet(triples, out)
    subj = "inst:conv/c0-0"
    got = sinks.subject_triples(out, subj).take_all()
    assert got and all(r["subj"] == subj for r in got)
    exp = [r for r in kg.kg_from_events("/root/testdata/sf0.001", mode="fast")
           .take_all() if r["subj"] == subj]
    assert {tuple(r.values()) for r in got} == {tuple(r.values()) for r in exp}


def test_ntriples_gzip_round_trip(tmp_path):
    """compression="gzip": same triple set back through read_ntriples,
    deterministic bytes (mtime pinned), content-addressed skip works
    across a rewrite."""
    import glob
    import gzip as _gzip

    t = pa.table(
        {
            "subj": ["inst:turn/c/0", "inst:text/ab"],
            "pred": ["rdf:type", "ont:hasString"],
            "obj": ["ont:Turn", 'quoted "x"\\n^^xsd:string'],
            "obj_kind": ["uri", "literal"],
        }
    )
    out = str(tmp_path / "ntgz")
    m1 = sinks.write_ntriples(ray.data.from_arrow(t), out, compression="gzip")
    files = glob.glob(f"{out}/*.nt.gz")
    assert files and all(not m["skipped"] for m in m1)
    blob1 = {f: open(f, "rb").read() for f in files}
    # gzip payload really is the formatted text
    text = _gzip.decompress(blob1[files[0]]).decode("utf-8")
    assert text.endswith("\n") and " ." in text.splitlines()[0]
    back = sinks.read_ntriples(out).take_all()
    got = {(r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in back}
    assert got == {tuple(r.values()) for r in t.to_pylist()}
    # second write: content-addressed skip + byte-identical files
    m2 = sinks.write_ntriples(ray.data.from_arrow(t), out, compression="gzip")
    assert all(m["skipped"] for m in m2)
    assert {f: open(f, "rb").read() for f in files} == blob1
