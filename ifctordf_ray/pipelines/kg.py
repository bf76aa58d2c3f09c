"""Flagship pipeline: transcripts -> knowledge graph.

End-to-end shape (SURVEY.md §3.4):

    read_parquet(transcripts)                 # or derive from events
      -> [assembly + extraction]              # groupby(conv_id) flagship,
                                              # or shuffle-free fast path
      -> distinct (s,p,o) via groupby         # set semantics (D2)
      -> sort(subj)                           # final sorted shuffle
      -> N-Triples + bucketed Parquet partitions + lineage manifest

plus side outputs: errors dataset (per-conversation abort granularity) and
the canonical-mention table (groupby-aggregate canonicalization, D3).

`run_resumable` executes the same pipeline per input-file partition with a
checkpoint manifest — kill it at any point and rerun: finished partitions
are skipped (verified by tests/test_resume.py).
"""

from __future__ import annotations

import time

import ray.data

from ifctordf_ray.sources import sinks
from ifctordf_ray.sources.transcripts import read_transcripts, transcripts_from_events
from ifctordf_ray.stages import extract
from ifctordf_ray.stages.canonicalize import canonicalize_mentions
from ifctordf_ray.state import checkpoint as ckpt


def kg_triples(
    transcripts: ray.data.Dataset, mode: str = "fast", dedup_turns: bool = False
) -> ray.data.Dataset:
    """Deduplicated triple set.  mode='fast' (map_batches, shuffle-free,
    dense turn_idx) or 'grouped' (groupby(conv_id) flagship, any layout).
    dedup_turns=True additionally collapses duplicate turns and redirects
    '#N' refs to the keeper (J2; forces the grouped physical plan)."""
    if dedup_turns:
        return extract.extract_deduped(transcripts)
    if mode == "grouped":
        return extract.extract_grouped(transcripts)
    return extract.extract_fast(transcripts)


def kg_from_events(
    sf_dir: str, mode: str = "fast", replicate: int = 1
) -> ray.data.Dataset:
    """Derived-transcript variant.  The fast path derives with
    drop_dangling=True — reference validation happens inside the
    assembly groupby (a user's conversations are complete in-group), so
    the whole pipeline is ONE fused stream: derive -> extract ->
    sorted-dedup -> consume.  No reference-resolution pass, no
    materialize barrier."""
    if mode == "fast":
        tr = transcripts_from_events(sf_dir, replicate=replicate, drop_dangling=True)
        return extract.extract_fast(tr, prevalidated=True)
    tr = transcripts_from_events(sf_dir, replicate=replicate)
    return kg_triples(tr, mode=mode)


def kg_vocab_dispatch(sf_dir: str) -> ray.data.Dataset:
    """Multi-version vocabulary dispatch pipeline (the getExpressSchema
    5-way dispatch analog, IfcSpfReader.java:186-223): transcripts tagged
    with a deterministic dataset-level vocab version (md5-parity — the
    single-table stand-in for the per-file footer sniff exercised by
    sources.read_transcripts_versioned) flow through the SAME flagship
    fast extraction, where role/tool membership is judged per-row against
    that row's vocabulary generation.  Output is projected to the two
    vocabulary-sensitive predicates so the dispatch is directly visible:
    a 'view' role emits a hasRole triple under v2 and nothing under v1."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S
    from ifctordf_ray.sources.transcripts import tag_vocab_by_conv

    tr = tag_vocab_by_conv(
        transcripts_from_events(sf_dir, drop_dangling=True)
    )
    triples = extract.extract_fast(tr, prevalidated=True)
    keep = pa.array([S.P_HAS_ROLE, S.P_USED_TOOL])
    return triples.map_batches(
        lambda t: t.filter(pc.is_in(t["pred"], keep)), batch_format="pyarrow"
    )


def kg_delta_triples(sf_dir: str) -> ray.data.Dataset:
    """Incremental KG construction: the triples contributed ONLY by the
    'new' conversation partition — delta EXCEPT base, the production
    "apply tonight's partition to the graph without re-emitting
    yesterday's triples" operator.  The new/base split is the same
    deterministic md5-parity dataset tag the vocab dispatch uses
    (md5(conv_id) >= '8' -> new).

    Shape at scale: both sides stream through the SAME flagship
    extraction; the EXCEPT is ONE distributed hash anti-join on the full
    (subj, pred, obj, obj_kind) key — no broadcast (both sides are
    graph-sized), no driver state.  Set semantics make the delta
    well-defined: a triple some base conversation already emitted (a
    shared content-derived wrapper, e.g. a number mentioned in both
    halves) is NOT re-emitted; tests/test_incremental.py asserts
    base ∪ delta == full graph and base ∩ delta == ∅."""
    import pyarrow as pa

    from ifctordf_ray.functions.kernels import md5_hex, safe_join

    def _parity(want_new: bool):
        def flt(t: pa.Table) -> pa.Table:
            hx = md5_hex(t["conv_id"].to_pylist())
            return t.filter(pa.array([(h >= "8") == want_new for h in hx]))

        return flt

    tr = transcripts_from_events(sf_dir, drop_dangling=True)
    new_t = extract.extract_fast(
        tr.map_batches(_parity(True), batch_format="pyarrow"), prevalidated=True
    )
    base_t = extract.extract_fast(
        tr.map_batches(_parity(False), batch_format="pyarrow"), prevalidated=True
    )
    tri_schema = pa.schema([(c, pa.string()) for c in extract.TRIPLE_COLS])
    return safe_join(
        new_t,
        tri_schema,
        base_t,
        tri_schema,
        join_type="left_anti",
        on=tuple(extract.TRIPLE_COLS),
        right_on=tuple(extract.TRIPLE_COLS),
    )


def kg_inferred_types(sf_dir: str) -> ray.data.Dataset:
    """RDFS-entailed rdf:type materialization — the runtime-inference
    analog of the reference's readOntology + Jena OntModel pass
    (IfcSpfReader.java: the ifcOWL TBox drives class resolution; here the
    closed TBox lives in schema.SUBCLASS_OF).  For every asserted
    (x, rdf:type, C) triple, emit (x, rdf:type, S) for each S in C's
    transitive superclass closure, plus the asserted triple — DISTINCT
    set semantics (exact under diamond hierarchies too).

    Scale shape: the closure is vocab-sized and precomputed at import
    (no broadcast, no shuffle to build it); the instance pass is one
    vectorized map_batches (per-class filter + constant-column emit);
    the final distinct is over type-triples only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ifctordf_ray import schema as S

    closure = S.subclass_closure()
    triples = kg_from_events(sf_dir, mode="fast")

    def _const(n: int, v: str) -> pa.Array:
        return pa.nulls(n, pa.string()).fill_null(v)

    def infer(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], S.RDF_TYPE))
        outs = [t]
        for cls, supers in closure.items():
            sub = t.filter(pc.equal(t["obj"], cls))
            n = sub.num_rows
            if n:
                for sp in supers:
                    outs.append(
                        pa.table(
                            {
                                "subj": sub["subj"],
                                "pred": _const(n, S.RDF_TYPE),
                                "obj": _const(n, sp),
                                "obj_kind": _const(n, "uri"),
                            }
                        )
                    )
        return pa.concat_tables(outs)

    inferred = triples.map_batches(infer, batch_format="pyarrow")
    return extract.distinct(inferred, extract.TRIPLE_COLS)


def kg_star_pattern(
    sf_dir: str, role: str = "tool", tool: str = "logger"
) -> ray.data.Dataset:
    """Graph pattern query over the constructed KG — the SPARQL-style
    2-arm star join  ?t ont:hasRole role/X . ?t ont:usedTool tool/Y  —
    answered in ONE pass: filter the two arms out of the (distinct)
    triple stream, then ONE groupby(subj) counting matched arms (the
    triple set's distinctness guarantees <= 1 row per (subj, arm), so
    count == 2 IS the star match; no self-join, no broadcast)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ifctordf_ray import schema as S

    role_obj, tool_obj = f"ont:role/{role}", f"ont:tool/{tool}"
    triples = kg_from_events(sf_dir, mode="fast")

    def arms(t: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.and_(
                pc.equal(t["pred"], S.P_HAS_ROLE), pc.equal(t["obj"], role_obj)
            ),
            pc.and_(
                pc.equal(t["pred"], S.P_USED_TOOL), pc.equal(t["obj"], tool_obj)
            ),
        )
        return t.filter(m).select(["subj"])

    hits = triples.map_batches(arms, batch_format="pyarrow")
    both = hits.groupby("subj").aggregate(Count(alias_name="n_arms"))

    def matched(t: pa.Table) -> pa.Table:
        if "n_arms" not in t.schema.names:  # zero-block upstream
            return pa.table({"subj": pa.array([], pa.string())})
        return t.filter(pc.equal(t["n_arms"], 2)).select(["subj"])

    return both.map_batches(matched, batch_format="pyarrow")


def materialize(
    triples: ray.data.Dataset, out_dir: str, parquet: bool = False,
    turtle: bool = False, compression: str | None = None,
) -> list[dict]:
    """Final sorted-shuffle materialization; returns manifest rows.
    kg_triples output is already subject-sorted (distinct() sorts on
    (subj,pred,obj,obj_kind) as its shuffle) — no second sort.

    A manifest.json is written beside the parts: prefix declarations (the
    S7 header/prefix-emission analog, RDFWriter.java:111-122) plus
    per-file lineage (path, triple count, subject range)."""
    import json
    import os

    manifest = sinks.write_ntriples(
        triples, f"{out_dir}/nt", sort=False, compression=compression
    )
    if parquet:
        sinks.write_graph_parquet(triples, f"{out_dir}/parquet")
    if turtle:
        sinks.write_turtle(triples, f"{out_dir}/ttl", sort=False)
    from ifctordf_ray import schema as S

    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "prefixes": S.PREFIXES,
                "n_triples": sum(m["n_triples"] for m in manifest),
                "files": manifest,
            },
            f,
            indent=1,
            default=str,
        )
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


def materialize_parquet(
    triples: ray.data.Dataset, out_dir: str, compression: str = "zstd"
) -> int:
    """Parquet-only flagship materialization (the north star's sanctioned
    graph output format alongside .nt): bucketed zstd graph partitions +
    a lineage manifest.  Returns the triple count, taken from the written
    file FOOTERS — metadata-only, no second pass over the data.

    Exists as the scale-path sink: the .nt text sink pushes ~120 bytes
    per triple through the one shared disk of a single box; columnar
    dictionary + zstd encoding turns that into CPU work that parallelizes
    with workers (the measured non-scaling residue, BASELINE.md)."""
    import glob
    import json
    import os

    import pyarrow.parquet as _pq

    # RANGE-partitioned layout, not hive buckets: the triple stream is
    # already subject-sorted (the distinct shuffle), so one file per
    # block IS a disjoint subject range — the same prunability the .nt
    # manifest provides, without each task fanning every block out into
    # 16 hive dirs (a small-file explosion at many blocks).  The
    # hive-bucketed layout remains available via sinks.write_graph_parquet
    # for point-lookup workloads (subject_triples).
    triples.write_parquet(f"{out_dir}/parquet", compression=compression)
    per_file = []
    for f in sorted(glob.glob(f"{out_dir}/parquet/*.parquet")):
        md = _pq.ParquetFile(f).metadata
        subj_idx = md.schema.to_arrow_schema().get_field_index("subj")
        stats = [
            md.row_group(g).column(subj_idx).statistics
            for g in range(md.num_row_groups)
        ]
        lo = min((s.min for s in stats if s is not None), default=None)
        hi = max((s.max for s in stats if s is not None), default=None)
        per_file.append(
            {"path": f, "n_triples": md.num_rows, "subj_min": lo, "subj_max": hi}
        )
    from ifctordf_ray import schema as S

    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "prefixes": S.PREFIXES,
                "format": f"parquet/{compression}",
                "n_triples": sum(m["n_triples"] for m in per_file),
                "files": per_file,
            },
            f,
            indent=1,
            default=str,
        )
    os.replace(tmp, f"{out_dir}/manifest.json")
    return sum(m["n_triples"] for m in per_file)


def run(
    source: str,
    out_dir: str,
    mode: str = "fast",
    from_events: bool = True,
    parquet: bool = False,
    turtle: bool = False,
    dedup_turns: bool = False,
) -> dict:
    """One-shot (non-partitioned) flagship run.  Returns metrics."""
    t0 = time.time()
    if from_events:
        tr = None
        if dedup_turns:
            from ifctordf_ray.sources.transcripts import transcripts_from_events

            triples = kg_triples(
                transcripts_from_events(source), mode=mode, dedup_turns=True
            )
        else:
            triples = kg_from_events(source, mode=mode)
    else:
        # fast mode has two consumers (resolve pass + extraction); each
        # branch RE-READS the pruned parquet rather than materializing the
        # corpus in the object store — at 100 TB the store cannot hold the
        # input, while a second pruned read is cheap and streaming.
        tr = read_transcripts(source)
        triples = kg_triples(tr, mode=mode, dedup_turns=dedup_turns)
    manifest = materialize(triples, out_dir, parquet=parquet, turtle=turtle)
    n = sum(m["n_triples"] for m in manifest)
    return {
        "n_triples": n,
        "n_files": len(manifest),
        "wall_sec": time.time() - t0,
        "triples_per_sec": n / max(time.time() - t0, 1e-9),
    }


def run_resumable(
    input_files: list[str],
    out_dir: str,
    num_partitions: int = 8,
    mode: str = "fast",
) -> dict[int, ckpt.PartitionEntry]:
    """Partitioned, resumable run over a transcript Parquet file set.

    Each partition (a deterministic group of input files) is processed by
    its own sub-pipeline into out_dir/part=<id>/ with an atomic _SUCCESS
    marker; the manifest carries lineage + metrics.  Rerunning skips
    partitions whose _SUCCESS exists.  Correct because conversations never
    span input files in this layout (the writer partitions transcripts by
    conv hash — see tests/test_resume.py) — stated partitioning assumption.
    """
    import os
    import shutil

    groups = ckpt.plan_partitions(input_files, num_partitions)
    entries = ckpt.load_manifest(out_dir)
    for pid, files in enumerate(groups):
        if pid in entries and entries[pid].status == "done" and ckpt.partition_done(out_dir, pid):
            continue
        t0 = time.time()
        part_dir = f"{out_dir}/part={pid}"
        # An unfinished partition may hold part files from an interrupted
        # attempt; sort block splits are not reproducible across runs, so
        # stale content-addressed files would survive alongside the new
        # ones and double-count.  Clear the directory before reprocessing.
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        tr = read_transcripts(files)
        n_rows = tr.count()
        triples = kg_triples(tr, mode=mode)
        manifest = sinks.write_ntriples(triples, f"{part_dir}/nt", sort=True)
        errors = extract.extract_errors(tr).count()
        entries[pid] = ckpt.PartitionEntry(
            partition_id=pid,
            input_files=files,
            status="done",
            n_input_rows=n_rows,
            n_triples=sum(m["n_triples"] for m in manifest),
            n_errors=errors,
            wall_sec=time.time() - t0,
            output_dir=part_dir,
            finished_at=time.time(),
            # exact output-file lineage: consumers should read only these
            extra={"files": sorted(m["path"] for m in manifest)},
        )
        # persist the manifest entry BEFORE the _SUCCESS marker: a crash
        # between the two leaves the partition "not done" (re-run), never
        # "done with no lineage"
        ckpt.save_manifest(out_dir, entries)
        ckpt.mark_done(out_dir, pid)
    return entries


def kg_side_outputs(transcripts: ray.data.Dataset) -> dict[str, ray.data.Dataset]:
    return {
        "errors": extract.extract_errors(transcripts),
        "canonical_mentions": canonicalize_mentions(transcripts),
    }
