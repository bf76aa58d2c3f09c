"""Graph sinks: N-Triples text partitions and bucketed Parquet.

Analog of the reference's pluggable sink surface (parseModelToOutputStream /
parseModelToGraph / parseModelToStreamRdf, RDFWriter.java:95-109) —
re-expressed as Dataset consumers:

- `write_ntriples`: map_batches writer emitting one content-addressed
  `part-<md5>.nt` file per batch.  Content-addressing makes retried tasks
  and resumed runs idempotent: an existing part file is skipped, never
  rewritten (the "resumable output" contract).
- `write_graph_parquet`: bucketed Parquet (`bucket=<hex>` partition dirs,
  bucket = first hex digit of md5(subj)) so downstream readers can prune
  by subject and a failed run can skip finished buckets.
- `iter_triples`: the StreamRDF-analog consumer (ds.iter_batches).

Term serialization follows N-Triples: CURIEs expanded via schema.PREFIXES,
literals escaped (\\ \" \\n \\r \\t), datatype IRIs expanded.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data

from ifctordf_ray import schema as S

_ESCAPES = str.maketrans(
    {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
)

# datatype CURIEs the engine's `obj` encoding can carry (lexical^^dtype)
_KNOWN_DTYPES = (
    S.XSD_INTEGER, S.XSD_STRING, S.XSD_DATETIME, S.XSD_DOUBLE, S.XSD_BOOLEAN,
    S.XSD_HEXBINARY,
)


def _term_uri(curie: str) -> str:
    return f"<{S.expand_curie(curie)}>"


def _term_literal(obj: str) -> str:
    lex, sep, dtype = obj.rpartition("^^")
    if sep and dtype in _KNOWN_DTYPES:
        return f'"{lex.translate(_ESCAPES)}"^^<{S.expand_curie(dtype)}>'
    return f'"{obj.translate(_ESCAPES)}"'


import pyarrow.compute as _pc


def _expand_curies_vec(arr) -> pa.Array:
    """Vectorized CURIE -> <IRI>: per known prefix, an ANCHORED
    starts_with mask + head slice + join (all cheap non-regex kernels;
    the r3 profile showed the regex variant at ~3x the cost in the sink's
    hot path).  Anchoring preserves expand_curie's first-colon-only
    semantics — an IRI whose LOCAL part happens to contain 'inst:' /
    'rdf:' etc. must not be rewritten mid-string.  No prefix is a prefix
    of another, so the passes are independent."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    for pfx, base in S.PREFIXES.items():
        p = pfx + ":"
        m = _pc.starts_with(arr, pattern=p)
        if _pc.any(m).as_py():
            repl = _pc.binary_join_element_wise(
                base, _pc.utf8_slice_codeunits(arr, len(p), 1 << 30), ""
            )
            arr = _pc.if_else(m, repl, arr)
    return _pc.binary_join_element_wise(
        pa.nulls(len(arr), pa.string()).fill_null("<"), arr, ">", ""
    )


# closed predicate vocabulary: expansion = one hash lookup + dictionary
# take against these precomputed terms (S.PRED_NAMES is the whole domain)
_PRED_NAMES_ARR = pa.array(list(S.PRED_NAMES))
_PRED_FULL_NT = pa.array([f"<{S.expand_curie(p)}>" for p in S.PRED_NAMES])


def _expand_pred_vec(arr) -> pa.Array:
    """Predicate CURIE -> <IRI> via index_in + take (predicates come from
    the closed PRED_TABLE; falls back to the generic path for any term
    outside it, e.g. in user-authored triple tables)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    idx = _pc.index_in(arr, _PRED_NAMES_ARR)
    if _pc.any(_pc.is_null(idx)).as_py():
        return _expand_curies_vec(arr)
    return _pc.take(_PRED_FULL_NT, idx)


def _escape_literals_vec(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        arr = _pc.replace_substring(arr, pattern=raw, replacement=esc)
    return arr


def format_ntriples(batch: pa.Table) -> str:
    """Arrow-vectorized N-Triples serialization: term expansion, literal
    escaping, line assembly and the final newline join all run as C
    kernels — the per-row Python loop was the write path's hot spot
    (~45 s of a 65 s 20M-triple run at 8 CPUs)."""
    n = batch.num_rows
    if n == 0:
        return ""
    subj = _expand_curies_vec(batch["subj"])
    pred = _expand_pred_vec(batch["pred"])
    obj = batch["obj"].combine_chunks() if isinstance(batch["obj"], pa.ChunkedArray) else batch["obj"]
    kind = batch["obj_kind"]
    is_uri = _pc.equal(kind, "uri")

    # literal rendering: strip the FINAL '^^<known dtype>' suffix only
    # (a lexical may itself contain '^^xsd:string'): the suffix length is
    # known per dtype, so the strip is one negative-stop slice — exact
    # rpartition('^^') semantics, no reverse passes.
    # The ends_with mask is computed on the ORIGINAL obj AND masked with
    # is_null(dtype_tag) so at most ONE suffix is ever removed — testing
    # the already-stripped lex would double-strip a string literal whose
    # text itself ends in '^^xsd:double' etc. (ADVICE r2).
    lex_all = obj
    dtype_tag = pa.nulls(n, pa.string())
    for dt in _KNOWN_DTYPES:
        sfx = "^^" + dt
        has = _pc.and_(
            _pc.ends_with(obj, pattern=sfx), _pc.is_null(dtype_tag)
        )
        if _pc.any(has).as_py():
            stripped = _pc.utf8_slice_codeunits(obj, 0, -len(sfx))
            lex_all = _pc.if_else(has, stripped, lex_all)
            dtype_tag = _pc.if_else(has, pa.scalar(S.expand_curie(dt)), dtype_tag)
    esc = _escape_literals_vec(lex_all)
    quoted = _pc.binary_join_element_wise(
        pa.nulls(n, pa.string()).fill_null('"'), esc, '"', ""
    )
    with_dt = _pc.binary_join_element_wise(quoted, "^^<", dtype_tag, ">", "")
    lit_rendered = _pc.if_else(_pc.is_valid(dtype_tag), with_dt, quoted)

    obj_term = _pc.if_else(is_uri, _expand_curies_vec(obj), lit_rendered)
    lines = _pc.binary_join_element_wise(subj, pred, obj_term, ".", " ")
    flat = lines.combine_chunks() if isinstance(lines, pa.ChunkedArray) else lines
    list_arr = pa.ListArray.from_arrays(pa.array([0, n], pa.int32()), flat)
    return _pc.binary_join(list_arr, "\n")[0].as_py() + "\n"


def write_nt_batch(
    batch: pa.Table, out_dir: str, compression: str | None = None
) -> pa.Table:
    """Sink task: one batch -> one content-addressed .nt[.gz] file.
    Returns a manifest row per file (lineage: path, triple count, subject
    range) — collected small on the driver into manifest.json.  Stateless
    task, not an actor pool: no per-stage actor spawn; makedirs is
    idempotent.

    compression="gzip" writes .nt.gz (mtime pinned to 0 so the bytes are
    deterministic).  On a shared-disk node the text sink is the one
    non-scaling stage (measured ~0.57 efficiency 2->8 CPUs — see
    BASELINE.md); gzip trades ~4-5x fewer bytes through the disk/page
    cache for CPU that DOES scale, so it is the sink's scale path.
    Content addressing stays over the UNCOMPRESSED text, so resumed runs
    skip finished parts regardless of compression setting."""
    if batch.num_rows == 0:
        return pa.table(
            {"path": pa.array([], pa.string()),
             "n_triples": pa.array([], pa.int64()),
             "min_subj": pa.array([], pa.string()),
             "max_subj": pa.array([], pa.string()),
             "skipped": pa.array([], pa.bool_())}
        )
    os.makedirs(out_dir, exist_ok=True)
    # guarantee per-file sortedness regardless of upstream block
    # bundling (Ray may coalesce small sorted blocks out of order);
    # the batch is already mostly-sorted runs, so this is cheap.
    batch = batch.sort_by(
        [(c, "ascending") for c in ("subj", "pred", "obj", "obj_kind")]
    )
    content = format_ntriples(batch)
    h = hashlib.md5(content.encode("utf-8")).hexdigest()[:20]
    suffix = ".nt.gz" if compression == "gzip" else ".nt"
    path = os.path.join(out_dir, f"part-{h}{suffix}")
    skipped = os.path.exists(path)
    if not skipped:
        tmp = path + ".tmp"
        if compression == "gzip":
            import gzip

            with open(tmp, "wb") as raw:
                with gzip.GzipFile(
                    fileobj=raw, mode="wb", compresslevel=1, mtime=0
                ) as f:
                    f.write(content.encode("utf-8"))
        else:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(content)
        os.replace(tmp, path)  # atomic publish
    import pyarrow.compute as pc

    return pa.table(
        {
            "path": pa.array([path], pa.string()),
            "n_triples": pa.array([batch.num_rows], pa.int64()),
            "min_subj": pa.array([pc.min(batch["subj"]).as_py()], pa.string()),
            "max_subj": pa.array([pc.max(batch["subj"]).as_py()], pa.string()),
            "skipped": pa.array([skipped], pa.bool_()),
        }
    )


NT_ROWS_PER_FILE = 1 << 18  # ~22 MB .nt parts


def write_ntriples(
    triples: ray.data.Dataset, out_dir: str, sort: bool = True,
    rows_per_file: int = NT_ROWS_PER_FILE, compression: str | None = None,
) -> list[dict]:
    """Final sorted-shuffle materialization (north-star step): sort by subj
    (range shuffle) then stream batches through the content-addressed
    writer.  Returns the manifest rows (small).

    Each .nt part is one `rows_per_file` window of a sorted block: blocks
    arrive sorted (from the range sort / sorted distinct) and Ray slices
    batches sequentially, so every part is internally sorted and covers a
    disjoint subject range (recorded as min_subj/max_subj).  Bounded part
    size keeps the format+md5+write task short — many small tasks
    parallelize the sink where one-file-per-block starved it (measured
    25.7 s -> 11 s at 8 CPUs for 20.6M triples).  Global order across
    files is given by the manifest ranges, not filenames."""
    ds = triples.sort("subj") if sort else triples
    manifest = ds.map_batches(
        write_nt_batch,
        fn_kwargs={"out_dir": out_dir, "compression": compression},
        batch_format="pyarrow",
        batch_size=rows_per_file,
    ).take_all()
    return manifest


# --------------------------------------------------------------------------
# Turtle sink (the reference's PRIMARY output: a .ttl file opened with a
# # baseURI comment + @prefix block, RDFWriter.java:111-122,
# IfcSpfReader.java:312-315)
# --------------------------------------------------------------------------
import re as _re

# chars safe in a Turtle PN_LOCAL without escaping (conservative subset:
# rdflib-style writers fall back to <full IRI> outside it)
_PN_LOCAL_SAFE = _re.compile(r"[A-Za-z0-9_][A-Za-z0-9_.-]*$")


def _term_turtle(curie: str) -> str:
    """CURIE -> Turtle term: prefixed name when the local part is PN_LOCAL-
    safe, else the expanded <IRI> (standard writer fallback; our instance
    IRIs contain '/' in the local part, which Turtle prefixed names do not
    allow unescaped)."""
    pfx, sep, local = curie.partition(":")
    if sep and pfx in S.PREFIXES and _PN_LOCAL_SAFE.match(local) and not local.endswith("."):
        return curie
    return _term_uri(curie)


def turtle_header(base: str | None = None) -> str:
    """# baseURI comment + @prefix block (one per schema namespace)."""
    lines = [f"# baseURI: {base or S.PREFIXES['inst']}"]
    for pfx, iri in sorted(S.PREFIXES.items()):
        lines.append(f"@prefix {pfx}: <{iri}> .")
    return "\n".join(lines) + "\n\n"


def _term_turtle_vec(arr) -> pa.Array:
    """Vectorized CURIE -> Turtle term: prefixed name where the local part
    is PN_LOCAL-safe, else <full IRI>.  The safety test vectorizes as a
    regex match on the whole CURIE."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    pfx_alt = "|".join(S.PREFIXES)
    safe = pc.match_substring_regex(
        arr, pattern=rf"^({pfx_alt}):[A-Za-z0-9_][A-Za-z0-9_.-]*$"
    )
    safe = pc.and_(safe, pc.invert(pc.ends_with(arr, pattern=".")))
    return pc.if_else(safe, arr, _expand_curies_vec(arr))


def format_turtle(batch: pa.Table) -> str:
    """Triples -> Turtle statements (no header), Arrow-vectorized like
    format_ntriples.  Literal escaping and datatype handling shared with
    the N-Triples writer; object lists are not compacted (one statement
    per triple keeps the writer streaming)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return ""
    subj = _term_turtle_vec(batch["subj"])
    pred_raw = batch["pred"].combine_chunks() if isinstance(batch["pred"], pa.ChunkedArray) else batch["pred"]
    pred = pc.if_else(
        pc.equal(pred_raw, S.RDF_TYPE), pa.scalar("a"), _term_turtle_vec(pred_raw)
    )
    obj = batch["obj"].combine_chunks() if isinstance(batch["obj"], pa.ChunkedArray) else batch["obj"]
    kind = batch["obj_kind"]
    is_uri = pc.equal(kind, "uri")

    # same single-strip discipline as format_ntriples: mask on the
    # ORIGINAL obj + untagged rows only (ADVICE r2 double-strip fix);
    # known suffix length -> one negative-stop slice
    lex_all = obj
    dtype_tag = pa.nulls(n, pa.string())
    for dt in _KNOWN_DTYPES:
        sfx = "^^" + dt
        has = pc.and_(pc.ends_with(obj, pattern=sfx), pc.is_null(dtype_tag))
        if pc.any(has).as_py():
            stripped = pc.utf8_slice_codeunits(obj, 0, -len(sfx))
            lex_all = pc.if_else(has, stripped, lex_all)
            dtype_tag = pc.if_else(has, pa.scalar(dt), dtype_tag)
    esc = _escape_literals_vec(lex_all)
    quoted = pc.binary_join_element_wise(
        pa.nulls(n, pa.string()).fill_null('"'), esc, '"', ""
    )
    with_dt = pc.binary_join_element_wise(
        quoted, "^^", _term_turtle_vec(dtype_tag.combine_chunks() if isinstance(dtype_tag, pa.ChunkedArray) else dtype_tag), ""
    )
    lit = pc.if_else(pc.is_valid(dtype_tag), with_dt, quoted)
    obj_term = pc.if_else(is_uri, _term_turtle_vec(obj), lit)
    lines = pc.binary_join_element_wise(subj, pred, obj_term, ".", " ")
    flat = lines.combine_chunks() if isinstance(lines, pa.ChunkedArray) else lines
    list_arr = pa.ListArray.from_arrays(pa.array([0, n], pa.int32()), flat)
    return pc.binary_join(list_arr, "\n")[0].as_py() + "\n"


def write_turtle_batch(batch: pa.Table, out_dir: str) -> pa.Table:
    """Sink task: one batch -> one content-addressed .ttl file, each with
    its own # baseURI + @prefix header (every part parses standalone)."""
    if batch.num_rows == 0:
        return pa.table(
            {"path": pa.array([], pa.string()),
             "n_triples": pa.array([], pa.int64()),
             "skipped": pa.array([], pa.bool_())}
        )
    os.makedirs(out_dir, exist_ok=True)
    batch = batch.sort_by(
        [(c, "ascending") for c in ("subj", "pred", "obj", "obj_kind")]
    )
    content = turtle_header() + format_turtle(batch)
    h = hashlib.md5(content.encode("utf-8")).hexdigest()[:20]
    path = os.path.join(out_dir, f"part-{h}.ttl")
    skipped = os.path.exists(path)
    if not skipped:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(content)
        os.replace(tmp, path)
    return pa.table(
        {
            "path": pa.array([path], pa.string()),
            "n_triples": pa.array([batch.num_rows], pa.int64()),
            "skipped": pa.array([skipped], pa.bool_()),
        }
    )


def write_turtle(
    triples: ray.data.Dataset, out_dir: str, sort: bool = True
) -> list[dict]:
    """Turtle materialization (S7: the reference user's day-one output)."""
    ds = triples.sort("subj") if sort else triples
    return ds.map_batches(
        write_turtle_batch,
        fn_kwargs={"out_dir": out_dir},
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()


def parse_turtle(text: str) -> set[tuple[str, str, str, str]]:
    """Minimal Turtle-subset reader for ROUND-TRIP TESTS of this writer's
    output only (one statement per line, no multiline literals): returns
    (subj, pred, obj, obj_kind) tuples in the engine's compact encoding.
    Not a general Turtle parser."""
    prefixes: dict[str, str] = {}
    rev = {}
    out = set()

    def compact(iri: str) -> str:
        for pfx, base in prefixes.items():
            if iri.startswith(base):
                return f"{pfx}:{iri[len(base):]}"
        return iri

    term_re = _re.compile(
        r'(<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^\S+)?|[A-Za-z][\w.-]*:[^\s]*|a)'
    )
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("@prefix"):
            m = _re.match(r"@prefix\s+([\w-]*):\s*<([^>]*)>\s*\.", line)
            if m:
                prefixes[m.group(1)] = m.group(2)
                rev[m.group(2)] = m.group(1)
            continue
        terms = term_re.findall(line)
        if len(terms) < 3:
            raise ValueError(f"unparseable statement: {line!r}")
        s, p, o = terms[0], terms[1], terms[2]

        def resolve(t: str) -> str:
            if t == "a":
                return S.RDF_TYPE
            if t.startswith("<"):
                return compact(t[1:-1])
            pfx, _, local = t.partition(":")
            return compact(prefixes.get(pfx, pfx + ":") + local)

        if o.startswith('"'):
            m = _re.match(r'"((?:[^"\\]|\\.)*)"(?:\^\^(\S+))?$', o)
            lex = m.group(1)
            for esc, ch in (("\\\\", "\\"), ('\\"', '"'), ("\\n", "\n"),
                            ("\\r", "\r"), ("\\t", "\t")):
                lex = lex.replace(esc, ch)
            dtype = m.group(2)
            dt = resolve(dtype) if dtype else S.XSD_STRING
            out.add((resolve(s), resolve(p), f"{lex}^^{dt}", "literal"))
        else:
            out.add((resolve(s), resolve(p), resolve(o), "uri"))
    return out


def add_subject_bucket(batch: pa.Table) -> pa.Table:
    """bucket = first hex digit of md5(subj) -> 16 stable partitions."""
    subs = batch["subj"].to_pylist()
    buckets = [hashlib.md5(s.encode("utf-8")).hexdigest()[0] for s in subs]
    return batch.append_column("bucket", pa.array(buckets, pa.string()))


def write_graph_parquet(
    triples: ray.data.Dataset, out_dir: str, compression: str = "zstd"
) -> None:
    """Bucketed Parquet graph partitions (hive layout bucket=<hex>).

    zstd default: the flagship's E2E scaling is bounded by bytes through
    the ONE shared disk of this box (BASELINE.md) — columnar + zstd
    moves the sink from disk-bound to CPU work, which DOES scale with
    workers.  This is the north star's sanctioned graph materialization
    alongside .nt text."""
    triples.map_batches(add_subject_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"], compression=compression
    )


def write_fastset_part(
    batch: pa.Table,
    out_dir: str,
    compression: str = "zstd",
    split: bool = True,
) -> pa.Table:
    """Sink task of the exchange-light Parquet materialization
    (kg.materialize_parquet_fastset): write this batch's
    conversation-scoped rows as ONE content-addressed locally-sorted
    Parquet part, and RETURN the shared-wrapper compact rows (the only
    slice that can hold cross-batch duplicates — extract.
    SHARED_SUBJ_WIRE_CODES) to the downstream distinct exchange.

    split=False: the batch is already-public-schema deduplicated shared
    triples; write everything, return a manifest-row table.

    Content-addressed filenames (md5 of the serialized bytes) make
    retried / lineage-recomputed tasks idempotent: same table -> same
    bytes -> same name, and os.replace is atomic.  Stateless task, not
    an actor pool."""
    import io

    from ifctordf_ray.stages.extract import (
        SHARED_SUBJ_WIRE_CODES,
        decode_compact_batch,
    )

    def _manifest(rows: list[tuple[str, int]]) -> pa.Table:
        return pa.table(
            {
                "path": pa.array([p for p, _ in rows], pa.string()),
                "n_triples": pa.array([n for _, n in rows], pa.int64()),
            }
        )

    if split:
        first = _pc.utf8_slice_codeunits(batch["subj"], 0, 1)
        shared_mask = _pc.is_in(
            first, pa.array(list(SHARED_SUBJ_WIRE_CODES), pa.string())
        )
        to_write = decode_compact_batch(batch.filter(_pc.invert(shared_mask)))
        ret = batch.filter(shared_mask)
    else:
        to_write = batch
        ret = None
    if to_write.num_rows == 0:
        return ret if ret is not None else _manifest([])
    os.makedirs(out_dir, exist_ok=True)
    # local subject sort: deterministic file bytes for a given batch
    # content + tight-ish row-group stats; global order is NOT promised
    # by this layout (that is the sorted materializations' contract)
    to_write = to_write.sort_by(
        [(c, "ascending") for c in ("subj", "pred", "obj", "obj_kind")]
    )
    buf = io.BytesIO()
    import pyarrow.parquet as _pq

    _pq.write_table(to_write, buf, compression=compression)
    data = buf.getvalue()
    h = hashlib.md5(data).hexdigest()[:20]
    path = os.path.join(out_dir, f"part-{h}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return ret if ret is not None else _manifest([(path, to_write.num_rows)])


def read_graph_parquet(out_dir: str) -> ray.data.Dataset:
    """Load a graph written by write_graph_parquet back as a triples
    Dataset (subject-bucket hive partitions pruned at the read for
    bucket-targeted queries; here the full graph).  Completes the
    sink/source pair so downstream pipelines can consume materialized
    graphs without reparsing text."""
    from ifctordf_ray.sources.transcripts import clean_read_parquet

    ds = clean_read_parquet(out_dir)
    return ds.map_batches(
        lambda t: t.select(["subj", "pred", "obj", "obj_kind"]),
        batch_format="pyarrow",
    )


def subject_triples(out_dir: str, subj: str) -> ray.data.Dataset:
    """Point lookup on a materialized graph: only the ONE
    `bucket=<first-md5-hex-digit>` hive partition the subject hashes to
    is read (15/16 of the graph never leaves storage), then an exact
    subject filter.  The prune-at-the-read access path the bucketed
    layout exists for."""
    from ifctordf_ray.sources.transcripts import clean_read_parquet

    bucket = hashlib.md5(subj.encode("utf-8")).hexdigest()[0]
    ds = clean_read_parquet(f"{out_dir}/bucket={bucket}")
    s = subj

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(_pc.equal(t["subj"], s)).select(
            ["subj", "pred", "obj", "obj_kind"]
        )

    return ds.map_batches(flt, batch_format="pyarrow")


def iter_triples(triples: ray.data.Dataset, batch_size: int = 65536):
    """StreamRDF-analog consumer (parseModelToStreamRdf,
    IfcSpfReader.java:357-365): yields pyarrow batches incrementally."""
    yield from triples.iter_batches(batch_size=batch_size, batch_format="pyarrow")


# --------------------------------------------------------------------------
# N-Triples source (completes the sink/source pair for .nt, as
# read_graph_parquet does for Parquet; the readModel/S5 analog for the
# engine's own text output)
# --------------------------------------------------------------------------
_NT_LINE_RE = (
    r'^<(?P<s>[^>]*)> <(?P<p>[^>]*)> (?P<o><[^>]*>|"(?:[^"\\]|\\.)*"'
    r"(?:\^\^<[^>]*>)?) \.$"
)


def _compact_iri_vec(arr) -> pa.Array:
    """Full IRI -> engine CURIE (reverse of _expand_curies_vec)."""
    for pfx, base in S.PREFIXES.items():
        m = _pc.starts_with(arr, pattern=base)
        if _pc.any(m).as_py():
            repl = _pc.binary_join_element_wise(
                pfx + ":", _pc.utf8_slice_codeunits(arr, len(base), 1 << 30), ""
            )
            arr = _pc.if_else(m, repl, arr)
    return arr


def _unescape_literals_vec(arr) -> pa.Array:
    """Reverse of _escape_literals_vec.  '\\\\' goes through a sentinel
    first so an escaped backslash never merges with a following n/r/t."""
    arr = _pc.replace_substring(arr, pattern="\\\\", replacement="\x00")
    for esc, raw in (('\\"', '"'), ("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t")):
        arr = _pc.replace_substring(arr, pattern=esc, replacement=raw)
    return _pc.replace_substring(arr, pattern="\x00", replacement="\\")


def parse_ntriples_batch(batch: pa.Table) -> pa.Table:
    """Vectorized N-Triples line parse (this engine's writer subset: one
    statement per line, URIs or typed/plain literals, no blank nodes):
    one extract_regex pass + Arrow string kernels, no per-row Python."""
    lines = batch["text"]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    parts = _pc.extract_regex(lines, pattern=_NT_LINE_RE)
    if _pc.any(_pc.is_null(parts)).as_py():
        bad = lines.filter(_pc.is_null(parts)).slice(0, 3).to_pylist()
        raise ValueError(f"unparseable N-Triples line(s): {bad!r}")
    s = _compact_iri_vec(_pc.struct_field(parts, "s"))
    p = _compact_iri_vec(_pc.struct_field(parts, "p"))
    o = _pc.struct_field(parts, "o")
    is_uri = _pc.starts_with(o, pattern="<")
    # uri objects: strip <>
    o_uri = _compact_iri_vec(_pc.utf8_slice_codeunits(o, 1, -1))
    # literal objects: '"lex"' or '"lex"^^<dtype>' -> engine lex^^curie
    # (plain literals are written by this engine only for unknown dtypes;
    # its own output always carries ^^<dtype> for typed and plain quotes
    # for untyped, which compacts to the bare lexical)
    has_dt = _pc.ends_with(o, pattern=">")
    # find the closing quote of the lexical: for typed form the suffix is
    # '"^^<dtype>', for plain it is the final '"'
    lex_typed = _pc.replace_substring_regex(
        o, pattern=r'^"((?:[^"\\]|\\.)*)"\^\^<([^>]*)>$', replacement=r"\1"
    )
    dt_typed = _pc.replace_substring_regex(
        o, pattern=r'^"((?:[^"\\]|\\.)*)"\^\^<([^>]*)>$', replacement=r"\2"
    )
    lex_plain = _pc.replace_substring_regex(
        o, pattern=r'^"((?:[^"\\]|\\.)*)"$', replacement=r"\1"
    )
    lex = _pc.if_else(has_dt, lex_typed, lex_plain)
    lex = _unescape_literals_vec(lex)
    o_lit = _pc.if_else(
        has_dt,
        _pc.binary_join_element_wise(lex, _compact_iri_vec(dt_typed), "^^"),
        lex,
    )
    obj = _pc.if_else(is_uri, o_uri, o_lit)
    kind = _pc.if_else(is_uri, pa.scalar("uri"), pa.scalar("literal"))
    return pa.table({"subj": s, "pred": p, "obj": obj, "obj_kind": kind})


def read_ntriples(paths: str | list[str]) -> ray.data.Dataset:
    """Load .nt partitions written by write_ntriples back as a triples
    Dataset — the text half of the sink/source pair (the Parquet half is
    read_graph_parquet).  Distributed text read, vectorized parse."""
    import ray.data as rd

    ds = rd.read_text(
        paths,
        file_extensions=["nt", "gz"],
        arrow_open_stream_args={"compression": "detect"},
    )
    return ds.map_batches(parse_ntriples_batch, batch_format="pyarrow")
