"""JSONL (newline-delimited JSON) source and sink for the documents
table — the interchange format most corpus tooling speaks.  The reference
ingests a text line-format from a directory listing (IfcSpfReader
showFiles/readModel, IfcSpfReader.java:120-160); this is the engine's
equivalent for document corpora: a directory of .jsonl shards in, a
directory of .jsonl shards out, streaming both ways.

Schema contract: each line is an object with the documents-table columns
(doc_id, text, lang, source, n_chars).  ``read_documents_jsonl``
normalizes column order and types to the canonical Arrow schema so
every downstream documents stage runs unchanged on JSONL input.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def read_documents_jsonl(path: str) -> ray.data.Dataset:
    """Stream a .jsonl file/directory as the canonical documents schema
    (pyarrow's block-based JSON reader underneath — no Python-object
    rows)."""
    ds = ray.data.read_json(path)

    def pin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {f.name: pc.cast(t[f.name], f.type) for f in DOCUMENTS_SCHEMA},
            schema=DOCUMENTS_SCHEMA,
        )

    return ds.map_batches(pin, batch_format="pyarrow")


def write_documents_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Sharded .json part files (one per block — resumable output
    layout, same discipline as the N-Triples sink)."""
    ds.write_json(out_dir)
