"""CSV source and sink for the documents table — the third interchange
format next to parquet and JSONL (sources/jsonl.py).  Same contract as
the reference's directory-of-files ingest (IfcSpfReader showFiles,
IfcSpfReader.java:120-160): a directory of .csv shards in, a directory
of .csv shards out, streaming both ways via Arrow's block-based CSV
reader (no Python-object rows).

Quoting contract: document text can contain newlines, commas and
quotes; Arrow's writer quotes minimally and its reader handles
``newlines_in_values`` when told to, so the round trip is lossless —
EXCEPT that CSV cannot distinguish NULL text from the empty string.
``read_documents_csv`` therefore maps empty text back to NULL, which is
the documents-table convention (text is NULL for redacted docs).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ifctordf_ray.sources.jsonl import DOCUMENTS_SCHEMA


def read_documents_csv(path: str) -> ray.data.Dataset:
    """Stream a .csv file/directory as the canonical documents schema."""
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in DOCUMENTS_SCHEMA}
        ),
    )

    def pin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for f in DOCUMENTS_SCHEMA:
            c = pc.cast(t[f.name], f.type)
            if f.name == "text":
                # CSV writes NULL as empty field; restore the convention
                c = pc.if_else(pc.equal(c, pa.scalar("")), pa.scalar(None, f.type), c)
            cols[f.name] = c
        return pa.table(cols, schema=DOCUMENTS_SCHEMA)

    return ds.map_batches(pin, batch_format="pyarrow")


def write_documents_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Sharded .csv part files (one per block — resumable layout, same
    discipline as the N-Triples and JSONL sinks)."""
    ds.write_csv(out_dir)
