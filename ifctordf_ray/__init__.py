"""ifctordf_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine with the query/data-processing capabilities of
pipauwel/IFCtoRDF (reference at /root/reference), re-imagined for Parquet
tables of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts) at cluster scale.

Architecture (see SURVEY.md for the full mapping):
- ray.data.Dataset pipelines end to end; blocks are zero-copy Arrow.
- groupby(conv_id) + in-group sort(turn_idx) reassembles ordered
  conversations (analog of IfcSpfParser.readModel line reassembly,
  IfcSpfParser.java:24-58).
- map_batches over pyarrow batches runs mention detection and
  schema-guided (subj, pred, obj) triple extraction (analog of
  RDFWriter.createInstances/fillProperties, RDFWriter.java:147-628).
- groupby-aggregate canonical-ID assignment on surface-form keys replaces
  the reference's global literal-wrapper dedup map (RDFWriter.java:79,
  807-819) and its global idCounter (IfcSpfParser.java:13-14).
- a final distinct + sorted shuffle materializes deduplicated
  N-Triples/Parquet graph partitions with per-partition lineage manifests.

No code is copied from the reference; it is Java, this is Ray Data.
"""

__version__ = "0.1.0"
