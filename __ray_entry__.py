"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself before importing this module:
nothing here (or in ifctordf_ray) calls ray.init()/ray.shutdown().

- entry(): flagship KG pipeline on /root/testdata/sf0.001 -> triples Dataset.
- queries(): one callable per implemented operator/pipeline (SURVEY.md §2).
- oracle_sql(): matching DuckDB SQL over the registered parquet views;
  omitted for non-SQL-expressible ops (driver records rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: transcripts (derived from events) -> deduplicated KG
    triple set, grouped (groupby conv_id) assembly path."""
    from ifctordf_ray.pipelines import kg

    return kg.kg_from_events("/root/testdata/sf0.001", mode="grouped")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def _q_kg_transcripts(sf_dir: str):
    from ifctordf_ray.sources.transcripts import transcripts_from_events

    return transcripts_from_events(sf_dir)


def _q_kg_triples(sf_dir: str):
    from ifctordf_ray.pipelines import kg

    return kg.kg_from_events(sf_dir, mode="fast")


def _q_kg_triples_grouped(sf_dir: str):
    from ifctordf_ray.pipelines import kg

    return kg.kg_from_events(sf_dir, mode="grouped")


def _q_kg_errors(sf_dir: str):
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.extract import extract_errors

    return extract_errors(transcripts_from_events(sf_dir))


def _q_kg_canonical_mentions(sf_dir: str):
    from ifctordf_ray.sources.transcripts import transcripts_from_events
    from ifctordf_ray.stages.canonicalize import canonicalize_mentions

    return canonicalize_mentions(transcripts_from_events(sf_dir))


def _q_kg_predicate_stats(sf_dir: str):
    from ray.data.aggregate import Count

    from ifctordf_ray.pipelines import kg

    return (
        kg.kg_from_events(sf_dir, mode="fast")
        .groupby("pred")
        .aggregate(Count(alias_name="n_triples"))
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_transcripts": _q_kg_transcripts,
        "kg_triples": _q_kg_triples,
        "kg_triples_grouped": _q_kg_triples_grouped,
        "kg_errors": _q_kg_errors,
        "kg_canonical_mentions": _q_kg_canonical_mentions,
        "kg_predicate_stats": _q_kg_predicate_stats,
    }


def oracle_sql() -> dict[str, str]:
    from ifctordf_ray import sql_oracle as O

    return {
        "kg_transcripts": O.kg_transcripts_sql(),
        "kg_triples": O.kg_triples_sql(),
        "kg_triples_grouped": O.kg_triples_sql(),
        "kg_errors": O.kg_errors_sql(),
        "kg_canonical_mentions": O.kg_canonical_mentions_sql(),
        "kg_predicate_stats": O.kg_predicate_stats_sql(),
    }
