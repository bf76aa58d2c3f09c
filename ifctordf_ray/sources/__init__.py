from ifctordf_ray.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    transcripts_from_events,
    transcripts_from_events_sql,
)
