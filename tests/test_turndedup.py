"""f11 fixture: exact dedup of byte-identical turns, first-seen wins,
references redirected (resolveDuplicates + duplicate-redirect-map analog,
IfcSpfParser.java:147-165, 184-187)."""

import ray.data

from ifctordf_ray.sources.transcripts import transcripts_table
from ifctordf_ray.stages import turndedup


ROWS = [
    {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "hello"},
    {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "hello"},   # dup of 0
    {"conv_id": "c", "turn_idx": 2, "role": "assistant", "text": "hi"},
    {"conv_id": "c", "turn_idx": 3, "role": "user", "text": "hello"},   # dup of 0
    {"conv_id": "d", "turn_idx": 0, "role": "user", "text": "hello"},   # other conv: kept
]


def test_dedup_turns_first_seen():
    ds = ray.data.from_arrow(transcripts_table(ROWS))
    kept = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in turndedup.dedup_turns(ds).take_all()
    )
    assert kept == [("c", 0), ("c", 2), ("d", 0)]


def test_turn_redirects():
    ds = ray.data.from_arrow(transcripts_table(ROWS))
    red = sorted(
        (r["conv_id"], r["dup_idx"], r["keep_idx"])
        for r in turndedup.turn_redirects(ds).take_all()
    )
    assert red == [("c", 1, 0), ("c", 3, 0)]


def test_ts_not_part_of_content_key():
    # dup turns have different ts (transcripts_table derives ts from idx)
    ds = ray.data.from_arrow(transcripts_table(ROWS[:2]))
    assert turndedup.dedup_turns(ds).count() == 1
