"""Split-drift JS divergence: cross-engine parity, an independent
pure-Python reference, and the identical-halves-score-zero property."""

import hashlib
import math
import re
from collections import Counter

import duckdb
import pyarrow.parquet as pq

from ifctordf_ray.stages.terms import (
    DRIFT_DIM,
    JS_SCALE,
    split_drift,
    split_drift_sql,
)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _py_reference(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n0, n1 = Counter(), Counter()
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        side = _h(str(d)) % 2
        c = n1 if side else n0
        for w in re.findall(r"[a-z0-9]+", (x or "").lower()):
            c[_h(w) % DRIFT_DIM] += 1
    t0, t1 = float(sum(n0.values())), float(sum(n1.values()))
    out = {}
    for b in range(DRIFT_DIM):
        p = (n0[b] + 1.0) / (t0 + DRIFT_DIM)
        q = (n1[b] + 1.0) / (t1 + DRIFT_DIM)
        m = (p + q) / 2.0
        js = 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        out[b] = (n0[b], n1[b], int(math.floor(js * JS_SCALE + 0.5)))
    return out


def test_split_drift(sf_small, ray_session):
    ref = _py_reference(sf_small)
    eng = split_drift(sf_small).to_pandas()
    assert len(eng) == DRIFT_DIM
    for r in eng.itertuples():
        assert (r.n_train, r.n_valid, r.js_nano) == ref[r.bucket], r.bucket
    # both halves populated, and drift is small but non-zero (the split
    # is random-by-hash, so distributions differ only by sampling noise)
    assert eng.n_train.sum() > 0 and eng.n_valid.sum() > 0
    assert eng.js_nano.sum() > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(split_drift_sql()).df().sort_values("bucket")
    a = eng.sort_values("bucket")
    assert list(a.js_nano) == list(sql.js_nano)
    assert list(a.n_train) == list(sql.n_train)


def test_split_drift_identical_halves_zero():
    """JS of a distribution against itself is exactly 0 in the quantized
    formula (p == q -> ln(p/m) == ln(1) == 0)."""
    import math

    for n, tot in ((0, 10.0), (5, 10.0), (100, 1000.0)):
        p = (n + 1.0) / (tot + DRIFT_DIM)
        q = (n + 1.0) / (tot + DRIFT_DIM)
        m = (p + q) / 2.0
        js = 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        assert int(math.floor(js * JS_SCALE + 0.5)) == 0


def test_lang_temperature_mix(sf_small, ray_session):
    """Temperature mixture: parity + independent reference + the
    upweighting property (low-resource share_ratio > raw count ratio)."""
    import math

    import duckdb
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.textstats import (
        MIX_ALPHA,
        MIX_SCALE,
        lang_temperature_mix,
        lang_temperature_mix_sql,
    )

    eng = lang_temperature_mix(sf_small).to_pandas().sort_values("lang")
    t = pq.read_table(f"{sf_small}/documents.parquet", columns=["lang"]).to_pandas()
    counts = t.lang.value_counts().to_dict()
    ws = {
        lg: int(math.floor(math.exp(MIX_ALPHA * math.log(n)) * MIX_SCALE + 0.5))
        for lg, n in counts.items()
    }
    tot = sum(ws.values())
    assert len(eng) == len(counts)
    for r in eng.itertuples():
        assert r.n_docs == counts[r.lang]
        assert r.w_micro == ws[r.lang]
        assert r.share_micro == ws[r.lang] * MIX_SCALE // tot

    # alpha < 1 upweights the rarest language vs proportional sampling
    rare = min(counts, key=counts.get)
    n_total = sum(counts.values())
    rare_share = eng.set_index("lang").loc[rare].share_micro / MIX_SCALE
    assert rare_share > counts[rare] / n_total

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(lang_temperature_mix_sql()).df().sort_values("lang")
    assert list(eng.share_micro) == list(sql.share_micro)
    assert list(eng.w_micro) == list(sql.w_micro)
