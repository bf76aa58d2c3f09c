"""Winnowing fingerprints: the classic guarantee plus determinism."""

from ifctordf_ray.stages.textstats import (
    WINNOW_K,
    WINNOW_W,
    WinnowFingerprinter,
)


def test_winnow_shared_run_guarantee():
    """Two docs sharing a run of >= K+W-1 words must share at least one
    fingerprint (the winnowing coverage guarantee)."""
    wf = WinnowFingerprinter()
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = K+W-1 words
    a = "one two three " + shared + " four five"
    b = "totally different prefix words " + shared
    fa, fb = set(wf.fingerprints(a)), set(wf.fingerprints(b))
    assert fa & fb
    # unrelated docs share nothing
    c = "completely unrelated content body here now with many words"
    assert not (fa & set(wf.fingerprints(c)))


def test_winnow_determinism_and_edges():
    wf = WinnowFingerprinter()
    t = "the quick brown fox jumps over the lazy dog"
    assert wf.fingerprints(t) == WinnowFingerprinter().fingerprints(t)
    assert wf.fingerprints("") == []
    assert len(wf.fingerprints("one two")) == 1  # sub-K doc: one whole-text gram
    # fewer grams than W: single whole-list window
    assert len(wf.fingerprints("one two three four")) == 1
