"""The staleness contract of the certification ledger (r3 verdict item
2): banked driver-green rows are valid only for unchanged code, and the
ledger must PROVE that via per-query transitive code hashes — an edit to
a dependency module flips its consumers stale and auto-promotes them
into the head-50.
"""

import importlib
import sys

sys.path.insert(0, ".")

from scripts.certification_ledger import (  # noqa: E402
    EXCLUDE,
    _hash_fileset,
    dep_closure,
)

PKG = "m5_competition_kaggle_spark"


def test_closure_tracks_real_dependencies():
    c = dep_closure()
    ext = c[f"{PKG}.queries.extensions"]
    # x2_dedup_minhash (extensions) genuinely depends on dedup + text +
    # catalog — the exact case the r3 verdict flagged as unverified.
    assert f"{PKG}/operators/dedup.py" in ext
    assert f"{PKG}/functions/text.py" in ext
    assert f"{PKG}/sources/catalog.py" in ext
    # streaming queries do NOT depend on dedup: an edit there must not
    # stale them.
    stream = c[f"{PKG}.queries.streaming_shaped"]
    assert f"{PKG}/operators/dedup.py" not in stream
    assert f"{PKG}/sources/catalog.py" in stream
    # rotation metadata is excluded everywhere (a head rotation must not
    # invalidate certifications).
    for files in c.values():
        assert not files & EXCLUDE


def test_hash_flips_only_for_consumers():
    c = dep_closure()
    ext = c[f"{PKG}.queries.extensions"]
    stream = c[f"{PKG}.queries.streaming_shaped"]
    blobs = {p: "A" for p in ext | stream}
    ext_before = _hash_fileset(ext, blobs)
    stream_before = _hash_fileset(stream, blobs)
    # simulate an edit (even a comment-only one) to operators/dedup.py
    blobs[f"{PKG}/operators/dedup.py"] = "B"
    assert _hash_fileset(ext, blobs) != ext_before
    assert _hash_fileset(stream, blobs) == stream_before


def test_promotions_fill_after_deliberate_head(monkeypatch):
    import m5_competition_kaggle_spark.queries as q

    monkeypatch.setattr(q, "STALE_PROMOTIONS", ("zz_fake", q._HEAD[0]))
    eff = q._effective_head()
    assert len(eff) <= q.HEAD_CAP
    # deliberate picks keep their slots (a promotion never displaces
    # them, and a duplicate promotion dedups away) ...
    n_lead = min(len(q._HEAD), q.HEAD_CAP)
    assert eff[:n_lead] == q._HEAD[:n_lead]
    # ... and promotions fill whatever room remains.
    assert ("zz_fake" in eff) == (len(q._HEAD) < q.HEAD_CAP)


def test_registered_head_is_50_and_contains_x33():
    import m5_competition_kaggle_spark.queries as q

    importlib.reload(q)
    names = list(q.all_queries())
    assert len(names) >= 50
    head = names[:50]
    # r4 priority slots: the r3 FAIL and the semantically-changed queries
    for must in ("x33_source_caps", "x9_sim_topk",
                 "s8_stream_static_enrich", "x24_dedup_clusters"):
        assert must in head, must
