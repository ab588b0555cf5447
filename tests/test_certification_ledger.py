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
    CATALOG_PATH,
    EXCLUDE,
    SHARED_KEY,
    _catalog_sections,
    _closure_tables,
    _hash_fileset,
    _imports,
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


def test_registered_head_contains_all_stale_promotions():
    import m5_competition_kaggle_spark.queries as q

    importlib.reload(q)
    names = list(q.all_queries())
    assert len(names) >= 50
    head = set(names[:50])
    # Round-agnostic invariant: every promotion (stale or
    # never-certified) that FITS under the cap after the deliberate
    # picks must actually occupy a window slot; only cap overflow may
    # queue for later rounds.
    from m5_competition_kaggle_spark.queries._promotions import (
        STALE_PROMOTIONS,
    )
    fits = tuple(dict.fromkeys([*q._HEAD, *STALE_PROMOTIONS]))
    fits = fits[: q.HEAD_CAP]
    missing = [n for n in fits if n not in head]
    assert not missing, missing
    # deliberate picks always hold their slots
    for must in q._HEAD:
        assert must in head, must


# --- r5: per-table catalog sectioning (VERDICT r4 item 2) -------------

CATALOG_V1 = '''
from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "alpha": T.StructType([T.StructField("a", T.LongType())]),
    "beta": T.StructType([T.StructField("b", T.StringType())]),
}

def load_table(spark, sf_dir, name):
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}")
'''


def test_catalog_sections_split_tables_from_shared():
    s1 = _catalog_sections(CATALOG_V1)
    assert set(s1) == {SHARED_KEY, "alpha", "beta"}
    # one-table schema edit: only that table's section moves
    s2 = _catalog_sections(
        CATALOG_V1.replace('"b", T.StringType()', '"b", T.DoubleType()')
    )
    assert s2["beta"] != s1["beta"]
    assert s2["alpha"] == s1["alpha"]
    assert s2[SHARED_KEY] == s1[SHARED_KEY]
    # shared load-logic edit: shared section moves, tables don't
    s3 = _catalog_sections(
        CATALOG_V1.replace("def load_table", "def load_table2")
    )
    assert s3[SHARED_KEY] != s1[SHARED_KEY]
    assert s3["alpha"] == s1["alpha"] and s3["beta"] == s1["beta"]


def test_catalog_sections_conservative_fallbacks():
    assert _catalog_sections("not python ((((") is None
    assert _catalog_sections("X = 1") is None  # no SCHEMAS dict
    # computed key: can't attribute sections — whole-file fallback
    assert _catalog_sections("SCHEMAS = {f'{1}': 2}") is None


def test_real_catalog_sections_parse():
    src = open(CATALOG_PATH).read()
    sections = _catalog_sections(src)
    from m5_competition_kaggle_spark.sources.catalog import TABLES
    assert sections is not None
    assert set(sections) == set(TABLES) | {SHARED_KEY}


def test_one_table_edit_stales_only_consumers():
    """The blast-radius contract: a no-op-for-others edit to one table's
    schema section flips only that table's consumers stale."""
    files = {CATALOG_PATH, f"{PKG}/queries/core.py"}
    blobs = {p: "X" for p in files}
    cat1 = {SHARED_KEY: "s", "events": "e", "documents": "d"}
    cat2 = {SHARED_KEY: "s", "events": "e", "documents": "D"}  # doc edit
    ev_reader = {"events"}
    doc_reader = {"documents"}
    assert _hash_fileset(files, blobs, cat1, ev_reader) == \
        _hash_fileset(files, blobs, cat2, ev_reader)
    assert _hash_fileset(files, blobs, cat1, doc_reader) != \
        _hash_fileset(files, blobs, cat2, doc_reader)
    # shared-code edit still stales everyone
    cat3 = {SHARED_KEY: "S", "events": "e", "documents": "d"}
    assert _hash_fileset(files, blobs, cat1, ev_reader) != \
        _hash_fileset(files, blobs, cat3, ev_reader)
    # unknown table set (None) conservatively includes every section
    assert _hash_fileset(files, blobs, cat1, None) != \
        _hash_fileset(files, blobs, cat2, None)
    # a referenced table missing its section entry perturbs the hash
    assert _hash_fileset(files, blobs, cat1, {"events", "gone"}) != \
        _hash_fileset(files, blobs, cat1, {"events"})


def test_closure_tables_scan(tmp_path):
    reads = {
        "a.py": 'def q(s, d):\n    return load_table(s, d, "lineitem")\n',
        "b.py": 'PATH = f"{d}/events.parquet"\n',
        "c.py": "from x import register_views\n",
        "d.py": "y = 1\n",
    }

    def rf(p):
        return reads[p]

    tables = ("lineitem", "events", "orders")
    assert _closure_tables({"a.py"}, tables, rf) == {"lineitem"}
    # f-string path constants match via substring
    assert _closure_tables({"a.py", "b.py"}, tables, rf) == {
        "lineitem", "events"
    }
    # full-catalog surface → conservative ALL
    assert _closure_tables({"a.py", "c.py"}, tables, rf) is None
    # no literal at all → conservative ALL
    assert _closure_tables({"d.py"}, tables, rf) is None
    # catalog.py itself is skipped, not parsed
    assert _closure_tables({"a.py", CATALOG_PATH}, tables, rf) == {
        "lineitem"
    }


def test_relative_import_in_package_init(tmp_path):
    """ADVICE r4: `from . import core` inside pkg/queries/__init__.py
    must resolve to pkg.queries.core, not pkg.core."""
    d = tmp_path / "queries"
    d.mkdir()
    init = d / "__init__.py"
    init.write_text("from . import core\nfrom .. import config\n")
    import scripts.certification_ledger as L
    old = L.REPO
    try:
        L.REPO = str(tmp_path.parent)
        rel = str(init.relative_to(tmp_path.parent))
        got = _imports(rel, f"{PKG}.queries")
    finally:
        L.REPO = old
    assert f"{PKG}.queries.core" in got
    assert f"{PKG}.config" in got
    assert f"{PKG}.core" not in got
