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

    # synthesize a deliberate pick: _HEAD is legitimately EMPTY in
    # rounds where the promotion queue fills the whole window (r8)
    monkeypatch.setattr(q, "_HEAD", ("zz_pick",))
    monkeypatch.setattr(q, "STALE_PROMOTIONS", ("zz_fake", "zz_pick"))
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


def test_semantic_normalization_ignores_wording_only_edits():
    """r10: the staleness hash is AST-normalized — docstring/comment/
    formatting edits (the events.py watermark-erratum class) must not
    stale banked rows, while any behavior-reachable change still must."""
    from scripts.certification_ledger import _normalize_py

    v1 = (
        b'"""Module doc A."""\n\n'
        b"def f(x):\n"
        b'    """inner doc"""\n'
        b"    # a comment\n"
        b"    return x + 1\n"
    )
    v2 = (  # reworded docs, new comment, extra blank lines — same code
        b'"""Module doc B, fully reworded."""\n\n\n'
        b"def f(x):\n"
        b'    """other words"""\n'
        b"    return x + 1  # different comment\n"
    )
    v3 = b'"""Module doc A."""\n\ndef f(x):\n    return x + 2\n'
    # a non-docstring string constant IS behavior (e.g. a column name)
    v4 = v1.replace(b"return x + 1", b'return x + 1 or "col"')
    assert _normalize_py(v1) == _normalize_py(v2)
    assert _normalize_py(v1) != _normalize_py(v3)
    assert _normalize_py(v1) != _normalize_py(v4)
    # unparseable input: conservative verbatim fallback
    junk = b"not python (((("
    assert _normalize_py(junk) == junk


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


# --- r7: per-function module sectioning (VERDICT r6 items 4/6) --------

from scripts.certification_ledger import (  # noqa: E402
    SECTIONED_MODULES,
    _def_sections,
    _node_refs,
    _sect_attrib,
)

MOD_V1 = '''
"""docstring"""
from pyspark.sql import functions as F

QUANT = 1000

def alpha(df):
    return _helper(df) + QUANT

def _helper(df):
    return df

def beta(df):
    return df * 2
'''


def test_def_sections_split_and_localize():
    s1 = _def_sections(MOD_V1)
    assert set(s1) == {SHARED_KEY, "alpha", "_helper", "beta"}
    # one-function edit moves only that section
    s2 = _def_sections(MOD_V1.replace("df * 2", "df * 3"))
    assert s2["beta"] != s1["beta"]
    assert s2["alpha"] == s1["alpha"]
    assert s2[SHARED_KEY] == s1[SHARED_KEY]
    # shared-constant edit moves only shared
    s3 = _def_sections(MOD_V1.replace("QUANT = 1000", "QUANT = 999"))
    assert s3[SHARED_KEY] != s1[SHARED_KEY]
    assert s3["alpha"] == s1["alpha"] and s3["beta"] == s1["beta"]


def test_def_sections_conservative_fallbacks():
    assert _def_sections("not python ((((") is None
    # duplicate top-level def names (conditional redefinition)
    assert _def_sections("def f():\n    pass\ndef f():\n    pass\n") is None
    # module-level executable code reaching a package import: a hidden
    # cross-module dependency attribution can't see -> whole-file
    src = (
        "from m5_competition_kaggle_spark.functions.text import h64\n"
        "K = h64('x')\n"
    )
    assert _def_sections(src) is None
    # ... but an import alone (call sites inside defs) sections fine
    src2 = (
        "from m5_competition_kaggle_spark.functions.text import h64\n"
        "def g(v):\n    return h64(v)\n"
    )
    assert _def_sections(src2) is not None


def test_def_sections_decorator_in_span():
    src = "import functools\n\n@functools.cache\ndef f():\n    return 1\n"
    s1 = _def_sections(src)
    s2 = _def_sections(src.replace("functools.cache", "functools.lru_cache()"))
    assert s1 is not None and s2 is not None
    assert s1["f"] != s2["f"]  # decorator edit is a function edit
    assert s1[SHARED_KEY] == s2[SHARED_KEY]


def test_hash_fileset_sectioned_module_blast_radius():
    files = {"pkg/operators/op.py", "pkg/queries/q.py"}
    blobs = {p: "X" for p in files}
    sec1 = {SHARED_KEY: "s", "used_fn": "u", "other_fn": "o"}
    sec2 = {SHARED_KEY: "s", "used_fn": "u", "other_fn": "O"}  # edit other
    ms1 = {"pkg/operators/op.py": sec1}
    ms2 = {"pkg/operators/op.py": sec2}
    at = {"pkg/operators/op.py": {"used_fn"}}
    # edit to an UNattributed function does not flip the consumer ...
    assert _hash_fileset(files, blobs, None, None, ms1, at) == \
        _hash_fileset(files, blobs, None, None, ms2, at)
    # ... an edit to the attributed one does
    sec3 = {SHARED_KEY: "s", "used_fn": "U", "other_fn": "o"}
    assert _hash_fileset(files, blobs, None, None, ms1, at) != \
        _hash_fileset(files, blobs, None, None, {"pkg/operators/op.py": sec3}, at)
    # ... a shared (imports/constants) edit stales everyone
    sec4 = {SHARED_KEY: "S", "used_fn": "u", "other_fn": "o"}
    assert _hash_fileset(files, blobs, None, None, ms1, at) != \
        _hash_fileset(files, blobs, None, None, {"pkg/operators/op.py": sec4}, at)
    # attrib=None conservatively includes every section
    assert _hash_fileset(files, blobs, None, None, ms1, None) != \
        _hash_fileset(files, blobs, None, None, ms2, None)
    # an attributed name whose section vanished (rename) perturbs
    at_gone = {"pkg/operators/op.py": {"used_fn", "gone_fn"}}
    assert _hash_fileset(files, blobs, None, None, ms1, at_gone) != \
        _hash_fileset(files, blobs, None, None, ms1, at)


def _mini_repo(tmp_path, op_src, q_src, extra=None):
    import scripts.certification_ledger as L
    opdir = tmp_path / PKG / "operators"
    qdir = tmp_path / PKG / "queries"
    opdir.mkdir(parents=True)
    qdir.mkdir(parents=True)
    (opdir / "simlike.py").write_text(op_src)
    (qdir / "mod.py").write_text(q_src)
    for rel, src in (extra or {}).items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(src)
    files = {f"{PKG}/operators/simlike.py", f"{PKG}/queries/mod.py"}
    files |= set((extra or {}))

    def rf(rel):
        return (tmp_path / rel).read_text()

    return files, rf


SECT_OP = '''
def used_fn(df):
    return _inner(df)

def _inner(df):
    return df

def other_fn(df):
    return df
'''

SECT_Q = '''
from m5_competition_kaggle_spark.operators.simlike import used_fn, other_fn

def qa(spark, sf):
    return used_fn(None)

def qb(spark, sf):
    return other_fn(None)

QUERIES = {"qa": qa, "qb": qb}
ORACLES = {}
ORACLES["qa"] = "SELECT 1 AS qb"
ORACLES["qb"] = "SELECT 2"
'''


def test_sect_attrib_per_query(monkeypatch, tmp_path):
    import scripts.certification_ledger as L
    monkeypatch.setattr(
        L, "SECTIONED_MODULES", frozenset({f"{PKG}/operators/simlike.py"})
    )
    files, rf = _mini_repo(tmp_path, SECT_OP, SECT_Q)
    qpath = f"{PKG}/queries/mod.py"
    oppath = f"{PKG}/operators/simlike.py"
    at_a = _sect_attrib("qa", qpath, files, rf)
    at_b = _sect_attrib("qb", qpath, files, rf)
    # qa reaches used_fn and (transitively) _inner, NOT other_fn —
    # and the ORACLES["qa"] key naming qb must not drag qb's deps in.
    assert at_a[oppath] == {"used_fn", "_inner"}
    assert at_b[oppath] == {"other_fn"}


def test_sect_attrib_alias_and_star_fallbacks(monkeypatch, tmp_path):
    import scripts.certification_ledger as L
    monkeypatch.setattr(
        L, "SECTIONED_MODULES", frozenset({f"{PKG}/operators/simlike.py"})
    )
    q_alias = (
        "from m5_competition_kaggle_spark.operators.simlike "
        "import used_fn as UF\n"
        "def qa(spark, sf):\n    return UF(None)\n"
        "QUERIES = {'qa': qa}\nORACLES = {}\n"
    )
    files, rf = _mini_repo(tmp_path, SECT_OP, q_alias)
    at = _sect_attrib("qa", f"{PKG}/queries/mod.py", files, rf)
    # the alias still attributes the real section name
    assert "used_fn" in at[f"{PKG}/operators/simlike.py"]
    # star import anywhere in the closure -> conservative None
    q_star = (
        "from m5_competition_kaggle_spark.operators.simlike import *\n"
        "def qa(spark, sf):\n    return used_fn(None)\n"
    )
    files2, rf2 = _mini_repo(tmp_path / "s", SECT_OP, q_star)
    assert _sect_attrib("qa", f"{PKG}/queries/mod.py", files2, rf2) is None
    # unlocatable query def -> conservative None
    assert _sect_attrib("nope", f"{PKG}/queries/mod.py", files, rf) is None


def test_real_repo_sectioned_modules_parse_and_localize():
    """Live invariants the r7 edits rely on: every allowlisted module
    sections cleanly, and the audit-only exact_near_dup_pairs is
    attributed by NO registered query (so guarding it stales nobody)."""
    import json
    import os
    from scripts.certification_ledger import (
        _normalize_py,
        _top_def_names,
    )

    # mirror the real pipeline: normalized sources + the sectioned-defs
    # pre-pass (llm_curation's registry carve-out needs both to prove
    # curation.py's BLOOM constants are shared-section members)
    norm = {
        rel: _normalize_py(open(rel, "rb").read()).decode()
        for rel in SECTIONED_MODULES
    }
    sectioned_defs = {rel: _top_def_names(s) for rel, s in norm.items()}
    for rel, s in norm.items():
        assert _def_sections(s, sectioned_defs) is not None, rel
    bank = json.load(open("CERTIFICATION_hashes.json"))
    for q, info in bank.items():
        secs = info["sections"]
        assert secs != "ALL", f"{q} fell back to whole-file attribution"
        assert "exact_near_dup_pairs" not in secs.get("similarity.py", []), q
    # spot positives: consumers DO attribute what they call
    assert "brute_force_topk" in bank["x9_sim_topk"]["sections"]["similarity.py"]
    assert "winsorized_sum" in bank["x83_winsorized_mean"]["sections"]["stats_exact.py"]


def test_registry_carveout_admits_constants_rejects_defs():
    """r11: a QUERIES/ORACLES literal may reference pkg imports only
    when every name is provably covered elsewhere — a constant from a
    sectioned module (shared section, hashed by all consumers) is
    admissible; a DEF from a sectioned module, an unresolvable
    relative import, or missing knowledge all force whole-file
    fallback (under-staling would forge certification)."""
    from scripts.certification_ledger import _def_sections

    cur = "m5_competition_kaggle_spark/operators/curation.py"
    src = (
        "from m5_competition_kaggle_spark.operators.curation import"
        " BLOOM_K\n"
        'ORACLES = {"q": f"{BLOOM_K}"}\n'
        "def f():\n    return 1\n"
    )
    assert _def_sections(src, {cur: {"some_def"}}) is not None
    assert _def_sections(src, {cur: {"BLOOM_K"}}) is None  # a def
    assert _def_sections(src) is None  # no knowledge
    # non-registry module-level exec referencing a pkg import still
    # falls back, knowledge or not
    src2 = (
        "from m5_competition_kaggle_spark.operators.curation import"
        " BLOOM_K\n"
        "X = BLOOM_K\n"
        "def f():\n    return 1\n"
    )
    assert _def_sections(src2, {cur: {"some_def"}}) is None


def test_adding_a_def_leaves_shared_section_stable():
    """r11 regression: gap-based shared hashing made the SHARED
    digest depend on blank lines between def spans, so extracting a
    helper into a sectioned module staled every consumer (107 rows).
    Adding a def must leave the shared digest unchanged; editing a
    real shared statement must still change it; moving a statement
    into a block (indentation semantics) must still change it."""
    from scripts.certification_ledger import (
        SHARED_KEY,
        _def_sections,
    )

    base = (
        "import os\n"
        "X = 1\n"
        "def f():\n    return 1\n"
    )
    with_def = (
        "import os\n"
        "X = 1\n"
        "def g():\n    return 2\n"
        "def f():\n    return 1\n"
    )
    edited = base.replace("X = 1", "X = 2")
    s0 = _def_sections(base, {})
    s1 = _def_sections(with_def, {})
    s2 = _def_sections(edited, {})
    assert s0[SHARED_KEY] == s1[SHARED_KEY]
    assert s0["f"] == s1["f"]
    assert s0[SHARED_KEY] != s2[SHARED_KEY]
    blocked = (
        "import os\n"
        "if os.sep:\n    X = 1\n"
        "def f():\n    return 1\n"
    )
    s3 = _def_sections(blocked, {})
    assert s3[SHARED_KEY] != s0[SHARED_KEY]


def test_sectioned_defining_module_attributes_own_def():
    """r11: llm_curation is sectioned — each of its queries must hash
    its OWN def section (plus whatever siblings it references), and a
    consumer in another module that only uses llm_curation CONSTANTS
    attributes none of its defs."""
    import json

    bank = json.load(open("CERTIFICATION_hashes.json"))
    x29 = bank["x29_corpus_to_shards"]["sections"]["llm_curation.py"]
    assert "x29_corpus_to_shards" in x29
    x30 = bank["x30_vocab_topk"]["sections"]["llm_curation.py"]
    assert "x30_vocab_topk" in x30
    # x66 (extensions_r6) imports only HLL constants from llm_curation
    assert bank["x66_source_jaccard"]["sections"].get(
        "llm_curation.py"
    ) == []


def test_round_commit_falls_back_to_head_for_untracked(tmp_path):
    """VERDICT r6 item 9: a correctness file the driver has written but
    not yet committed must resolve to HEAD (the tree the driver ran),
    not render freshly-certified rows unverifiable."""
    import subprocess

    import scripts.certification_ledger as L

    def git(*a):
        subprocess.run(["git", *a], cwd=tmp_path, check=True,
                       capture_output=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (tmp_path / "x.py").write_text("x = 1\n")
    git("add", "x.py")
    git("commit", "-qm", "c1")
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=tmp_path,
        capture_output=True, text=True,
    ).stdout.strip()
    (tmp_path / "CORRECTNESS_r99.json").write_text("{}")
    old = L.REPO
    try:
        L.REPO = str(tmp_path)
        # untracked-but-present -> HEAD
        assert L._round_commit(str(tmp_path / "CORRECTNESS_r99.json")) \
            == head
        # absent entirely -> None
        assert L._round_commit(str(tmp_path / "CORRECTNESS_r98.json")) \
            is None
        # committed -> parent of the committing commit
        git("add", "CORRECTNESS_r99.json")
        git("commit", "-qm", "c2: driver result")
        assert L._round_commit(str(tmp_path / "CORRECTNESS_r99.json")) \
            == head
    finally:
        L.REPO = old
