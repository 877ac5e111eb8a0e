"""The carried-language registry contract (pipeline/query.py
_CHAIN_LANGS): every entry must satisfy the conventions the $text /
$stem / bm25 dispatches rely on — an ops/<key>.py module exporting
<key>_stem_tokens and <key>_py, a resolvable Snowball stop list, and
well-formed aliases. A new language added without one of these must
fail HERE, not at query-compile time. Also pins the plan-snapshot
normalizer (tools/plan_snapshot.py) that proves refactors are pure
code motion."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.pipeline.query import _CHAIN_LANGS, _chain_fns


def test_registry_entries_satisfy_the_module_convention(spark):
    from route81_spark.ops.stopwords import stop_list

    assert list(_CHAIN_LANGS) == [
        "french", "german", "swedish", "norwegian", "danish",
    ], (
        "registry insertion order IS the recorded languageOverride "
        "arm order — extend at the END, never reorder"
    )
    probe = {"french": "continuations", "german": "kindern",
             "swedish": "nyheterna", "norwegian": "mulighetene",
             "danish": "bestemmelserne"}
    for key, aliases in _CHAIN_LANGS.items():
        assert isinstance(aliases, tuple) and len(aliases) >= 2
        assert aliases[0] == key, "first alias is the canonical name"
        assert all(a == a.lower() for a in aliases)
        stem_tokens, stem_py = _chain_fns(key)
        assert callable(stem_tokens) and callable(stem_py)
        # the Python twin stems lowercase tokens (and is empty-safe)
        assert isinstance(stem_py(probe[key]), str)
        assert stem_py("") == ""
        # the Column form builds and AGREES with the twin on a real
        # inflected token of its language
        col = stem_tokens(F.array(F.lit(probe[key])))
        assert isinstance(col, Column)
        df = spark.range(1).select(col.alias("s"))
        assert df.collect()[0]["s"] == [stem_py(probe[key])]
        # the language's Snowball stop list resolves
        assert len(stop_list(key)) > 50


def test_plan_snapshot_normalizer_pins():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_snapshot", "/root/repo/tools/plan_snapshot.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    raw = (
        "Project [a#123 AS b#4567]\n"
        "Exchange hashpartitioning(a#12, 32), plan_id=88\n"
        "Statistics(sizeInBytes=1.0 KiB)\n"
        "array([ts,[B@287cf1ee])\n"
        "aggregate(e#9, 0.0, lambdafunction(lambda x_406#77, "
        "lambda y_407#78, false))"
    )
    want = (
        "Project [a#x AS b#x]\n"
        "Exchange hashpartitioning(a#x, 32), plan_id=x\n"
        "Statistics(x)\n"
        "array([ts,[B@x])\n"
        "aggregate(e#x, 0.0, lambdafunction(lambda x_x#x, "
        "lambda y_x#x, false))"
    )
    assert mod.normalize(raw) == want
