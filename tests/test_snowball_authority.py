"""Compiled-authority guard for ALL carried Snowball programs: stem a
deterministic fuzz corpus per language with PostgreSQL's vendored
Snowball dictionaries (`dict_snowball.so`, the reference C stemmers
compiled from the published .sbl sources) and require the Python spec
twins to agree word-for-word. This is the strongest detector for the
r13 ADVICE bug CLASS — a spec divergence shared by a twin AND its
Column program is invisible to column-vs-twin grids and survivable by
a from-scratch simulation re-derived from the same misreading, but it
cannot survive a compiled third implementation (r14: this guard found
and adjudicated the French prelude's trailing-context-vowel
consumption, the exact sibling of the r13 German fix).

Revision pins: the in-environment PostgreSQL 15 vendors Snowball 2.x.
Empirically (and consistent with the published change history) the
english/danish/norwegian/swedish/german programs are byte-identical
to the classic revision this repo pins, so those compare exactly.
French diverges ONLY on the 2019+ `ë`->He / `ï`->Hi prelude handling
(the documented classic pin in ops/french.py) — the assertion
therefore requires every french mismatch to contain ë or ï, and that
at least SOME ë/ï words do mismatch (proving the filter is not
vacuous and the authority really is 2.x).

The scratch server lives in a pytest tmpdir and is torn down after
the module; everything skips cleanly when PostgreSQL (or the
postgres user, when running as root) is unavailable.
"""

from __future__ import annotations

import itertools
import os
import pwd
import random
import shutil
import subprocess

import pytest

_PGBIN = "/usr/lib/postgresql/15/bin"

# (language, twin, alphabet) — alphabets include each language's
# special letters plus the letters its conditions read
_LANGS = [
    ("english", "route81_spark.ops.porter", "porter2_py",
     "aeiouybcdfghlmnprstvwxz"),
    ("french", "route81_spark.ops.french", "french_py",
     "aeiouyâàëéêèïîôûùbcdfghjlmnpqrstvxz"),
    ("german", "route81_spark.ops.german", "german_py",
     "aeiouyäöüßbcdfghklmnprstz"),
    ("swedish", "route81_spark.ops.swedish", "swedish_py",
     "aeiouyäåöbcdfghjklmnprstvz"),
    ("norwegian", "route81_spark.ops.norwegian", "norwegian_py",
     "aeiouyæåøbcdfghjklmnprstvz"),
    ("danish", "route81_spark.ops.danish", "danish_py",
     "aeiouyæåøbcdfghjklmnprstvz"),
]


def _corpus(alpha: str, seed: int) -> list[str]:
    rng = random.Random(seed)
    words = {
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(12000)
    }
    # exhaustive small block over a compact slice of the alphabet
    small = alpha[:6] + alpha[-3:]
    for n in range(1, 4):
        for t in itertools.product(small, repeat=n):
            words.add("".join(t))
    return sorted(words)


class _PG:
    def __init__(self, root: str):
        self.root = root
        self.as_postgres = os.geteuid() == 0

    def _run(self, cmd: str) -> subprocess.CompletedProcess:
        if self.as_postgres:
            cmd = ["su", "postgres", "-s", "/bin/bash", "-c", cmd]
        else:
            cmd = ["/bin/bash", "-c", cmd]
        return subprocess.run(
            cmd, cwd="/tmp", capture_output=True, text=True, timeout=120
        )

    def start(self) -> None:
        data = os.path.join(self.root, "data")
        if self.as_postgres:
            pwd.getpwnam("postgres")  # KeyError -> caller skips
            os.chmod(self.root, 0o777)
        r = self._run(
            f"{_PGBIN}/initdb -D {data} -E UTF8 --locale=C.UTF-8"
        )
        if r.returncode != 0:
            raise RuntimeError(f"initdb: {r.stderr[-400:]}")
        r = self._run(
            f"{_PGBIN}/pg_ctl -D {data} -w "
            f"-o '-k {self.root} -p 55433 -c listen_addresses=' "
            f"-l {self.root}/pg.log start"
        )
        if r.returncode != 0:
            raise RuntimeError(f"pg_ctl: {r.stderr[-400:]}")

    def stop(self) -> None:
        self._run(f"{_PGBIN}/pg_ctl -D {self.root}/data -m immediate stop")

    def psql(self, *cmds: str) -> None:
        args = " ".join(f'-c "{c}"' for c in cmds)
        r = self._run(f"psql -h {self.root} -p 55433 postgres -q {args}")
        if r.returncode != 0:
            raise RuntimeError(f"psql: {r.stderr[-400:]}")

    def stem_all(self, lang: str, words: list[str]) -> dict[str, str]:
        win = os.path.join(self.root, f"in_{lang}.txt")
        wout = os.path.join(self.root, f"out_{lang}.tsv")
        with open(win, "w") as fh:
            fh.write("\n".join(words))
        os.chmod(win, 0o666)
        self.psql(
            f"CREATE TEXT SEARCH DICTIONARY {lang}_ns "
            f"(TEMPLATE = snowball, Language = {lang});",
            f"CREATE TABLE w_{lang}(t text);",
            f"\\copy w_{lang} from '{win}'",
            # nostop dictionary: COALESCE covers zero-lexeme outputs
            f"\\copy (SELECT t, COALESCE((ts_lexize('{lang}_ns', t))[1],"
            f" t) FROM w_{lang}) to '{wout}'",
        )
        out = {}
        with open(wout) as fh:
            for line in fh:
                w, s = line.rstrip("\n").split("\t")
                out[w] = s
        return out


@pytest.fixture(scope="module")
def pg():
    if not os.path.exists(f"{_PGBIN}/initdb") or not shutil.which("psql"):
        pytest.skip("PostgreSQL 15 not installed")
    # NOT the pytest tmpdir: its ancestors are 0700 and the postgres
    # user (initdb refuses root) could not traverse into it
    import tempfile

    root = tempfile.mkdtemp(prefix="pgsnow_", dir="/tmp")
    os.chmod(root, 0o777)
    server = _PG(root)
    try:
        server.start()
    except (RuntimeError, KeyError, OSError) as e:
        shutil.rmtree(root, ignore_errors=True)
        pytest.skip(f"scratch postgres unavailable: {e}")
    yield server
    server.stop()
    shutil.rmtree(root, ignore_errors=True)


_PG_STOP_DIR = "/usr/share/postgresql/15/tsearch_data"


@pytest.mark.parametrize(
    "lang", [x[0] for x in _LANGS], ids=[x[0] for x in _LANGS]
)
def test_stop_lists_match_snowball_corpus_files(lang):
    """The carried stop lists equal PostgreSQL's shipped Snowball
    stop files word-for-word (no server needed — plain files). ONE
    pinned exception: the vendored French list carries 'les' (as the
    MLlib copy of the snowball corpus does) while PG's french.stop
    does not — a one-word provenance delta between two snapshots of
    the same public corpus; engine and oracles share OUR list as
    data, so it cannot cause a wrong answer."""
    path = os.path.join(_PG_STOP_DIR, f"{lang}.stop")
    if not os.path.exists(path):
        pytest.skip("postgres tsearch stop files not installed")
    from route81_spark.ops.stopwords import stop_list

    with open(path) as fh:
        pg_words = {w.strip() for w in fh if w.strip()}
    ours = set(stop_list(lang))
    extra, missing = ours - pg_words, pg_words - ours
    if lang == "french":
        assert extra == {"les"} and not missing, (extra, missing)
    else:
        assert not extra and not missing, (extra, missing)


@pytest.mark.parametrize(
    "lang,mod,fn,alpha", _LANGS, ids=[x[0] for x in _LANGS]
)
def test_twin_matches_compiled_snowball(pg, lang, mod, fn, alpha):
    import importlib

    twin = getattr(importlib.import_module(mod), fn)
    words = _corpus(alpha, seed=41)
    want = pg.stem_all(lang, words)
    bad = [
        (w, want[w], twin(w)) for w in words if twin(w) != want[w]
    ]
    if lang == "french":
        # the documented classic pin: PG's 2.x French adds the
        # ë->He / ï->Hi preludes; everything else must agree
        stray = [b for b in bad if "ë" not in b[0] and "ï" not in b[0]]
        assert not stray, (
            f"{len(stray)} french mismatches OUTSIDE the pinned ë/ï "
            f"revision delta, first: {stray[:5]}"
        )
        assert bad, (
            "no ë/ï mismatches at all — the authority no longer "
            "vendors the 2.x revision; tighten this test to exact"
        )
    else:
        assert not bad, (
            f"{len(bad)} {lang} twin-vs-compiled mismatches, "
            f"first: {bad[:5]}"
        )
