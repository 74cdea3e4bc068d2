"""CLI contract smoke test (VERDICT r4 #9): the jobs/mias.py verb
surface — the MIaS.java analog — run end-to-end as real subprocesses
on a tiny corpus. Each verb is its own process (fresh JVM), so this
module is the slowest per-assertion suite; it pins the ONLY surface
not otherwise under pytest: properties parsing, verb dispatch, JSON
output shapes and the pager's stdin protocol."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, stdin=None, timeout=240):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "mias.py"), *args],
        capture_output=True, text=True, input=stdin, timeout=timeout,
        cwd=REPO, env={**os.environ, "SPARK_GRAFT_CPUS": "4"})


def _last_json(out: str):
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith(("{", "[")):
            return json.loads(line)
    raise AssertionError(f"no JSON line in output:\n{out}")


@pytest.fixture(scope="module")
def cli_env(spark, tmp_path_factory):
    from mias_spec.corpus import make_corpus
    root = tmp_path_factory.mktemp("cli")
    corpus = str(root / "corpus.parquet")
    spark.createDataFrame(make_corpus(60)).coalesce(1) \
        .write.mode("overwrite").parquet(corpus)
    conf = str(root / "mias.properties")
    ix = str(root / "ix")
    with open(conf, "w") as f:
        f.write(f"INDEXDIR={ix}\nMAXRESULTS=5\nTHREADS=4\nBUCKETS=2\n")
    return conf, corpus, ix


def test_cli_verbs_end_to_end(cli_env):
    conf, corpus, ix = cli_env

    # -add: fresh build, prints index stats
    r = _run(["-conf", conf, "-add", corpus])
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _last_json(r.stdout)
    assert stats["n_docs"] == 60 and stats["n_terms"] > 0

    # -stats on the existing index
    r = _run(["-conf", conf, "-stats"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert _last_json(r.stdout)["n_docs"] == 60

    # -search: JSON result with snippets; MUST_NOT flag-stripping
    r = _run(["-conf", conf, "-search", "energy -momentum"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = _last_json(r.stdout)
    assert res["total_hits"] > 0 and len(res["hits"]) > 0
    assert "-content:momentum" in res["processed_query"]
    assert "snippet" in res["hits"][0]

    # -search -page: pager prints hits and honors 'n' on stdin
    r = _run(["-conf", conf, "-search", "-page", "energy"], stdin="n\n")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Total hits:" in r.stdout and "Path:" in r.stdout

    # -mtermreport: ranked formula report as a JSON array
    r = _run(["-conf", conf, "-mtermreport", corpus, "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = _last_json(r.stdout)
    assert isinstance(rep, list) and 0 < len(rep) <= 5

    # -delete by path prefix tombstones matching docs
    r = _run(["-conf", conf, "-delete", "src/dir1/"])
    assert r.returncode == 0, r.stderr[-2000:]
    removed = _last_json(r.stdout)["removed"]
    assert removed > 0
    r = _run(["-conf", conf, "-stats"])
    assert _last_json(r.stdout)["n_docs"] == 60 - removed

    # -compact: bounded merge-policy steps until clean (S8)
    r = _run(["-conf", conf, "-compact"])
    assert r.returncode == 0, r.stderr[-2000:]

    # -optimize purges any remainder back to a clean base and the
    # stats (live doc count) survive the compaction
    r = _run(["-conf", conf, "-optimize"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run(["-conf", conf, "-stats"])
    assert _last_json(r.stdout)["n_docs"] == 60 - removed

    # -overwrite drops the index and rebuilds it from scratch
    r = _run(["-conf", conf, "-overwrite", corpus])
    assert r.returncode == 0, r.stderr[-2000:]
    assert _last_json(r.stdout)["n_docs"] == 60

    # -indocprocess writes the annotated-docs sink (S10)
    out_p = os.path.join(os.path.dirname(corpus), "annotated.parquet")
    r = _run(["-conf", conf, "-indocprocess", corpus, out_p])
    assert r.returncode == 0, r.stderr[-2000:]
    assert _last_json(r.stdout)["annotated_to"] == out_p
    assert os.path.isdir(out_p)

    # -deleteindex removes the directory (no Spark session)
    r = _run(["-conf", conf, "-deleteindex"])
    assert r.returncode == 0 and not os.path.exists(ix)


def test_cli_usage_on_bad_args(cli_env):
    conf, corpus, ix = cli_env
    r = _run([])
    assert r.returncode == 2 and "-search" in r.stdout


def test_spark_submit_pyfiles_packaging(tmp_path):
    """The north-rule launch shape: `spark-submit --py-files mias.zip`
    with the entry script OUTSIDE the repo, so the zip alone must ship
    mias_spark + mias_spec to the driver and executors."""
    import shutil
    import zipfile

    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    zpath = str(tmp_path / "mias.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("mias_spark", "mias_spec"):
            for root, _dirs, files in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        p = os.path.join(root, f)
                        z.write(p, os.path.relpath(p, REPO))
    entry = str(tmp_path / "bi_entry.py")
    shutil.copy(os.path.join(REPO, "jobs", "build_index.py"), entry)
    out = str(tmp_path / "ix_submit")
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zpath,
         entry, "--rows", "60", "--out", out],
        capture_output=True, text=True, timeout=400, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    stats = _last_json(r.stdout)
    assert stats["n_docs"] == 60 and stats["n_postings"] > 0
    assert os.path.exists(os.path.join(out, "manifest.json"))
