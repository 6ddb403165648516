"""Smoke tests for the spark-submit entry points (jobs/): each main() is
driven in-process over a tiny corpus — build, delta merge, compaction,
query — so the operational wrappers can't drift from the library API."""

import json
import sys


def _run(module, argv, capsys):
    old = sys.argv
    sys.argv = [module.__file__] + argv
    try:
        module.main()
    finally:
        sys.argv = old
    return [json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")]


def test_build_merge_compact_query_jobs(spark, tmp_path_factory, capsys):
    from mithril_spark.fixtures import generate_pages, pages_to_df

    import jobs.build_index_job as bjob
    import jobs.merge_job as mjob
    import jobs.query_job as qjob

    tmp = tmp_path_factory.mktemp("jobs")
    idx = str(tmp / "idx")
    delta = str(tmp / "delta")
    pages = generate_pages(60, seed=42)
    pages_to_df(spark, pages[:45]).write.parquet(str(tmp / "pages"))
    pages_to_df(spark, pages[45:]).write.parquet(delta)

    res = _run(bjob, ["--pages", str(tmp / "pages"), "--out", idx,
                      "--shards", "2", "--cores", "8"], capsys)[-1]
    assert res["meta"]["num_shards"] == 2
    n_base = res["meta"]["total_docs"]

    res = _run(mjob, ["--index", idx, "--pages", delta, "--cores", "8"],
               capsys)[-1]
    assert res["mode"] == "append" and res["replaced_docs"] == 0
    assert "extract_delta" in res["phases"]
    n_after = res["total_docs"]
    assert n_after > n_base

    out = _run(qjob, ["--index", idx, "--cores", "8", "search engine"],
               capsys)
    assert out[0]["query"] == "search engine" and out[0]["results"]

    res = _run(mjob, ["--index", idx, "--compact", "--cores", "8"],
               capsys)[-1]
    assert res["mode"] == "compact" and res["total_docs"] == n_after

    out = _run(qjob, ["--index", idx, "--cores", "8", "--snippets",
                      "granite OR marble"], capsys)
    assert out[0]["query"] == "granite OR marble"
    assert all("snippet" in r for r in out[0]["results"])


def test_spark_submit_py_files_ships_the_package(tmp_path_factory):
    """The north-rule deployment posture, executed for real: the package
    is zipped, the job scripts are COPIED outside the repo (so nothing
    resolves via the repo checkout), and `spark-submit --py-files
    mithril_spark.zip` must build an index and answer a query from the
    zip alone — proving the library is self-contained when shipped to a
    cluster (no repo-root sys.path reliance, no data files outside the
    package; fixtures generate the corpus in-process)."""
    import os
    import shutil
    import subprocess
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = str(tmp_path_factory.mktemp("pyfiles"))
    pkg_zip = os.path.join(tmp, "mithril_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for r, _dirs, files in os.walk(os.path.join(root, "mithril_spark")):
            if "__pycache__" in r:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(r, f)
                    zf.write(p, os.path.relpath(p, root))
    for job in ("build_index_job.py", "query_job.py"):
        shutil.copy(os.path.join(root, "jobs", job), tmp)

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # nothing may leak in from the test env
    env["SPARK_DRIVER_MEM"] = "4g"
    idx = os.path.join(tmp, "idx")

    def submit(script, *args):
        r = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--py-files", pkg_zip, os.path.join(tmp, script), *args],
            cwd=tmp, env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(line) for line in r.stdout.splitlines()
                if line.startswith("{")]

    res = submit("build_index_job.py", "--synthetic", "60", "--out", idx,
                 "--shards", "2", "--cores", "4")[-1]
    assert res["meta"]["num_shards"] == 2 and res["meta"]["total_docs"] > 0
    assert os.path.exists(os.path.join(idx, "index_meta.json"))

    out = submit("query_job.py", "--index", idx, "--cores", "4",
                 "search engine")
    assert out[0]["query"] == "search engine" and out[0]["results"]
