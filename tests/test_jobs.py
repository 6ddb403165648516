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
