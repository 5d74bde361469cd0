"""Launch-path test: the pipeline must run via spark-submit --py-files with
the package shipped as a zip (north_rule), and resume on re-submit."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _zip_package(out: str) -> None:
    pkg = os.path.join(REPO, "wikipedia_wikidata_spark")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))


def _run(submit, zip_path, out_dir, master="local[4]"):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    r = subprocess.run(
        [
            submit, "--master", master, "--py-files", zip_path,
            os.path.join(REPO, "submit_pipeline.py"),
            "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return [json.loads(x) for x in r.stdout.splitlines() if x.startswith("{")]


def test_spark_submit_pipeline_and_resume(tmp_path_factory):
    zip_path = str(tmp_path_factory.mktemp("zip") / "wws.zip")
    out_dir = str(tmp_path_factory.mktemp("ckpt"))
    _zip_package(zip_path)
    submit = _spark_submit()

    stages = _run(submit, zip_path, out_dir)
    by_name = {s["stage"]: s for s in stages}
    assert "importance" in by_name and by_name["importance"]["rows"] > 0
    assert not any(s["skipped"] for s in stages)
    assert all(s["n_partitions"] >= 1 for s in stages)

    # resume: identical re-submit skips every committed stage by fingerprint
    stages2 = _run(submit, zip_path, out_dir)
    assert all(s["skipped"] for s in stages2), stages2


def test_spark_submit_two_cluster_sizes_same_rows(tmp_path_factory):
    """north_rule launch shape: the SAME spark-submit --py-files command at
    two parallelism levels (only the launcher flag differs) produces
    identical per-stage row counts — the job is width-invariant through the
    real launcher, which is what makes the N vs 4N throughput comparison a
    comparison of the same computation."""
    zip_path = str(tmp_path_factory.mktemp("zip2") / "wws.zip")
    _zip_package(zip_path)
    submit = _spark_submit()
    rows = {}
    for master in ("local[2]", "local[8]"):
        out_dir = str(tmp_path_factory.mktemp(f"ckpt_{master[6:-1]}"))
        stages = _run(submit, zip_path, out_dir, master=master)
        rows[master] = {s["stage"]: s["rows"] for s in stages}
        assert not any(s["skipped"] for s in stages)
    assert rows["local[2]"] == rows["local[8]"], rows
