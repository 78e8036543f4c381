"""North-rule deployment shape: the job runs via ``spark-submit
--py-files dist/pdf_ocr_spark.zip`` in a SEPARATE process (no repo on
sys.path — the zip is the only source of the package), resumes on rerun,
and writes the bucketed layout."""

import json
import os
import shutil
import subprocess
import sys

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_spark_submit_py_files_roundtrip(tmp_path, corpus_rows):
    from pdf_ocr_spark.fixtures.genpages import write_corpus

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "pages")
    out = str(tmp_path / "docs")
    side = str(tmp_path / "lineage")
    write_corpus(src, 60, n_files=4)

    # package the engine; run the job from a NEUTRAL cwd so only the zip
    # provides the package
    zip_path = str(tmp_path / "pdf_ocr_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "package.py"), zip_path],
        check=True, capture_output=True,
    )

    def submit():
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(repo, "jobs", "extract_submit.py"),
                "--input", src,
                "--output", out,
                "--sidecar", side,
                "--partitions", "4",
                "--buckets", "4",
            ],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=420,
        )

    r = submit()
    assert r.returncode == 0, r.stderr[-3000:]
    stats = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert stats["docs_appended"] == 60
    assert any(d.startswith("url_bucket=") for d in os.listdir(out))
    assert os.path.isdir(side)

    # rerun: resume must process nothing new and keep 60 distinct urls
    r2 = submit()
    assert r2.returncode == 0, r2.stderr[-3000:]
    stats2 = json.loads(
        [ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert stats2["docs_appended"] == 0

    import duckdb

    n_urls = duckdb.sql(
        f"SELECT count(DISTINCT url) FROM read_parquet('{out}/*/*.parquet')"
    ).fetchone()[0]
    assert n_urls == 60
