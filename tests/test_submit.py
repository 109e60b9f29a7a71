"""north_rule: "run via spark-submit --py-files" — drive the REAL
spark-submit binary end-to-end: package citykg as a zip, submit the
launcher from a directory where the package is NOT otherwise importable,
and verify the written triple store against the in-session plan.

Reference analog: CitiesKG runs its importer as a packaged CLI
(impexp-core Importer via ImpExp.jar); this is the Spark-cluster
equivalent of that packaged-deploy path.
"""

import os
import shutil
import subprocess

import duckdb

from citykg.extract import extract_triples
from citykg.fixtures import synth_docs
from conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    # stage input docs + expected counts from the in-session plan
    docs_dir = str(tmp_path / "docs")
    synth_docs(spark, SF_SMOKE).write.parquet(docs_dir)
    expected = extract_triples(spark, synth_docs(spark, SF_SMOKE)).count()

    # ship the package ONLY via --py-files: launcher is copied out of the
    # repo and cwd/PYTHONPATH contain no citykg, so an import that
    # succeeds proves the zip distribution works
    zip_path = shutil.make_archive(str(tmp_path / "citykg"), "zip", REPO, "citykg")
    launcher = str(tmp_path / "submit_pipeline.py")
    shutil.copy(os.path.join(REPO, "submit_pipeline.py"), launcher)
    store = str(tmp_path / "store")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            launcher,
            "--input", docs_dir,
            "--output", store,
            "--buckets", "8",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # verify the store independently (DuckDB, not Spark): row count,
    # bucket layout, and manifest completeness
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{store}/triples/graph=*/bucket=*/*.parquet')"
    ).fetchone()[0]
    assert n == expected
    graphs = {
        os.path.basename(p)
        for p in os.listdir(os.path.join(store, "triples"))
        if p.startswith("graph=")
    }
    assert "graph=building" in graphs and "graph=surfacegeometry" in graphs
    done = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT partition_range FROM read_parquet('{store}/_manifest/*.parquet') "
            f"WHERE stage = 'materialize' AND status = 'done'"
        ).fetchall()
    }
    assert len(done) == 8
