"""Cluster-submission packaging: the engine must run via
``spark-submit --py-files <zip>`` (north rule), i.e. with the package
imported from the zip artifact rather than a source checkout.

The test stages ``app.py`` alone in a scratch directory and submits from
there with a scrubbed PYTHONPATH, so BOTH driver and executors can only
resolve ``french_admin_etl_spark`` through ``--py-files`` — exactly the
situation on a real cluster where the repo checkout doesn't exist on the
workers. The ``demo`` subcommand then verifies the applied final state
against the pandas oracle (per-row content sha256) and exits non-zero on
any mismatch.
"""

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "fae_spark.zip"))
    stage = tmp_path / "stage"
    stage.mkdir()
    shutil.copy(os.path.join(REPO, "app.py"), stage / "app.py")

    env = dict(os.environ)
    # a worker has no source checkout: drop any path that could shadow the zip
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(stage / "app.py"),
            "demo",
            "--workdir", str(tmp_path / "work"),
            "--n-events", "3000",
            "--num-buckets", "4",
            "--cores", "4",
        ],
        cwd=str(stage),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout}\n{proc.stderr}"
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result["sha256_state_match"] is True
    assert result["events_applied"] >= 3000  # duplicates inflate the row count
    assert result["final_rows"] == result["oracle_rows"] > 0
