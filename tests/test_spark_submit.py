"""North-rule launch mode: the pipeline runs via spark-submit --py-files.

Builds dist/plwordnet_spark.zip with tools/make_pyfiles.py, then runs a
REAL ``spark-submit --py-files`` subprocess whose job script imports the
package ONLY from the zip (the repo directory is scrubbed from
sys.path), drives pages → build_graph → pagerank end-to-end, and prints
a checkable result line. This is the closest a single box gets to the
north rule's "launched with spark-submit --py-files on a multi-executor
cluster": same artifact, same entry path, executors resolve the package
from the shipped zip.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import sys

# the package must come from the --py-files zip, not the repo checkout
sys.path = [p for p in sys.path if not p.rstrip("/").endswith("repo")]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("pyfiles-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)

import plwordnet_spark
assert "plwordnet_spark.zip" in plwordnet_spark.__file__, plwordnet_spark.__file__

from plwordnet_spark.corpus import generate_pages
from plwordnet_spark.graph.build import build_graph
from plwordnet_spark.graph.pagerank import pagerank

pages = generate_pages(spark, 120, seed=42)
g = build_graph(pages)
res = pagerank(spark, g.edges.select("src", "dst"), tol=1e-6, max_iterations=30, weighted=False)
n = res.state.count()
total = res.state.groupBy().sum("rank").collect()[0][0]
print(f"PYFILES_OK nodes={n} converged={res.converged} total={total:.6f}")
spark.stop()
"""


def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "dist"))
    job = tmp_path / "job.py"
    job.write_text(_JOB)

    # resolve spark-submit from the pyspark installation (portable)
    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--py-files", zip_path, str(job)],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=str(tmp_path),  # NOT the repo — the zip must provide the package
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    marker = [l for l in proc.stdout.splitlines() if l.startswith("PYFILES_OK")]
    assert marker, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = marker[0]
    assert "converged=True" in line
    assert "total=1.000000" in line
