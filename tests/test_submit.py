"""tools/submit.sh — the north rule's deployment mode ("run via
spark-submit --py-files"): a real spark-submit run from a FOREIGN
working directory, so the library can only come from the zip the
script builds and ships. Driver-side proof: the imported package's
__file__ resolves inside the zip. Executor-side proof: the job runs
``pq_encode`` (an Arrow ``mapInPandas`` kernel defined in the
package), which workers can only unpickle by importing the module
from the shipped --py-files zip."""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_DRIVER = """\
import webscrape_neko_jirushi_spark as pkg
assert ".zip" in pkg.__file__, f"package not imported from the zip: {pkg.__file__}"

from pyspark.sql import SparkSession

from webscrape_neko_jirushi_spark.operators import similarity

spark = (
    SparkSession.builder.appName("submit-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(8)]) for i in range(50)]
e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
books = similarity.pq_train(e, dim=8, m=2, ksub=4, seed=7, n_vecs=50)
n = similarity.pq_encode(e, books).count()
print(f"SUBMIT_OK {n}")
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_submit_sh_ships_package_via_py_files(tmp_path):
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        ["bash", str(REPO / "tools" / "submit.sh"), str(driver)],
        cwd=tmp_path,  # the repo package is NOT importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "SUBMIT_OK 50" in out.stdout, out.stdout[-1500:]
