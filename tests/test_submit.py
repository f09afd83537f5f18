"""Deployment path: the SAME artifact a cluster would receive
(--py-files zip) runs the pipeline via spark-submit. The subprocess gets a
scrubbed sys.path (cwd moved to a neutral dir) so the import genuinely
resolves from the zip, not the repo checkout."""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package import build

    zip_path = build(str(tmp_path / "py3dtilers_spark.zip"))
    out_dir = str(tmp_path / "tiles")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", out_dir,
            "--kd-max", "300",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # neutral cwd: repo package not importable from "."
        env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["ok"] and stats["n_tiles"] > 0 and stats["n_lineage"] == stats["n_tiles"]
    assert os.path.exists(os.path.join(out_dir, "tileset.json"))
