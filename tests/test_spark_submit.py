"""The north rule's literal deployment surface: the pipeline must run
via ``spark-submit --py-files`` (BASELINE.json north_rule). This test
zips the package, copies the CLI driver script to a NEUTRAL directory
(so `hand_index_spark` is importable ONLY through the --py-files zip —
exactly the cluster situation, where executors and driver unpack the
shipped archive), runs `spark-submit --py-files hand_index_spark.zip
build_index_main.py` end-to-end, and checks the index tables landed.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "hand_index_spark.zip")
    pkg = os.path.join(ROOT, "hand_index_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, ROOT))
    return zpath


def test_spark_submit_py_files_end_to_end(tmp_path):
    workdir = str(tmp_path / "neutral")
    os.makedirs(workdir)
    zpath = _zip_package(workdir)
    driver = os.path.join(workdir, "build_index_main.py")
    shutil.copy(
        os.path.join(ROOT, "hand_index_spark", "cli", "build_index_main.py"), driver
    )
    out_dir = str(tmp_path / "index")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", zpath,
            driver,
            "--output-dir", out_dir,
            "--cpus", "2",
        ],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    tail = (proc.stdout or "")[-1500:] + (proc.stderr or "")[-1500:]
    assert proc.returncode == 0, f"spark-submit failed:\n{tail}"
    for t in ("catchments", "hydrotables", "rem_rasters", "catchment_rasters"):
        assert os.path.isdir(os.path.join(out_dir, t, "_meta")), (t, tail)
