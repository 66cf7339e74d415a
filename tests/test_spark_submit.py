"""Real `spark-submit --py-files` deployment check (north-rule run mode).

Every other test imports the package from the repo checkout; this one
proves the DOCUMENTED deployment works: zip `airbyte_custom_spark`, launch
the actual `spark-submit` binary from a temp cwd with PYTHONPATH stripped,
ship the package ONLY via `--py-files acs.zip`, and run the gen → init →
tail lifecycle end to end in the child JVM (reference lifecycle anchor:
the Airbyte worker launching a connector process per sync;
`airbyte-integrations/bases/base-java` entrypoint).

Serial and JVM-spawning (~1 min): skip with SPARK_GRAFT_SKIP_SUBMIT=1.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> None:
    pkg = os.path.join(REPO, "airbyte_custom_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, names in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in names:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_SUBMIT") == "1",
    reason="explicitly skipped via SPARK_GRAFT_SKIP_SUBMIT",
)
def test_spark_submit_py_files_lifecycle(tmp_path):
    submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    assert os.path.exists(submit), submit

    acs_zip = str(tmp_path / "acs.zip")
    _build_zip(acs_zip)
    driver = str(tmp_path / "submit_smoke.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_smoke.py"), driver)

    env = dict(os.environ)
    # the package must come from the zip, not the checkout
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    seg, tbl, ckpt = (str(tmp_path / d) for d in ("seg", "tbl", "ckpt"))
    proc = subprocess.run(
        [submit, "--py-files", acs_zip, driver, seg, tbl, ckpt, "2000"],
        cwd=str(tmp_path),  # repo root NOT on sys.path
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(last)
    assert out["ok"] is True
    assert out["rows"] > 0
    assert out["version"] >= 1


def test_cluster_scaling_script_smoke(tmp_path):
    """scripts/cluster_scaling.py end-to-end at toy scale: the same apply
    job on local-cluster[1,...] vs local-cluster[4,...] — separate
    executor JVM processes — producing the efficiency artifact.  Tiny
    event count: this asserts the harness runs and the artifact parses,
    not the efficiency value (floor-dominated at 50k events)."""
    import json
    import os
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    art = os.path.join(repo, "CLUSTER_SCALING.json")
    backup = None
    if os.path.exists(art):
        backup = art + ".pytest-backup"
        shutil.copy(art, backup)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "cluster_scaling.py"),
             "--events", "50000", "--reps", "1", "--mem-mb", "2048"],
            capture_output=True, text=True, timeout=420, env=env, cwd=repo,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = out.stdout.strip().splitlines()[-1]
        parsed = json.loads(line)
        assert parsed["pair_executors"] == [1, 4]
        assert parsed["efficiency_n_to_4n"] > 0
        with open(art) as f:
            full = json.load(f)
        assert len(full["reps"]) == 1
    finally:
        if backup:
            shutil.move(backup, art)
        elif os.path.exists(art):
            os.remove(art)
