"""End-to-end ``spark-submit --py-files engine.zip job.py`` proof
(north_rule: "run via spark-submit --py-files on a multi-executor
cluster"). The sandbox has no cluster manager, so the submit runs
local-mode — but through the REAL submit path: the engine ships as a
zip on --py-files (executors import it from the archive, not the repo
checkout), the master comes from the submit command line, and the job
talks to the checkpoint dir like any driver process would."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def _zip_engine(dest: str) -> str:
    zpath = os.path.join(dest, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "img_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_crawl_job(spark, tmp_path_factory):
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.crawl import read_frontier
    from img_spark.sources.synthweb import (
        FIXTURE_CONFIG,
        FIXTURE_ROBOTS,
        FIXTURE_SEEDS,
        fixture_pages_df,
    )

    work = str(tmp_path_factory.mktemp("submit"))
    pages_pq = os.path.join(work, "pages")
    fixture_pages_df(spark).write.parquet(pages_pq)
    robots_pq = os.path.join(work, "robots")
    robots_df(spark, FIXTURE_ROBOTS).write.parquet(robots_pq)
    cfg_json = os.path.join(work, "web.json")
    with open(cfg_json, "w") as f:
        json.dump(FIXTURE_CONFIG, f)
    ckpt = os.path.join(work, "ckpt")
    zpath = _zip_engine(work)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the engine must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    env["IMG_SPARK_DRIVER_MEM"] = "2g"
    cmd = [
        _spark_submit(),
        "--master", "local[4]",
        "--py-files", zpath,
        os.path.join(REPO, "job.py"),
        "--seeds", *FIXTURE_SEEDS,
        "--pages", pages_pq,
        "--checkpoint", ckpt,
        "--config", cfg_json,
        "--robots-rules", robots_pq,
        "--partitions", "4",
    ]
    # run from a scratch cwd so a repo-relative import could not
    # accidentally satisfy `import img_spark`
    proc = subprocess.run(
        cmd, cwd=work, env=env, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [
        json.loads(ln) for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    assert final.get("done") is True
    assert final["generation"] == 7
    assert final["frontier_status"]["fetched"] == 12

    # the checkpoint a submitted job wrote is readable by any other
    # driver (here: the test session) — same manifests, same layout
    frontier = read_frontier(spark, ckpt, final["generation"])
    fetched = {
        r["url"] for r in
        frontier.filter(F.col("status") == "fetched").collect()
    }
    assert len(fetched) == 12
    assert "https://site-a.test/" in fetched


def test_job_main_resume_and_flags(spark, tmp_path):
    """job.py's driver logic in-process (the session fixture is reused
    by getOrCreate): a run capped at 2 generations, then --resume
    completes the crawl; --priority score and --host-budgets flags are
    accepted and wired through."""
    import json as _json

    import job
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.crawl import read_frontier
    from img_spark.sources.synthweb import (
        FIXTURE_CONFIG,
        FIXTURE_ROBOTS,
        FIXTURE_SEEDS,
        fixture_pages_df,
    )

    pages_pq = str(tmp_path / "pages")
    fixture_pages_df(spark).write.parquet(pages_pq)
    robots_pq = str(tmp_path / "robots")
    robots_df(spark, FIXTURE_ROBOTS).write.parquet(robots_pq)
    budgets_pq = str(tmp_path / "budgets")
    spark.createDataFrame(
        [("site-a.test", 5)], "host string, budget int"
    ).write.parquet(budgets_pq)
    cfg_json = str(tmp_path / "web.json")
    with open(cfg_json, "w") as f:
        _json.dump(FIXTURE_CONFIG, f)
    ckpt = str(tmp_path / "ckpt")

    base = [
        "--pages", pages_pq, "--checkpoint", ckpt, "--config", cfg_json,
        "--robots-rules", robots_pq, "--partitions", "4",
        "--priority", "score", "--priority-score=-depth",
        "--host-budgets", budgets_pq,
    ]
    assert job.main(base + ["--seeds", *FIXTURE_SEEDS,
                            "--max-generations", "2"]) == 0
    assert job.main(base + ["--resume"]) == 0
    frontier = read_frontier(
        spark, ckpt,
        max(int(p.name[len("manifest-g"):-len(".json")])
            for p in tmp_path.glob("ckpt/manifest-g*.json")),
    )
    from pyspark.sql import functions as F2

    assert frontier.filter(F2.col("status") == "fetched").count() == 12
    # no seeds and no resume: argparse-level usage error
    assert job.main(["--pages", pages_pq, "--checkpoint", ckpt]) == 2
