"""Real-Iceberg integration (r3 verdict #7): when an Iceberg Spark
runtime jar is discoverable, run append / read / MERGE-free delete /
snapshot-expire against an actual hadoop catalog built from
``checkpoint.iceberg_session_confs``. Skips cleanly where no jar exists
(this sandbox: no jar, offline ivy).

The catalog session needs its own JVM confs (``spark.jars`` +
extensions cannot be injected into the suite's running session), so the
probe runs in a SUBPROCESS with a dedicated SparkSession — the same
isolation a real ``spark-submit`` job gets.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from webextract import checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from webextract import checkpoint

    confs = checkpoint.iceberg_session_confs({warehouse!r}, catalog="it")
    assert confs is not None
    b = (SparkSession.builder.master("local[4]")
         .appName("iceberg-it")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false"))
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    out = {{}}
    spark.sql("CREATE TABLE it.db.t (id BIGINT, s STRING) USING iceberg")
    spark.range(10).selectExpr("id", "concat('v', id) AS s") \\
        .writeTo("it.db.t").append()
    spark.range(10, 15).selectExpr("id", "concat('v', id) AS s") \\
        .writeTo("it.db.t").append()
    out["n_after_appends"] = spark.table("it.db.t").count()
    spark.sql("DELETE FROM it.db.t WHERE id >= 12")
    out["n_after_delete"] = spark.table("it.db.t").count()
    out["n_snapshots"] = spark.sql(
        "SELECT COUNT(*) AS c FROM it.db.t.snapshots").first()["c"]
    spark.sql("CALL it.system.expire_snapshots("
              "table => 'db.t', retain_last => 1)")
    out["n_snapshots_after_expire"] = spark.sql(
        "SELECT COUNT(*) AS c FROM it.db.t.snapshots").first()["c"]
    out["rows"] = sorted(r["id"] for r in spark.table("it.db.t").collect())
    print("RESULT:" + json.dumps(out))
    spark.stop()
""")


@pytest.mark.skipif(checkpoint.iceberg_jar() is None,
                    reason="no Iceberg Spark runtime jar discoverable "
                           "(offline sandbox) — iceberg_session_confs "
                           "returns None; the Catalog shim is the "
                           "tested fallback")
def test_iceberg_catalog_roundtrip(tmp_path):
    script = _DRIVER.format(repo=REPO, warehouse=str(tmp_path / "wh"))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT:")][-1]
    got = json.loads(line[len("RESULT:"):])
    assert got["n_after_appends"] == 15
    assert got["n_after_delete"] == 12
    assert got["rows"] == list(range(12))
    assert got["n_snapshots"] >= 3          # 2 appends + delete
    assert got["n_snapshots_after_expire"] == 1


def test_iceberg_confs_none_without_jar(tmp_path, monkeypatch):
    # the probe's negative arm is deterministic here: empty roots → no
    # jar → confs None → callers fall back to the Catalog shim
    monkeypatch.setattr(checkpoint, "iceberg_jar", lambda roots=None: None)
    assert checkpoint.iceberg_session_confs(str(tmp_path)) is None
