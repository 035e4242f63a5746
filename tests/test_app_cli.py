"""CLI surface: the `dag` subcommand drives the multi-table apply from a
JSON topology spec — the spark-submit entry point for the DAG story."""

import json
import os
import sys

import pandas as pd
import pytest

from french_admin_etl_spark.sources.envelope_log import ENVELOPE_SCHEMA
from french_admin_etl_spark.table.lake_table import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dag_subcommand_end_to_end(spark, tmp_root, monkeypatch):
    sys.path.insert(0, REPO)
    import app

    rows = [
        (1, "I", "region", json.dumps({"code": "R1", "name": "A"})),
        (2, "I", "department", json.dumps({"code": "D1", "region_code": "R1", "name": "B"})),
        (3, "U", "department", json.dumps({"code": "D1", "region_code": "R1", "name": "B2"})),
    ]
    ev = pd.DataFrame(
        {
            "lsn": [r[0] for r in rows],
            "ts": pd.Timestamp("2024-01-01"),
            "op": [r[1] for r in rows],
            "table": [r[2] for r in rows],
            "payload": [r[3] for r in rows],
            "schema_version": 1,
            "props": None,
        }
    )
    spark.createDataFrame(ev, schema=ENVELOPE_SCHEMA).write.parquet(
        os.path.join(tmp_root, "mlog")
    )
    spec = {
        "tables": {
            "region": {"schema": "code string, name string", "keys": ["code"]},
            "department": {
                "schema": "code string, region_code string, name string",
                "keys": ["code"],
            },
        },
        "edges": [["department", "region_code", "region", "code"]],
    }
    spec_path = os.path.join(tmp_root, "spec.json")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    monkeypatch.setattr(
        sys, "argv",
        ["app.py", "dag", "--log-dir", os.path.join(tmp_root, "mlog"),
         "--table-root", os.path.join(tmp_root, "t"),
         "--tables-json", spec_path,
         "--checkpoint", os.path.join(tmp_root, "ck"),
         "--num-buckets", "2", "--cores", "4"],
    )
    app.main()
    dep = LakeTable(spark, os.path.join(tmp_root, "t", "department")).read().collect()
    assert len(dep) == 1 and dep[0]["name"] == "B2"
    # rerun: same checkpoint, no new events -> no windows, state unchanged
    app.main()
    dep2 = LakeTable(spark, os.path.join(tmp_root, "t", "department")).read().collect()
    assert [r.asDict() for r in dep2] == [r.asDict() for r in dep]


def test_maintain_delete_where_subcommand(spark, tmp_root, monkeypatch, capsys):
    """`maintain --delete-where` is the operator-facing GDPR erasure
    surface: predicate in, fenced tombstones out, JSON report on stdout."""
    sys.path.insert(0, REPO)
    import app
    from pyspark.sql import types as T

    t = LakeTable.create(
        spark, os.path.join(tmp_root, "gdpr"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]),
        ["repo", "path"], num_buckets=2, write_mode="mor",
    )
    src = spark.createDataFrame(
        [(1, "I", "a", "f1", "go"), (2, "I", "a", "f2", "py"), (3, "I", "b", "f3", "go")],
        "lsn long, op string, repo string, path string, lang string",
    )
    t.merge(src, batch_id=0)
    argv = ["app.py", "maintain", "--table-root", os.path.join(tmp_root, "gdpr"),
            "--delete-where", "lang = 'go'", "--delete-batch-id", "99", "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["delete_where"] == {"rows_tombstoned": 2, "fenced": False}
    assert {r["path"] for r in t.read().collect()} == {"f2"}
    # retry with the same fence id: no-op
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report2["delete_where"]["fenced"] is True
    assert {r["path"] for r in t.read().collect()} == {"f2"}


def test_branch_subcommand_audit_gate(spark, tmp_root, monkeypatch, capsys):
    """`branch --publish --audit-fail-where` is the operator WAP surface:
    a failing audit aborts with the branch intact; a clean audit
    publishes atomically."""
    import pytest
    from pyspark.sql import types as T

    sys.path.insert(0, REPO)
    import app

    root = os.path.join(tmp_root, "wap")
    t = LakeTable.create(
        spark, root,
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]),
        ["k"], num_buckets=2, write_mode="mor",
    )
    t.merge(
        spark.createDataFrame([(1, "I", "a", 1)], "lsn long, op string, k string, v int"),
        batch_id=0,
    )
    br = t.branch("audit")
    br.merge(
        spark.createDataFrame(
            [(2, "U", "a", -5), (3, "I", "b", 7)], "lsn long, op string, k string, v int"
        ),
        batch_id=0,
    )

    # inspect
    monkeypatch.setattr(sys, "argv", ["app.py", "branch", "--table-root", root,
                                      "--name", "audit", "--cores", "4"])
    app.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["exists"] and rep["staged_commits"] == 1 and rep["staged_live_rows"] == 2

    # failing audit: publish aborts, branch + main intact
    argv = ["app.py", "branch", "--table-root", root, "--name", "audit",
            "--publish", "--audit-fail-where", "v < 0", "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit) as exc:
        app.main()
    fail = json.loads(str(exc.value))
    assert fail["audit_failed_rows"] == 1 and fail["published"] is False
    assert t.branch("audit").exists()
    assert {r["k"] for r in t.read().collect()} == {"a"}

    # fix the offending row on the branch, then the same gate passes
    br.merge(
        spark.createDataFrame([(4, "U", "a", 5)], "lsn long, op string, k string, v int"),
        batch_id=1,
    )
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["published"] and rep["published_version"] == t.current_version()
    assert {r["k"]: r["v"] for r in t.read().collect()} == {"a": 5, "b": 7}


def test_view_subcommand_bootstrap_then_incremental(spark, tmp_root, monkeypatch, capsys):
    """`view` is the scheduler surface for maintained joins: first run
    creates + bootstraps the view table, later runs advance it
    incrementally; re-running with no source progress is a no-op."""
    from pyspark.sql import types as T

    sys.path.insert(0, REPO)
    import app

    lroot = os.path.join(tmp_root, "vl")
    rroot = os.path.join(tmp_root, "vr")
    vroot = os.path.join(tmp_root, "vv")
    left = LakeTable.create(
        spark, lroot,
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("fk", T.StringType()),
        ]),
        ["id"], num_buckets=2, write_mode="mor",
    )
    right = LakeTable.create(
        spark, rroot,
        T.StructType([
            T.StructField("code", T.StringType()),
            T.StructField("label", T.StringType()),
        ]),
        ["code"], num_buckets=2, write_mode="mor",
    )
    right.merge(
        spark.createDataFrame([("d1", "x", 1, "I")], "code string, label string, lsn long, op string"),
        batch_id=0,
    )
    left.merge(
        spark.createDataFrame([("a", "d1", 1, "I")], "id string, fk string, lsn long, op string"),
        batch_id=0,
    )
    argv = ["app.py", "view", "--left-root", lroot, "--right-root", rroot,
            "--view-root", vroot, "--on", "fk=code", "--select", "label=label",
            "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "bootstrap"
    view = LakeTable(spark, vroot)
    assert {r["id"]: r["label"] for r in view.read().collect()} == {"a": "x"}

    right.merge(
        spark.createDataFrame([("d1", "x2", 5, "U")], "code string, label string, lsn long, op string"),
        batch_id=1,
    )
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "incremental"
    assert {r["id"]: r["label"] for r in view.read().collect()} == {"a": "x2"}

    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "noop"


def test_maintain_clone_flag(spark, tmp_root, monkeypatch, capsys):
    from pyspark.sql import types as T

    sys.path.insert(0, REPO)
    import app

    root = os.path.join(tmp_root, "cl_src")
    t = LakeTable.create(
        spark, root,
        T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]),
        ["k"], num_buckets=2, write_mode="mor",
    )
    t.merge(
        spark.createDataFrame([(1, "I", "a", 1)], "lsn long, op string, k string, v int"),
        batch_id=0,
    )
    dest = os.path.join(tmp_root, "cl_dev")
    monkeypatch.setattr(sys, "argv", ["app.py", "maintain", "--table-root", root,
                                      "--clone-to", dest, "--cores", "4"])
    app.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["cloned_to"] == dest and rep["clone_deep"] is False
    assert {r["k"] for r in LakeTable(spark, dest).read().collect()} == {"a"}


def test_dag_subcommand_fk_index_spec(spark, tmp_root, monkeypatch):
    """A ``fk_indexes`` entry in the tables spec creates (or reopens) the
    narrow FK index under the table root, the gate maintains it per
    window, and an orphaning delete still halts the CLI run."""
    sys.path.insert(0, REPO)
    import app

    rows = [
        (1, "I", "region", json.dumps({"code": "R1", "name": "A"})),
        (2, "I", "department", json.dumps({"code": "D1", "region_code": "R1", "name": "B"})),
        (3, "D", "region", json.dumps({"code": "R1"})),
    ]
    ev = pd.DataFrame(
        {
            "lsn": [r[0] for r in rows],
            "ts": pd.Timestamp("2024-01-01"),
            "op": [r[1] for r in rows],
            "table": [r[2] for r in rows],
            "payload": [r[3] for r in rows],
            "schema_version": 1,
            "props": None,
        }
    )
    spark.createDataFrame(ev, schema=ENVELOPE_SCHEMA).write.parquet(
        os.path.join(tmp_root, "mlog")
    )
    spec = {
        "tables": {
            "region": {"schema": "code string, name string", "keys": ["code"]},
            "department": {
                "schema": "code string, region_code string, name string",
                "keys": ["code"],
            },
        },
        "edges": [["department", "region_code", "region", "code"]],
        "fk_indexes": [["department", "region_code"]],
    }
    spec_path = os.path.join(tmp_root, "spec.json")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    argv = ["app.py", "dag", "--log-dir", os.path.join(tmp_root, "mlog"),
            "--table-root", os.path.join(tmp_root, "t"),
            "--tables-json", spec_path,
            "--checkpoint", os.path.join(tmp_root, "ck"),
            "--num-buckets", "2", "--cores", "4",
            "--batch-lsns", "2"]
    monkeypatch.setattr(sys, "argv", argv)
    from french_admin_etl_spark.streaming.dag import FKViolation

    with pytest.raises(FKViolation, match="orphaned"):
        app.main()
    # index table was created under the table root and mirrors window 1
    idx = LakeTable(spark, os.path.join(tmp_root, "t", "_fkidx_department_region_code"))
    assert [r.asDict() for r in idx.read().collect()] == [
        {"code": "D1", "region_code": "R1"}
    ]


def test_dag_subcommand_stale_fk_index_fails_clean(spark, tmp_root, monkeypatch):
    """Reopen sanity check (review finding): if the child table was
    dropped and recreated at the same root while the stale ``_fkidx_*``
    table and its cascade checkpoint survived, the checkpoint points at
    versions of the OLD table and the index could under-report orphan
    candidates — the CLI must fail clean, not reopen silently."""
    import shutil

    sys.path.insert(0, REPO)
    import app

    rows = [
        (1, "I", "region", json.dumps({"code": "R1", "name": "A"})),
        (2, "I", "department", json.dumps({"code": "D1", "region_code": "R1", "name": "B"})),
    ]
    ev = pd.DataFrame(
        {
            "lsn": [r[0] for r in rows],
            "ts": pd.Timestamp("2024-01-01"),
            "op": [r[1] for r in rows],
            "table": [r[2] for r in rows],
            "payload": [r[3] for r in rows],
            "schema_version": 1,
            "props": None,
        }
    )
    spark.createDataFrame(ev, schema=ENVELOPE_SCHEMA).write.parquet(
        os.path.join(tmp_root, "mlog")
    )
    spec = {
        "tables": {
            "region": {"schema": "code string, name string", "keys": ["code"]},
            "department": {
                "schema": "code string, region_code string, name string",
                "keys": ["code"],
            },
        },
        "edges": [["department", "region_code", "region", "code"]],
        "fk_indexes": [["department", "region_code"]],
    }
    spec_path = os.path.join(tmp_root, "spec.json")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    argv = ["app.py", "dag", "--log-dir", os.path.join(tmp_root, "mlog"),
            "--table-root", os.path.join(tmp_root, "t"),
            "--tables-json", spec_path,
            "--checkpoint", os.path.join(tmp_root, "ck"),
            "--num-buckets", "2", "--cores", "4",
            "--batch-lsns", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    app.main()  # clean first run — index created and synced
    # simulate the operational mistake: child table recreated at the same
    # root, stale index + checkpoint left behind
    shutil.rmtree(os.path.join(tmp_root, "t", "department"))
    with pytest.raises(ValueError, match="stale fk index"):
        app.main()


def test_dag_subcommand_requeue_quarantined(spark, tmp_root, monkeypatch, capsys):
    """app.py dag --requeue-quarantined drains windows quarantined by a
    previous gate=pre on_violation=record run: the upstream repair landed
    in a later window, so the drain re-applies cleanly and reports it."""
    sys.path.insert(0, REPO)
    import app

    rows = [
        (1, "I", "region", json.dumps({"code": "R1", "name": "A"})),
        (2, "I", "department", json.dumps({"code": "D1", "region_code": "R1", "name": "B"})),
        # poison window: commune references D9 before it exists
        (3, "I", "commune", json.dumps(
            {"code": "C1", "department_code": "D9", "name": "X", "population": 5})),
        (4, "I", "region", json.dumps({"code": "R2", "name": "A2"})),
        # repair window: D9 arrives
        (5, "I", "department", json.dumps({"code": "D9", "region_code": "R1", "name": "L"})),
        (6, "I", "region", json.dumps({"code": "R3", "name": "A3"})),
    ]
    ev = pd.DataFrame(
        {
            "lsn": [r[0] for r in rows],
            "ts": pd.Timestamp("2024-01-01"),
            "op": [r[1] for r in rows],
            "table": [r[2] for r in rows],
            "payload": [r[3] for r in rows],
            "schema_version": 1,
            "props": None,
        }
    )
    spark.createDataFrame(ev, schema=ENVELOPE_SCHEMA).write.parquet(
        os.path.join(tmp_root, "mlog")
    )
    spec = {
        "tables": {
            "region": {"schema": "code string, name string", "keys": ["code"]},
            "department": {
                "schema": "code string, region_code string, name string",
                "keys": ["code"],
            },
            "commune": {
                "schema": "code string, department_code string, name string, population bigint",
                "keys": ["code"],
            },
        },
        "edges": [
            ["department", "region_code", "region", "code"],
            ["commune", "department_code", "department", "code"],
        ],
    }
    spec_path = os.path.join(tmp_root, "spec.json")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    base = ["app.py", "dag", "--log-dir", os.path.join(tmp_root, "mlog"),
            "--table-root", os.path.join(tmp_root, "t"),
            "--tables-json", spec_path,
            "--checkpoint", os.path.join(tmp_root, "ck"),
            "--num-buckets", "2", "--cores", "4",
            "--batch-lsns", "2", "--gate", "pre", "--on-violation", "record"]
    monkeypatch.setattr(sys, "argv", base)
    app.main()  # poison window quarantined, stream advanced
    assert os.listdir(os.path.join(tmp_root, "ck", "quarantine"))
    capsys.readouterr()
    monkeypatch.setattr(sys, "argv", base + ["--requeue-quarantined"])
    app.main()
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert out and all(o["drained"] for o in out)
    assert not os.listdir(os.path.join(tmp_root, "ck", "quarantine"))
    commune = LakeTable(spark, os.path.join(tmp_root, "t", "commune"))
    assert [r["code"] for r in commune.read().collect()] == ["C1"]


def test_ingest_warc_subcommand_end_to_end(spark, tmp_root, monkeypatch, capsys):
    """`ingest-warc`: crawl segments → URL-keyed documents LakeTable,
    latest fetch wins, replayed segments idempotent under a fence."""
    import gzip

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import app
    from test_warc_source import _http_response, _record

    d = os.path.join(tmp_root, "segs")
    os.makedirs(d)

    def resp(uid, uri, date, text):
        return _record(
            "response",
            {"WARC-Type": "response", "WARC-Record-ID": uid,
             "WARC-Date": date, "WARC-Target-URI": uri,
             "Content-Type": "application/http"},
            _http_response(200, "text/html", text),
        )

    no_uri = _record(
        "response",
        {"WARC-Type": "response", "WARC-Record-ID": "<nouri>",
         "WARC-Date": "2026-08-20T09:00:00Z",
         "Content-Type": "application/http"},
        _http_response(200, "text/html", b"keyless"),
    )
    seg = (
        resp("<a>", "http://x.org/1", "2026-08-19T10:00:00Z", b"old version")
        + resp("<b>", "http://x.org/1", "2026-08-20T10:00:00Z", b"new version")
        + resp("<c>", "http://x.org/2", "2026-08-20T11:00:00Z", b"other doc")
        # same-second re-fetch pair: the doc_id tie-break must pick <t2>
        # deterministically (WARC-Date is second-resolution)
        + resp("<t1>", "http://x.org/3", "2026-08-20T12:00:00Z", b"tie A")
        + resp("<t2>", "http://x.org/3", "2026-08-20T12:00:00Z", b"tie B")
        # record without WARC-Target-URI: NULL key — must be dropped, not
        # inserted fresh on every run
        + no_uri
    )
    with open(os.path.join(d, "seg-0.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(seg))

    troot = os.path.join(tmp_root, "docs_table")
    argv = ["app.py", "ingest-warc", d, "--table-root", troot,
            "--num-buckets", "2", "--batch-id", "1", "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    app.main()
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["upserted"] == 3 and not out1["fenced"]

    rows = {r.url: r for r in LakeTable(spark, troot).read().collect()}
    assert set(rows) == {"http://x.org/1", "http://x.org/2", "http://x.org/3"}
    assert rows["http://x.org/3"].content == "tie B"  # doc_id tie-break
    # latest fetch of /1 won the URL-keyed merge
    assert rows["http://x.org/1"].content == "new version"
    assert rows["http://x.org/1"].doc_id == "<b>"

    # replaying the same segment with the same batch id fences to a no-op
    app.main()
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["fenced"] is True
    rows2 = {r.url: r.content for r in LakeTable(spark, troot).read().collect()}
    assert rows2 == {u: r.content for u, r in rows.items()}
