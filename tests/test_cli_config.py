"""Config parsing, CLI, DDL transforms, stream protocol, progress counters,
exec sink, filename masquerade, freshness filter."""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys

import pytest

from mydumper_spark.config import parse_defaults_file, parse_skiplist_file
from mydumper_spark.plans import ddl
from mydumper_spark.streaming import protocol
from mydumper_spark.sinks.exec_sink import exec_per_file, masquerade_table_name


# -- defaults file -----------------------------------------------------------


def test_parse_defaults_file(tmp_path):
    cfg = tmp_path / "mydumper.cnf"
    cfg.write_text(
        "[mydumper]\n"
        "where = id > 5\n"
        "regex = ^default\\.\n"
        "ignore-engines = MyISAM,CSV\n"
        "\n"
        "[`default`.`customer`]\n"
        "where = c_custkey < 100\n"
        "limit = 50\n"
        "columns_on_select = c_custkey,c_name\n"
        "columns_on_select_replace = c_name:md5(c_name)\n"
        'masquerade = c_name=constant:{"value": "X"}\n'
    )
    parsed = parse_defaults_file(str(cfg))
    assert parsed["global_where"] == "id > 5"
    assert parsed["filters"].regex == "^default\\."
    assert parsed["filters"].ignore_engines == {"MyISAM", "CSV"}
    tt = parsed["per_table"]["customer"]
    assert tt.where == "c_custkey < 100"
    assert tt.limit == 50
    assert tt.select_columns == ["c_custkey", "c_name"]
    assert tt.select_replace == {"c_name": "md5(c_name)"}
    assert tt.masquerade == {"c_name": [("constant", {"value": "X"})]}


def test_parse_skiplist(tmp_path):
    f = tmp_path / "skip"
    f.write_text("db1\n`db2`.`t1`\n# comment\n\n")
    assert parse_skiplist_file(str(f)) == {"db1", "db2.t1"}


# -- DDL transforms ----------------------------------------------------------


def test_definer_strip_and_replace():
    v = "CREATE ALGORITHM=UNDEFINED DEFINER=`root`@`localhost` SQL SECURITY DEFINER VIEW v AS SELECT 1"
    assert "DEFINER=" not in ddl.skip_definer(v)  # SQL SECURITY DEFINER stays
    assert "DEFINER=`app`@`%`" in ddl.replace_definer(v, "app")


def test_strip_auto_increment():
    t = "CREATE TABLE t (id INT) ENGINE=InnoDB AUTO_INCREMENT=4242 DEFAULT CHARSET=utf8"
    assert "AUTO_INCREMENT" not in ddl.strip_auto_increment(t)


def test_view_detection_not_fooled_by_comment():
    """test/specific_16: a table COMMENT='VIEW' must not classify as view."""
    assert ddl.is_view_ddl("CREATE VIEW v AS SELECT 1")
    assert ddl.is_view_ddl("CREATE OR REPLACE ALGORITHM=MERGE VIEW v AS SELECT 1")
    assert not ddl.is_view_ddl("CREATE TABLE tb (id INT) COMMENT='VIEW'")


def test_sequence_rewrite():
    assert ddl.sequence_to_create("CREATE TABLE `s1` (next_val BIGINT)") == "CREATE SEQUENCE `s1`;"


# -- stream protocol ---------------------------------------------------------


def test_protocol_roundtrip(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.parquet").write_bytes(b"AAA" * 100)
    (src / "sub" / "b.dat").write_bytes(b"")  # empty file edge
    (src / "_manifest.json").write_bytes(b'{"x": 1}')
    buf = io.BytesIO()
    n = protocol.stream_directory(buf, str(src))
    assert n == 3
    # manifest framed last (reference orders final metadata last)
    frames = list(protocol.read_frames(io.BytesIO(buf.getvalue())))
    assert frames[-1][0] == "_manifest.json"
    dst = tmp_path / "dst"
    assert protocol.restore_directory(io.BytesIO(buf.getvalue()), str(dst)) == 3
    assert (dst / "a.parquet").read_bytes() == b"AAA" * 100
    assert (dst / "sub" / "b.dat").read_bytes() == b""


def test_protocol_bad_header():
    with pytest.raises(ValueError, match="bad frame header"):
        list(protocol.read_frames(io.BytesIO(b"garbage")))


# -- progress counters -------------------------------------------------------


def test_observe_counters(customer):
    from mydumper_spark.functions.progress import observe_counters

    observed, obs = observe_counters(customer)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["rows"] == customer.count()
    assert m["approx_bytes"] > 0
    assert m["max_row_bytes"] <= m["approx_bytes"]


# -- exec sink + filename masquerade ----------------------------------------


def test_exec_per_file(tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    (d / "part-0001").write_text("x")
    (d / "part-0002").write_text("y")
    marker = tmp_path / "seen"
    results = exec_per_file(str(d), f"sh -c 'echo FILENAME >> {marker}' --", pattern="part-")
    # FILENAME substitution happens inside sh -c string? No: FILENAME is a
    # separate argv token replaced; with sh -c the path lands in $0 via --
    assert all(rc == 0 for _, rc in results)
    assert len(results) == 2


def test_masquerade_table_name_stable():
    a = masquerade_table_name("customer")
    assert a == masquerade_table_name("customer")
    assert a != masquerade_table_name("orders")
    assert a.startswith("t_") and len(a) == 18


def test_dump_with_masqueraded_filenames(spark, sf_dir, tmp_path):
    from mydumper_spark.catalog import TableFilters
    from mydumper_spark.engine import DumpConfig, dump

    out = str(tmp_path / "masked")
    dump(
        spark,
        sf_dir,
        DumpConfig(
            output_dir=out,
            filters=TableFilters(tables_list={"default.region"}),
            masquerade_filenames=True,
        ),
    )
    names = [n for n in os.listdir(out) if n.endswith(".parquet")]
    assert names == [masquerade_table_name("region") + ".parquet"]


# -- freshness filter --------------------------------------------------------


def test_updated_since_filter(spark, sf_dir, tmp_path):
    import shutil

    from mydumper_spark.catalog import ParquetCatalog, TableFilters

    root = tmp_path / "cat"
    root.mkdir()
    shutil.copy(f"{sf_dir}/region.parquet", root / "old.parquet")
    shutil.copy(f"{sf_dir}/nation.parquet", root / "new.parquet")
    os.utime(root / "old.parquet", (0, 0))  # epoch-old
    cat = ParquetCatalog(spark, str(root))
    names = {m.name for m in cat.discover(TableFilters(updated_since_days=365))}
    assert names == {"new"}


# -- CLI ---------------------------------------------------------------------


def test_cli_dump_restore_verify(tmp_path):
    """Full CLI drive in a subprocess (argparse surface, K9 exec hook)."""
    out = str(tmp_path / "d")
    target = str(tmp_path / "r")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r1 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "dump", "--source", "/root/testdata/sf0.001",
         "-o", out, "-T", "region,nation", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    payload = json.loads(r1.stdout.strip().splitlines()[-1])
    assert payload["dumped_tables"] == 2 and payload["rows"]["nation"] == 25
    r2 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "restore", "-d", out, "--target", target,
         "--drop-table", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    res = json.loads(r2.stdout.strip().splitlines()[-1])
    assert all(res["verify"].values())
    r3 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "verify", "-d", out, "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]


def test_object_scope_parse(tmp_path):
    p = tmp_path / "defaults.cnf"
    p.write_text("[`db`.`events`]\nobject_to_export=SCHEMA,TRIGGER\n")
    parsed = parse_defaults_file(str(p))
    assert parsed["per_table"]["events"].object_scope == {"SCHEMA", "TRIGGER"}


def test_schema_only_dump_skips_data(spark, tmp_path):
    from mydumper_spark.engine import DumpConfig, dump
    from mydumper_spark.catalog import TableFilters
    from mydumper_spark.operators.transform import TableTransform

    out = str(tmp_path / "out")
    cfg = DumpConfig(
        output_dir=out,
        filters=TableFilters(tables_list={"default.region", "default.nation"}),
        per_table={"region": TableTransform(object_scope={"SCHEMA"})},
    )
    m = dump(spark, "/root/testdata/sf0.001", cfg)
    assert m.tables["region"].path is None and m.tables["region"].rows == 0
    assert m.tables["region"].schema_checksum  # schema still recorded (P11)
    assert m.tables["nation"].rows > 0 and m.tables["nation"].path


def test_table_filters_admits():
    from mydumper_spark.catalog import TableFilters, TableMeta

    def meta(db, name, engine="InnoDB"):
        return TableMeta(database=db, name=name, path="/x", engine=engine)

    f = TableFilters(regex=r"^sales\.", ignore_engines={"MyISAM"})
    assert f.admits(meta("sales", "orders"))
    assert not f.admits(meta("hr", "people"))          # P6 regex
    assert not f.admits(meta("sales", "log", "MyISAM"))  # P9 engine
    assert not f.admits(meta("information_schema", "t"))  # P12 special
    g = TableFilters(skiplist={"sales.orders", "tmp"})
    assert not g.admits(meta("sales", "orders"))       # P7 skiplist db.table
    assert not g.admits(meta("tmp", "anything"))       # P7 skiplist db
    h = TableFilters(tables_list={"d1.a"}, databases={"d1"})
    assert h.admits(meta("d1", "a"))
    assert not h.admits(meta("d2", "a"))               # P8 db list
    assert not h.admits(meta("d1", "b"))               # P8 table list


def test_cli_diff(tmp_path):
    """`diff` subcommand: two dump generations → per-table change counts."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    old_d, new_d = str(tmp_path / "old"), str(tmp_path / "new")
    for d, where in ((old_d, "n_nationkey < 20"), (new_d, "n_nationkey >= 5")):
        r = subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "dump", "--source",
             "/root/testdata/sf0.001", "-o", d, "-T", "nation",
             "--where", where, "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "diff", "--old", old_d,
         "--new", new_d, "--pk", "nation=n_nationkey", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # old = keys 0-19, new = keys 5-24 → 5 added (20-24), 5 deleted (0-4)
    assert out["nation"] == {"added": 5, "deleted": 5, "changed": 0}


def test_cli_prepare_pipeline(tmp_path):
    """`prepare` subcommand end-to-end: exact dedup + repetition gate +
    decontamination + chunking over the documents fixture, counts sane."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    ev = str(tmp_path / "eval")
    out = str(tmp_path / "prepared")
    # eval set = the doc_id%100==0 docs, extracted via a plain dump of the
    # documents table then filtered here with pyarrow-free spark-less tools:
    # simplest is to reuse the fixture itself as the eval source
    import duckdb

    duckdb.sql(
        "COPY (SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') WHERE doc_id % 100 = 0) "
        f"TO '{ev}' (FORMAT PARQUET)"
    )
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "exact", "--repetition-gate",
         "--decontaminate-eval", ev, "--min-shared", "3",
         "--chunk-tokens", "64", "--chunk-overlap", "8", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    # every stage monotonically shrinks the doc count...
    assert counts["input"] >= counts["after_dedup"] >= counts["after_quality"]
    assert counts["after_quality"] >= counts["after_decontamination"] > 0
    # ...and chunking re-expands into at least one chunk per surviving doc
    assert counts["output_rows"] >= counts["after_decontamination"]


def test_cli_prepare_sub_document_dedup(tmp_path):
    """`prepare --line-dedup --block-dedup-tokens N`: corpus-wide line and
    token-block dedup rewrite text in place; non-text columns carry through
    and the pipeline still writes a valid corpus."""
    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "none", "--line-dedup",
         "--block-dedup-tokens", "16", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < counts["after_dedup"] <= counts["input"]
    assert counts["output_rows"] == counts["after_decontamination"]
    import duckdb

    cols = {c[0] for c in duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{out}/*.parquet')").fetchall()}
    assert {"doc_id", "text", "lang", "source"} <= cols


def test_cli_prepare_block_dedup_keeps_empty_docs(tmp_path):
    """Sub-document dedup must never change the document SET, only text:
    the block path emits no row for token-less docs, so the CLI's rewrite
    join must be a LEFT join carrying the original text through — an inner
    join silently deleted empty/whitespace docs while --line-dedup kept
    them (round-5 advisor finding)."""
    import duckdb

    src = str(tmp_path / "src.parquet")
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(0, 'alpha beta gamma delta', 'en', 's'), "
        "(1, '   ', 'en', 's'), "           # whitespace-only: zero tokens
        "(2, 'alpha beta gamma delta', 'en', 's')"  # dup of doc 0's block
        ") t(doc_id, text, lang, source)) "
        f"TO '{src}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", src, "-o", out, "--dedup", "none",
         "--block-dedup-tokens", "4", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert counts["output_rows"] == counts["input"] == 3
    rows = dict(duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{out}/*.parquet')").fetchall())
    assert rows[1] == "   "                  # untouched, not dropped
    assert rows[0] == "alpha beta gamma delta"
    assert rows[2] == ""                     # duplicate block removed


def test_cli_prepare_pack_requires_chunk(tmp_path):
    """--pack-tokens without --chunk-tokens is a usage error (exit 2), not a
    silent no-op returning raw documents."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", str(tmp_path / "x"), "--pack-tokens", "256"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 2
    assert "--pack-tokens requires --chunk-tokens" in r.stderr


def test_cli_prepare_cap_and_dsir_selection(tmp_path):
    """`prepare --cap-per-source N --dsir-target T --dsir-top K`: the
    corpus-shaping stages run after hygiene and before chunking — output
    is exactly K docs, each from a source capped at N."""
    import duckdb

    tgt = str(tmp_path / "target.parquet")
    duckdb.sql(
        "COPY (SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') WHERE doc_id % 7 = 0) "
        f"TO '{tgt}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "none", "--cap-per-source", "10",
         "--dsir-target", tgt, "--dsir-top", "40", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert counts["after_selection"] == 40
    assert counts["output_rows"] == 40
    per_src = duckdb.sql(
        f"SELECT max(n) FROM (SELECT source, count(*) AS n "
        f"FROM read_parquet('{out}/*.parquet') GROUP BY source)"
    ).fetchone()[0]
    assert per_src <= 10


def test_cli_prepare_shuffle_stage(tmp_path):
    """`prepare --shuffle-seed`: output carries a shuffle_key and the
    document set is unchanged; chunk+pack+shuffle composes."""
    import duckdb

    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "none", "--chunk-tokens", "64",
         "--pack-tokens", "256", "--shuffle-seed", "3",
         "--shuffle-shards", "4", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    cols = {c[0] for c in duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{out}/*.parquet')").fetchall()}
    assert {"seq_id", "text", "shuffle_key", "__shard"} <= cols
    n = duckdb.sql(
        f"SELECT count(DISTINCT seq_id) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert n > 0


def test_cli_embcurate_pipeline(tmp_path):
    """`embcurate`: semantic dedup + decontamination + IVF-PQ index build
    end-to-end over the embeddings fixture; the index directory holds
    cell-partitioned code arrays plus queryable metadata."""
    import duckdb

    ev = str(tmp_path / "eval.parquet")
    duckdb.sql(
        "COPY (SELECT * FROM read_parquet("
        "'/root/testdata/sf0.001/embeddings.parquet') WHERE vec_id % 13 = 0) "
        f"TO '{ev}' (FORMAT PARQUET)"
    )
    out = str(tmp_path / "curated")
    idx = str(tmp_path / "index")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "embcurate",
         "--source", "/root/testdata/sf0.001/embeddings.parquet",
         "-o", out, "--dedup-threshold", "0.4", "--cells", "4",
         "--decontaminate-eval", ev, "--decontaminate-threshold", "0.4",
         "--index-dir", idx, "--pq-m", "8", "--pq-ksub", "16",
         "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert (counts["input"] >= counts["after_semantic_dedup"]
            >= counts["after_decontamination"] > 0)
    assert counts["output_rows"] == counts["after_decontamination"]
    assert os.path.exists(os.path.join(idx, "_index_meta.json"))
    meta = json.load(open(os.path.join(idx, "_index_meta.json")))
    assert len(meta["centroids"]) == 4 and len(meta["codebooks"]) == 8
    # the index is cell-partitioned and stores codes, not vectors
    cells = [d for d in os.listdir(idx) if d.startswith("__cell=")]
    assert cells
    cols = {c[0] for c in duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{idx}/__cell=*/*.parquet')"
    ).fetchall()}
    assert "pq_code" in cols and "embedding" not in cols


def test_prepare_stage_counts_materialize_cache(spark):
    """persist_and_count must leave the stage cached so each stage count is
    a one-time materialization: downstream lineage (the final write, later
    stage counts) reads the cache instead of re-running dedup. Plan-level
    evidence: a dependent computation's plan scans the InMemoryRelation."""
    from mydumper_spark.cli import persist_and_count

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    counts: dict = {}
    cached: list = []
    out = persist_and_count(df, counts, "stage1", cached)
    try:
        assert counts["stage1"] == 100
        assert out.storageLevel.useMemory, "stage not persisted"
        downstream = out.where("doc_id % 2 = 0")
        plan = downstream._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
        assert cached == [out]
    finally:
        for d in cached:
            d.unpersist()


def test_cli_prepare_c4_gopher_substring(tmp_path):
    """`prepare --c4 --gopher-gate --substring-dedup-tokens 8`: substring
    dedup rewrites text in place (doc set unchanged), C4 rewrites AND drops
    failing pages, the Gopher gate drops failing docs — stage counts are
    monotone non-increasing and the output corpus is valid."""
    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "none", "--substring-dedup-tokens", "8",
         "--c4", "--gopher-gate", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    # C4 runs FIRST (token-level dedup rebuilds text with single spaces, so
    # the reverse order would feed C4 one-line pages); the fixture corpus
    # is period-free single-line prose: C4 keeps no lines, every page fails
    # the >=3-line gate — the honest outcome, exactly what the gate is for
    assert counts["after_c4"] == 0
    assert counts["after_dedup"] == 0
    assert counts["output_rows"] == 0

    # without --c4 (fixture has no line structure), gopher + substring
    # produce a real survivor set — with a localized stop-word set, since
    # the synthetic vocabulary contains 'the'/'a' but none of the other
    # English Gopher stop words (the default set would drop everything)
    out2 = str(tmp_path / "prepared2")
    r2 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out2, "--dedup", "none", "--substring-dedup-tokens", "8",
         "--gopher-gate", "--gopher-stopwords", "the,a", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    c2 = json.loads(r2.stdout.strip().splitlines()[-1])
    # substring dedup never changes the doc SET, only text
    assert c2["after_dedup"] == c2["input"]
    assert 0 < c2["after_quality"] < c2["input"]
    assert c2["output_rows"] == c2["after_decontamination"]


def test_cli_prepare_ml_quality_gate(tmp_path):
    """`prepare --ml-quality-gate`: the distilled classifier gates the
    corpus; with localized stop words the fixture yields a real survivor
    split (neither empty nor everything)."""
    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "none",
         "--gopher-stopwords", "the,a", "--ml-quality-gate", "0.5",
         "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < counts["after_quality"] < counts["input"]
    assert counts["output_rows"] == counts["after_decontamination"]


def test_cli_prepare_lm_gate(tmp_path):
    """`prepare --lm-gate-ppm`: the bigram LM trains on the --lm-ref-source
    slice and gates the corpus; a permissive threshold keeps a real split,
    and the flag without a reference fails loudly."""
    out = str(tmp_path / "prepared")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "prepare",
             "--source", "/root/testdata/sf0.001/documents.parquet",
             "-o", out, "--dedup", "none", "--threads", "4", *extra],
            capture_output=True, text=True, env=env, timeout=600,
        )

    r = run("--lm-gate-ppm", "1000", "--lm-ref-source", "src0")
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < counts["after_quality"] <= counts["input"]

    r2 = run("--lm-gate-ppm", "1000")   # no reference corpus given
    assert r2.returncode != 0
    assert "--lm-ref" in (r2.stderr + r2.stdout)


def test_cli_prepare_stream_incremental_resume(tmp_path):
    """`prepare-stream`: two invocations over a growing source dir — the
    second drains ONLY the newly-landed files (checkpoint resume) and the
    cross-batch fingerprint store drops documents already ingested by the
    first run."""
    import duckdb

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "clean")
    ck = str(tmp_path / "ck")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id < 40) TO '{src}/a.parquet' (FORMAT PARQUET)")

    def run():
        return subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "prepare-stream",
             "--source", str(src), "-o", out, "--checkpoint", ck,
             "--exact-dedup", "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=600,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    n1 = json.loads(r1.stdout.strip().splitlines()[-1])["output_rows"]
    assert 0 < n1 <= 40

    # second landing: 20 genuinely new docs + 40 exact re-sends
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id < 60) TO '{src}/b.parquet' (FORMAT PARQUET)")
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    n2 = json.loads(r2.stdout.strip().splitlines()[-1])["output_rows"]
    # the 40 re-sent docs are swallowed by the fingerprint store
    new_docs = n2 - n1
    assert 0 < new_docs <= 20, (n1, n2)
    ids = {r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out}/*/*.parquet')").fetchall()}
    assert len(ids) == n2          # no duplicate doc ever lands twice


def test_cli_prepare_stream_replay_is_idempotent(tmp_path):
    """Crash-replay safety: a batch whose fingerprints already landed but
    whose checkpoint commit was lost must reproduce its output on replay,
    not anti-join itself to EMPTY against its own fps. Simulated by
    deleting the stream checkpoint (not the fp store) after a successful
    run — the replayed batch 0 then sees the store exactly as a crashed
    attempt would have left it."""
    import shutil

    import duckdb

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "clean")
    ck = str(tmp_path / "ck")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id < 40) TO '{src}/a.parquet' (FORMAT PARQUET)")

    def run():
        return subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "prepare-stream",
             "--source", str(src), "-o", out, "--checkpoint", ck,
             "--exact-dedup", "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=600,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    n1 = json.loads(r1.stdout.strip().splitlines()[-1])["output_rows"]
    assert n1 > 0

    # lose the checkpoint commit, keep the fp store: the replay window
    shutil.rmtree(os.path.join(ck, "ck"))
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    n2 = json.loads(r2.stdout.strip().splitlines()[-1])["output_rows"]
    assert n2 == n1                # reproduced, not emptied
    ids = {r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out}/*/*.parquet')").fetchall()}
    assert len(ids) == n1


def test_cli_prepare_stream_legacy_flat_fp_store_migrates(tmp_path):
    """A pre-round-8 fingerprint store is FLAT (root-level part files,
    append-only). The first post-upgrade run must migrate it into the
    batch=-1 sentinel partition before writing its own batch=N partition —
    Spark's partition discovery rejects a directory that mixes root files
    with partition dirs, which would otherwise fail the stream permanently
    on the SECOND post-upgrade run. Legacy fingerprints keep deduplicating
    (docs they cover never land)."""
    import duckdb

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "clean")
    ck = tmp_path / "ck"
    fp_dir = ck / "_fps"
    fp_dir.mkdir(parents=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    con = duckdb.connect()
    # the legacy store: docs < 20 fingerprinted with the exact repo rule
    # (md5 of whitespace-normalized lowercase text), one flat root file
    con.execute(
        "COPY (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', "
        "'g')) AS fp FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"WHERE doc_id < 20) TO '{fp_dir}/part-legacy.parquet' "
        "(FORMAT PARQUET)")
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id < 40) TO '{src}/a.parquet' (FORMAT PARQUET)")

    def run():
        return subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "prepare-stream",
             "--source", str(src), "-o", out, "--checkpoint", str(ck),
             "--exact-dedup", "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=600,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    n1 = json.loads(r1.stdout.strip().splitlines()[-1])["output_rows"]
    # the legacy fps swallowed docs < 20; only 20..39 can land
    assert 0 < n1 <= 20
    # the store is now purely partitioned: batch=-1 (migrated) + batch=0
    assert not [f for f in os.listdir(fp_dir)
                if os.path.isfile(fp_dir / f) and not f.startswith((".", "_"))]
    assert (fp_dir / "batch=-1" / "part-legacy.parquet").exists()

    # the second post-upgrade batch — the run the mixed layout would kill
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id < 60) TO '{src}/b.parquet' (FORMAT PARQUET)")
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    n2 = json.loads(r2.stdout.strip().splitlines()[-1])["output_rows"]
    assert 0 < n2 - n1 <= 20
    low = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*/*.parquet') "
        "WHERE doc_id < 20").fetchone()[0]
    assert low == 0                 # legacy fingerprints kept deduplicating


def test_cli_daemon_ancestor_slot_survives_failed_wrap_dump(tmp_path):
    """The high-severity ring-wrap hazard: with count=2 --incremental,
    iteration 3 recycles slot 0 — the PARENT of the incremental snapshot
    LAST_DUMP points at. The replacement full dump must run in a temp dir
    and only swap into the slot AFTER it succeeds: a dump that fails
    mid-way (here: the source turns unreadable) must leave the ancestor
    intact and LAST_DUMP fully restorable. A later healthy run recovers."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                src / "nation.parquet")
    ring = tmp_path / "ring"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")

    def run(iters):
        return subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "daemon",
             "--source", str(src), "-o", str(ring),
             "--snapshot-interval", "0", "--snapshot-count", "2",
             "--iterations", str(iters), "--incremental", "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=900,
        )

    r = run(2)
    assert r.returncode == 0, r.stderr[-2000:]
    out1 = json.loads(r.stdout.strip().splitlines()[-1])
    assert [s["mode"] for s in out1["snapshots"]] == ["full", "incremental"]
    ancestor_manifest = (ring / "0" / "_manifest.json").read_bytes()

    # the wrap dump dies mid-way: the source is no longer readable
    good = (src / "nation.parquet").read_bytes()
    (src / "nation.parquet").write_bytes(b"this is not a parquet file")
    r_fail = run(1)
    assert r_fail.returncode != 0

    # the ancestor slot is byte-identical — the failed dump never touched it
    assert (ring / "0" / "_manifest.json").read_bytes() == ancestor_manifest
    # and LAST_DUMP (the incremental in slot 1) still materializes fully
    r2 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "restore",
         "-d", str(ring / "LAST_DUMP"), "--target", str(tmp_path / "tgt"),
         "--drop-table", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert all(json.loads(
        r2.stdout.strip().splitlines()[-1])["verify"].values())

    # a healthy re-run self-heals past the crash leftovers (.wip dir) and
    # completes the wrap; the landed manifest's paths point INTO the slot
    (src / "nation.parquet").write_bytes(good)
    r3 = run(1)
    assert r3.returncode == 0, r3.stderr[-2000:]
    out3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert [s["mode"] for s in out3["snapshots"]] == ["full"]
    assert out3["last_dump"].endswith("/0")
    doc0 = json.load(open(ring / "0" / "_manifest.json"))
    slot0 = os.path.realpath(ring / "0")
    for t, e in doc0["tables"].items():
        assert os.path.realpath(e["path"]).startswith(slot0 + os.sep), e
        assert os.path.exists(e["path"])


def test_cli_daemon_only_if_drifted_skips_in_sync_source(tmp_path):
    """daemon --only-if-drifted: the drift gate (source checksums vs
    LAST_DUMP's manifest) skips the snapshot when nothing changed — run 1
    takes the first snapshot, an immediately-following gated run takes
    none (source unchanged, no new slot, LAST_DUMP stays), and after the
    source mutates the gate opens and a fresh snapshot lands."""
    import shutil

    import duckdb

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet",
                src / "region.parquet")
    ring = tmp_path / "ring"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")

    def run(iters):
        r = subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "daemon",
             "--source", str(src), "-o", str(ring),
             "--snapshot-interval", "0", "--snapshot-count", "2",
             "--iterations", str(iters), "--only-if-drifted",
             "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out1 = run(1)
    assert [s["mode"] for s in out1["snapshots"]] == ["full"]
    assert out1["last_dump"].endswith("/0")
    manifest0 = (ring / "0" / "_manifest.json").read_bytes()

    # source unchanged → the gated run takes NO snapshot: no new slot,
    # LAST_DUMP unmoved, slot 0 byte-identical
    out2 = run(2)
    assert [s["mode"] for s in out2["snapshots"]] == [
        "skipped_in_sync", "skipped_in_sync"]
    assert all(s["slot"] is None for s in out2["snapshots"])
    assert out2["last_dump"].endswith("/0")
    assert not (ring / "1").exists()
    assert (ring / "0" / "_manifest.json").read_bytes() == manifest0

    # mutate the source → the gate opens and a snapshot lands in slot 1
    duckdb.sql(
        f"COPY (SELECT * FROM '{src}/region.parquet' WHERE r_regionkey <> 2)"
        f" TO '{src}/region.parquet' (FORMAT PARQUET)")
    out3 = run(1)
    assert [s["mode"] for s in out3["snapshots"]] == ["full"]
    assert out3["last_dump"].endswith("/1")


def test_cli_prepare_stream_blocklist_and_lm_gate(tmp_path):
    """prepare-stream applies the shared blocklist gate per batch and the
    LM gate (trained once on --lm-ref) per batch; blocked docs never land."""
    import duckdb

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "clean")
    ck = str(tmp_path / "ck")
    bl = tmp_path / "badwords.txt"
    bl.write_text("slow\n")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id < 60) TO '{src}/a.parquet' (FORMAT PARQUET)")
    ref = str(tmp_path / "ref.parquet")
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE source = 'src0') TO '{ref}' (FORMAT PARQUET)")

    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare-stream",
         "--source", str(src), "-o", out, "--checkpoint", ck,
         "--blocklist", str(bl), "--lm-gate-ppm", "1000",
         "--lm-ref", ref, "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n = json.loads(r.stdout.strip().splitlines()[-1])["output_rows"]
    blocked = con.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/"
        "documents.parquet') WHERE doc_id < 60 AND "
        "list_contains(string_split_regex(trim(lower(text)), '\\s+'), "
        "'slow')").fetchone()[0]
    assert 0 < n <= 60 - blocked
    landed = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*/*.parquet') "
        "WHERE list_contains(string_split_regex(trim(lower(text)), "
        "'\\s+'), 'slow')").fetchone()[0]
    assert landed == 0

    # the flag without a reference fails loudly before the stream starts
    r2 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare-stream",
         "--source", str(src), "-o", str(tmp_path / "c2"),
         "--checkpoint", str(tmp_path / "ck2"),
         "--lm-gate-ppm", "1000", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r2.returncode != 0 and "--lm-ref" in (r2.stderr + r2.stdout)


def test_cli_daemon_ring_full_and_incremental(tmp_path):
    """`daemon`: snapshots land round-robin in ring slots with LAST_DUMP
    repointed; --incremental makes the second snapshot a delta against the
    first, and the wrap onto a live-chain ancestor runs FULL automatically
    (the chain-safety rule). A recycled slot is cleared of stale artifacts.
    LAST_DUMP always restores to the current source state."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                src / "nation.parquet")
    ring = str(tmp_path / "ring")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")

    def run(iters):
        r = subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "daemon",
             "--source", str(src), "-o", ring,
             "--snapshot-interval", "0", "--snapshot-count", "2",
             "--iterations", str(iters), "--incremental", "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out1 = run(2)
    assert [s["mode"] for s in out1["snapshots"]] == ["full", "incremental"]
    assert out1["last_dump"].endswith("/1")
    assert os.path.realpath(os.path.join(ring, "LAST_DUMP")).endswith("/1")
    inc_doc = json.load(open(os.path.join(ring, "1", "_manifest.json")))
    assert os.path.realpath(
        inc_doc["parent_manifest"]) == os.path.realpath(
        os.path.join(ring, "0"))

    # third snapshot wraps onto slot 0 — an ancestor of the live chain ->
    # forced FULL, ring state resumes across invocations
    out2 = run(1)
    assert [s["mode"] for s in out2["snapshots"]] == ["full"]
    assert out2["last_dump"].endswith("/0")
    # the recycled slot holds a FULL manifest (no lineage), no stale delta
    doc0 = json.load(open(os.path.join(ring, "0", "_manifest.json")))
    assert "parent_manifest" not in doc0
    assert not [f for f in os.listdir(os.path.join(ring, "0"))
                if "delta" in f or "deletes" in f]

    # LAST_DUMP restores to the source state
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "restore",
         "-d", os.path.join(ring, "LAST_DUMP"),
         "--target", str(tmp_path / "tgt"), "--drop-table", "--threads", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert all(json.loads(
        r.stdout.strip().splitlines()[-1])["verify"].values())


def test_cli_daemon_crash_window_never_recycles_last_dump(tmp_path):
    """Crash window: ring state advanced but LAST_DUMP was not repointed
    (died between the state write and the symlink). The next snapshot must
    NOT recycle the slot LAST_DUMP targets — it overwrites the orphaned
    slot instead."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet",
                src / "region.parquet")
    ring = tmp_path / "ring"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")

    def run(iters):
        r = subprocess.run(
            [sys.executable, "-m", "mydumper_spark", "daemon",
             "--source", str(src), "-o", str(ring),
             "--snapshot-interval", "0", "--snapshot-count", "2",
             "--iterations", str(iters), "--threads", "4"],
            capture_output=True, text=True, env=env, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run(2)                                  # slots 0,1; LAST_DUMP -> 1
    # simulate the crash: state says 1 was taken, but LAST_DUMP points
    # at slot 0 (the repoint never happened)
    (ring / ".ring_state").write_text("1")
    link = ring / "LAST_DUMP"
    link.unlink()
    os.symlink(str(ring / "0"), str(link))
    before = (ring / "0" / "_manifest.json").read_bytes()

    out = run(1)
    # the naive next slot would be 0 (the LAST_DUMP target) — the guard
    # must land on 1 instead, leaving slot 0 untouched until the repoint
    assert out["snapshots"][0]["slot"].endswith("/1")
    assert out["last_dump"].endswith("/1")
    assert (ring / "0" / "_manifest.json").read_bytes() == before


def test_cli_stream_dump_restore_pipe(tmp_path):
    """`dump --stream | restore --stream`: the dump frames every file onto
    stdout in the reference wire protocol, the restore reassembles from
    stdin and loads — the mydumper|myloader pipe, end-to-end. Default
    --stream deletes local files after sending (reference semantics);
    --no-delete keeps them."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    staging = str(tmp_path / "staging")
    r1 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "dump",
         "--source", "/root/testdata/sf0.001", "-o", staging,
         "-T", "region,nation", "--stream", "--no-delete", "--threads", "4"],
        capture_output=True, env=env, timeout=600,
    )
    assert r1.returncode == 0, r1.stderr[-2000:].decode()
    assert r1.stdout.startswith(b"\n-- ")      # pure protocol on stdout
    summary = json.loads(r1.stderr.decode().strip().splitlines()[-1])
    assert summary["dumped_tables"] == 2 and summary["streamed_files"] > 4
    assert os.path.exists(os.path.join(staging, "_manifest.json"))  # kept

    # producer/consumer overlap wire order: every table DATA frame was
    # pushed by the per-table completion callback, so all of them precede
    # every dump-wide artifact (schema DDL, manifests) — and the INI
    # 'metadata' file is the FINAL frame: a reference myloader consumer
    # treats its arrival as the dump-complete signal (mydumper_stream.c
    # final-metadata ordering), so it must never frame mid-stream just
    # because it sorts before 'z*' data files alphabetically
    import io

    from mydumper_spark.streaming.protocol import read_frames

    names = [fn for fn, _ in read_frames(io.BytesIO(r1.stdout))]
    data_pos = [i for i, fn in enumerate(names) if ".parquet/" in fn]
    wide_pos = [i for i, fn in enumerate(names)
                if fn.endswith(("-schema.sql", ".ini")) or fn == "metadata"]
    assert data_pos and wide_pos
    assert max(data_pos) < min(wide_pos)
    assert names[-1] == "metadata"
    assert "_manifest.json" in names

    landing = str(tmp_path / "landing")
    target = str(tmp_path / "target")
    r2 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "restore",
         "-d", landing, "--target", target, "--drop-table",
         "--stream", "--threads", "4"],
        input=r1.stdout, capture_output=True, env=env, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:].decode()
    res = json.loads(r2.stdout.decode().strip().splitlines()[-1])
    assert res["load"] == {"nation": True, "region": True}
    assert all(res["verify"].values())

    # default --stream DELETES the staged files after sending
    staging2 = str(tmp_path / "staging2")
    r3 = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "dump",
         "--source", "/root/testdata/sf0.001", "-o", staging2,
         "-T", "region", "--stream", "--threads", "4"],
        capture_output=True, env=env, timeout=600,
    )
    assert r3.returncode == 0, r3.stderr[-2000:].decode()
    leftovers = [f for _, _, fs in os.walk(staging2) for f in fs]
    assert leftovers == []


def test_retarget_database_spellings():
    """The -B DDL rewrite covers all three qualifier spellings and leaves
    other-schema references and non-qualifier occurrences alone."""
    from mydumper_spark.plans.ddl import retarget_database

    raw = ('CREATE VIEW app.v AS SELECT a.x FROM `app`.`t` a '
           'JOIN "app"."u" u ON u.id = a.id JOIN other.app o '
           "ON o.k = a.k WHERE a.note <> 'keep happy.'")
    out = retarget_database(raw, "app", "staging", "ansi")
    assert '"staging".`t`' in out or '"staging".`t`' in out
    assert '"staging"."u"' in out
    assert out.startswith('CREATE VIEW "staging".v')
    assert "other.app" in out          # app as a TABLE name untouched
    assert "happy." in out             # arbitrary text untouched
    assert "app." not in out.replace("happy.", "")


def test_cli_prepare_token_budget(tmp_path):
    """`prepare --token-budget N` wiring: the output's whitespace-token
    total fits the budget and is a non-trivial strict subset (prefix
    EXACTNESS itself is pinned by test_budget_select_exact_prefix_and_edges
    and the x_budget_select oracle)."""
    import duckdb

    out = str(tmp_path / "budgeted")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    budget = 3000
    r = subprocess.run(
        [sys.executable, "-m", "mydumper_spark", "prepare",
         "--source", "/root/testdata/sf0.001/documents.parquet",
         "-o", out, "--dedup", "none", "--threads", "4",
         "--token-budget", str(budget)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < counts["after_token_budget"] < counts["input"]
    con = duckdb.connect()
    toks = con.execute(
        f"SELECT sum(len(regexp_split_to_array(trim(text), '\\s+') )) "
        f"FROM '{out}/*.parquet'").fetchone()[0]
    assert 0 < toks <= budget
