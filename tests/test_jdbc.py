"""JDBC modality over embedded Derby (VERDICT r9 task 3): partitioned
scan / sink round-trip, MERGE-upsert semantics, and the JDBC twin of the
runs ledger pinned by the same upsert-on-conflict scenario as the
parquet ledger (reference Runs.scala:93-102, runs.sql:11)."""

from __future__ import annotations


# integration-style tier: excluded from the default fast gate run
# (pytest.ini); the full suite runs with -m "slow or not slow"
import pytest

pytestmark = pytest.mark.slow

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dig_aggregator_core_spark.sources.jdbcio import (
    JdbcRunsLedger,
    derby_url,
    jdbc_upsert,
    read_jdbc,
    scratch_db,
    write_jdbc,
)
from dig_aggregator_core_spark.plans.inputs import Input

T0 = datetime(2026, 1, 1, 0, 0, 0)


def inp(name: str, offset_s: int = 0) -> Input:
    return Input(name, T0 + timedelta(seconds=offset_s))


@pytest.fixture()
def url():
    return derby_url(scratch_db("testdb"))


@pytest.fixture()
def runs(spark, url):
    ledger = JdbcRunsLedger(spark, url, "test", "TestMethod")
    ledger.migrate()
    yield ledger
    ledger.drop()


def test_write_read_roundtrip_partitioned(spark, url):
    df = spark.createDataFrame(
        [(i, f"name_{i}", i * 10) for i in range(50)],
        "id bigint, name string, score bigint",
    )
    write_jdbc(df.coalesce(1), url, '"rt"', mode="overwrite")
    back = read_jdbc(
        spark, url, '"rt"',
        partition_column="id", lower=0, upper=50, num_partitions=4,
    )
    # the partitioned read really fans out into 4 range-bounded tasks
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 50
    got = {(r["id"], r["name"], r["score"]) for r in back.collect()}
    assert got == {(i, f"name_{i}", i * 10) for i in range(50)}


def test_merge_upsert_replaces_matched_inserts_new(spark, url):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k bigint, tag string, v bigint",
    )
    write_jdbc(base.coalesce(1), url, '"m"', mode="overwrite")
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)],
        "k bigint, tag string, v bigint",
    )
    jdbc_upsert(spark, url, "m", updates, key=["k"])
    got = {
        (r["k"], r["tag"], r["v"])
        for r in read_jdbc(spark, url, '"m"').collect()
    }
    # k=2 REPLACED (not appended), k=4 inserted, k=1/3 untouched
    assert got == {(1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40)}


def test_jdbc_runs_upsert_same_key_new_version(runs):
    """Twin of tests/test_ledger.py::test_runs_upsert_same_key_new_version
    on the database modality: re-inserting the same (input, output) key
    with a new version REPLACES the row via database-side MERGE."""
    inputs = [inp(str(n), n) for n in range(1, 4)]
    runs.insert("TestStage", "o", inputs)
    assert {(r.input, r.version) for r in runs.all()} == {
        (i.key, i.version) for i in inputs
    }

    new_inputs = [inp(str(n), n) for n in range(4, 7)]
    runs.insert("TestStage", "o", new_inputs)
    assert {(r.input, r.version) for r in runs.all()} == {
        (i.key, i.version) for i in inputs + new_inputs
    }

    updated = [inp(i.key, 100) for i in inputs]  # same keys, newer versions
    runs.insert("TestStage", "o", updated)
    assert {(r.input, r.version) for r in runs.all()} == {
        (i.key, i.version) for i in new_inputs + updated
    }
    assert len(runs.all()) == 6  # upsert, not append

    runs.delete("TestStage", "o")
    assert runs.all() == []


def test_jdbc_runs_scoped_and_migrate_idempotent(spark, url, runs):
    runs.insert("TestStage", "o1", [inp("i1")])
    runs.migrate()  # idempotent: table exists, no error, rows intact
    assert len(runs.all()) == 1
    other = JdbcRunsLedger(spark, url, "test", "OtherMethod")
    assert other.of("TestStage").count() == 0
    assert runs.of("TestStage").count() == 1
    scoped = runs.of("TestStage").select("input").collect()
    assert [r["input"] for r in scoped] == ["i1"]
    runs.delete("TestStage", "o1")


def test_registered_jdbc_queries_run(spark, sf_dir):
    from dig_aggregator_core_spark import registry

    registry.load_all()
    rt = registry.QUERIES["scan_jdbc_roundtrip"](spark, sf_dir)
    assert rt.count() == 5  # five regions
    mu = registry.QUERIES["jdbc_merge_upsert"](spark, sf_dir)
    rows = {r["nation"]: r for r in mu.collect()}
    assert rows  # per-nation aggregate over merged supplier table
    assert all(r["n_rows"] > 0 for r in rows.values())


def test_conditional_merge_is_order_independent(spark, url):
    """Pins the Derby semantics stream_jdbc_cdc_upsert relies on: MERGE
    SET expressions evaluate against the PRE-update row (SQL standard),
    so a newer-wins CASE + additive counter converge to the same state
    whichever order the batches apply in."""
    from dig_aggregator_core_spark.sources.jdbcio import jdbc_execute

    newer = 's."ts" > t."ts"'
    merge = (
        'MERGE INTO "oi_state" t USING "oi_stage" s ON t."k" = s."k"'
        " WHEN MATCHED THEN UPDATE SET "
        f'"ts" = CASE WHEN {newer} THEN s."ts" ELSE t."ts" END, '
        f'"v" = CASE WHEN {newer} THEN s."v" ELSE t."v" END, '
        '"n" = t."n" + s."n"'
        ' WHEN NOT MATCHED THEN INSERT ("k", "ts", "v", "n")'
        ' VALUES (s."k", s."ts", s."v", s."n")'
    )
    batch_a = [(1, 10, "a10", 2), (2, 5, "b5", 1)]
    batch_b = [(1, 7, "a7", 3), (3, 1, "c1", 1)]  # k=1 OLDER in batch b

    def run(order):
        jdbc_execute(
            spark, url,
            'CREATE TABLE "oi_state" ("k" BIGINT PRIMARY KEY,'
            ' "ts" BIGINT, "v" VARCHAR(16), "n" BIGINT)',
        )
        for rows in order:
            df = spark.createDataFrame(
                rows, "k bigint, ts bigint, v string, n bigint"
            )
            write_jdbc(
                df.coalesce(1), url, '"oi_stage"', mode="overwrite",
                create_types="v VARCHAR(16)",
            )
            jdbc_execute(spark, url, merge)
        got = {
            (r["k"], r["ts"], r["v"], r["n"])
            for r in read_jdbc(spark, url, '"oi_state"').collect()
        }
        jdbc_execute(spark, url, 'DROP TABLE "oi_state"')
        return got

    ab = run([batch_a, batch_b])
    ba = run([batch_b, batch_a])
    assert ab == ba
    # and the converged state is newer-wins with accumulated counts
    assert ab == {(1, 10, "a10", 5), (2, 5, "b5", 1), (3, 1, "c1", 1)}


def test_jdbc_runstatus_reset_and_lifecycle(spark, url):
    """Twin of the parquet RunStatus tests: insert -> start -> end sets
    the lifecycle; re-insert of an existing key RESETS started/ended to
    NULL (reference RunStatus.scala:79-83) via the MERGE's matched arm."""
    from dig_aggregator_core_spark.sources.jdbcio import JdbcRunStatusLedger

    st = JdbcRunStatusLedger(spark, url, "test", "TestMethod")
    st.migrate()
    try:
        st.insert("S", "o1")
        st.start("S", "o1", T0)
        st.end("S", "o1", T0 + timedelta(seconds=5))
        rows = {r.output: r for r in st.all()}
        assert rows["o1"].started == T0
        assert rows["o1"].ended == T0 + timedelta(seconds=5)

        st.insert("S", "o1")  # re-insert resets lifecycle
        rows = {r.output: r for r in st.all()}
        assert rows["o1"].started is None and rows["o1"].ended is None
        st.delete("S", "o1")
        assert st.all() == []
    finally:
        st.drop()


def test_method_end_to_end_against_jdbc_ledgers(spark, tmp_path):
    """The full Method machinery (discover -> route -> run -> commit ->
    delta on re-run) against DATABASE ledgers — the reference's actual
    deployment shape (its Context talks to MySQL over JDBC; Db.scala:53).
    Mirrors tests/test_end_to_end_method.py's first scenario, swapping
    only the ledger store via jdbc_context."""
    import time as _time

    from dig_aggregator_core_spark.plans.context import local_lister
    from dig_aggregator_core_spark.plans.opts import Opts
    from dig_aggregator_core_spark.sources.jdbcio import jdbc_context
    from tests.test_end_to_end_method import (
        FrequencyStage,
        read_result,
        write_dataset,
    )

    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    write_dataset(data, "AFR", "d1", [("v1", 0.1, 1.0)], 10.0)
    write_dataset(data, "EUR", "d1", [("v3", 0.5, 5.0)], 10.0)

    ctx = jdbc_context(
        spark,
        project="itest_jdbc",
        method="FrequencyMethod",
        warehouse=str(tmp_path / "wh"),
        lister=local_lister(data),
        url=derby_url(scratch_db("e2e")),
    )
    ctx.runs.migrate()
    ctx.runstatus.migrate()
    try:
        stage = FrequencyStage(ctx, data, out)
        stage.run(Opts(yes=True))
        assert sorted(stage.jobs_run) == ["AFR", "EUR"]
        assert read_result(spark, f"{out}/AFR") == {"v1": (0.1, 1.0)}

        # provenance committed to the DATABASE: inputs per output
        by_out = {}
        for r in ctx.runs.of("FrequencyStage").collect():
            by_out.setdefault(r.output, set()).add(r.input)
        assert "variants/AFR/d1/part-00000.json" in by_out["AFR"]
        assert "variants/EUR/d1/metadata" in by_out["AFR"]  # ALL-routed

        # lifecycle rows closed
        st = {r.output: r for r in ctx.runstatus.of("FrequencyStage").collect()}
        assert st["AFR"].started is not None and st["AFR"].ended is not None

        # quiescent re-run: fresh ledger -> zero jobs
        stage.jobs_run.clear()
        stage.run(Opts(yes=True))
        assert stage.jobs_run == []

        # a new dataset lands -> delta re-run (metadata is ALL-routed)
        _time.sleep(1.1)
        write_dataset(data, "AFR", "d2", [("v1", 0.3, 3.0)], 30.0)
        stage.jobs_run.clear()
        stage.run(Opts(yes=True))
        assert sorted(stage.jobs_run) == ["AFR", "EUR"]
        assert read_result(spark, f"{out}/AFR")["v1"] == (0.25, 2.5)
    finally:
        ctx.runs.drop()
        ctx.runstatus.drop()


def test_job_side_commit_runs_against_jdbc_ledger(spark, runs):
    """The job-side commitRun hook (reference commitRun.py:24-71)
    against the DATABASE ledger: a job upserts its own provenance
    mid-run through the same MERGE path; dryrun is a no-op."""
    from dig_aggregator_core_spark.plans.stage import JobContext

    jc = JobContext(
        spark=spark, method="TestMethod", stage="S", output="o1",
        prefix="out/TestMethod/S", dryrun=False, runs=runs,
    )
    jc.commit_runs([inp("i1"), inp("i2", 5)])
    assert {(r.input, r.output) for r in runs.all()} == {
        ("i1", "o1"), ("i2", "o1")
    }
    # idempotent re-commit (same keys, same versions): still 2 rows
    jc.commit_runs([inp("i1"), inp("i2", 5)])
    assert len(runs.all()) == 2

    dry = JobContext(
        spark=spark, method="TestMethod", stage="S", output="o2",
        prefix="test/TestMethod/S", dryrun=True, runs=runs,
    )
    dry.commit_runs([inp("i3")])
    assert len(runs.all()) == 2  # dryrun committed nothing
    runs.delete("S", "o1")


def test_delete_returns_affected_row_count(spark, runs):
    """ADVICE r10: delete must report affected rows like the parquet
    twin (tests/test_ledger.py) and the reference's Quill delete
    (Runs.scala:108-116), not a hardcoded 0."""
    runs.insert("S", "o1", [inp("i1"), inp("i2", 5)])
    runs.insert("S", "o2", [inp("i1")])
    assert runs.delete("S", "o1") == 2
    assert runs.delete("S", "o1") == 0  # already gone
    assert runs.delete("S", "o2") == 1


def test_upsert_drops_staging_table(spark, url):
    """ADVICE r10: the MERGE's scratch table is transport, not state —
    it must not survive the upsert."""
    base = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    write_jdbc(base.coalesce(1), url, '"s1"', mode="overwrite")
    jdbc_upsert(
        spark, url, "s1",
        spark.createDataFrame([(2, 20)], "k bigint, v bigint"), key=["k"],
    )
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        # staging names are per-call (s1_staging_<nonce>) since the r12
        # concurrency fix — match the whole family via a LIKE pattern
        rs = conn.getMetaData().getTables(None, None, "s1_staging%", None)
        leftover = rs.next()
        rs.close()
    finally:
        conn.close()
    assert not leftover


def test_jdbc_runs_concurrent_upserts_lose_nothing(runs):
    """VERDICT r11 task 5 — the JDBC twin of the parquet ledger's
    barrier-threaded race (tests/test_ledger.py): two writers upserting
    simultaneously over embedded Derby. Both writers' rows must land
    (per-call staging tables mean neither can clobber the other's
    transport), and the one overlapping key must resolve to exactly one
    row via the MERGE's duplicate-key retry — upsert-under-race
    semantics matching ON DUPLICATE KEY UPDATE (Runs.scala:93-102)."""
    import threading

    barrier = threading.Barrier(2)
    errors: list[BaseException] = []

    def writer(tag: str) -> None:
        try:
            barrier.wait(timeout=30)
            for n in range(3):
                runs.insert(
                    "TestStage",
                    f"out_{tag}_{n}",
                    [inp(f"in_{tag}_{n}", n)],
                )
            # both writers also hit ONE shared key with different versions
            runs.insert("TestStage", "shared_out", [inp("shared_in", 99)])
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, errors

    rows = runs.all()
    outputs = {r["output"] for r in rows}
    expected = {f"out_{t}_{n}" for t in ("a", "b") for n in range(3)}
    assert expected <= outputs, expected - outputs
    # upsert-on-conflict: the shared key exists exactly once
    shared = [r for r in rows if r["output"] == "shared_out"]
    assert len(shared) == 1
    assert len(rows) == 7
    # no staging transport left behind by either writer
    conn = runs.spark._jvm.java.sql.DriverManager.getConnection(runs.url)
    try:
        rs = conn.getMetaData().getTables(None, None, "runs_staging%", None)
        leftover = rs.next()
        rs.close()
    finally:
        conn.close()
    assert not leftover


def test_db_secret_connection_strings_and_drivers():
    """DbSecret twins RdsConfig.Secret -> Db (reference Db.scala:11-34):
    engine picks the driver, connectionString(schema) the url; unknown
    engines raise like Db.scala:32."""
    from dig_aggregator_core_spark.sources.jdbcio import DbSecret

    my = DbSecret.from_dict({
        "engine": "mysql", "host": "db.example.internal", "port": 3306,
        "username": "u", "password": "p", "dbname": "agg",
    })
    assert my.connection_string() == (
        "jdbc:mysql://db.example.internal:3306/agg"
    )
    assert my.connection_string("other") == (
        "jdbc:mysql://db.example.internal:3306/other"
    )
    assert my.driver == "com.mysql.cj.jdbc.Driver"

    pg = DbSecret(engine="postgresql", host="h")  # default port
    assert pg.connection_string("s") == "jdbc:postgresql://h:5432/s"
    assert pg.driver == "org.postgresql.Driver"

    # h2 honors schema/dbname like the other engines (r12 ADVICE fix:
    # it used to silently ignore them and always bind the host-named
    # in-memory db)
    h2 = DbSecret(engine="h2", host="hostdb")
    assert h2.connection_string() == "jdbc:h2:mem:hostdb;DB_CLOSE_DELAY=-1"
    assert h2.connection_string("s") == (
        "jdbc:h2:mem:hostdb_s;DB_CLOSE_DELAY=-1"
    )
    h2db = DbSecret(engine="h2", host="hostdb", dbname="agg")
    assert h2db.connection_string() == (
        "jdbc:h2:mem:hostdb_agg;DB_CLOSE_DELAY=-1"
    )

    with pytest.raises(ValueError, match="Unhandled DB engine"):
        DbSecret(engine="oracle", host="h")


def test_db_secret_resolution_channels(tmp_path):
    """The resolver hook accepts dict / JSON file / env / callable and
    normalizes them all to the same secret."""
    import json

    from dig_aggregator_core_spark.sources.jdbcio import DbSecret

    d = {"engine": "mysql", "host": "h", "port": 3307,
         "username": "u", "password": "p", "dbname": "db"}
    via_dict = DbSecret.resolve(d)

    p = tmp_path / "secret.json"
    p.write_text(json.dumps(d))
    via_file = DbSecret.resolve(str(p))

    env = {"DB_ENGINE": "mysql", "DB_HOST": "h", "DB_PORT": "3307",
           "DB_USERNAME": "u", "DB_PASSWORD": "p", "DB_DBNAME": "db"}
    via_env = DbSecret.from_env(env=env)

    via_callable = DbSecret.resolve(lambda: d)  # the secrets-manager hook

    for s in (via_dict, via_file, via_env, via_callable):
        assert s.connection_string() == "jdbc:mysql://h:3307/db"
        assert (s.username, s.password) == ("u", "p")

    with pytest.raises(TypeError):
        DbSecret.resolve(42)


def test_ledger_from_secret_end_to_end(spark, tmp_path):
    """A secret-shaped config builds a WORKING ledger (the in-sandbox
    engine is derby, playing the role H2 plays for the reference's
    tests, Db.scala:21-24): migrate -> insert -> read -> delete."""
    secret = {"engine": "derby", "host": scratch_db("secretdb")}
    ledger = JdbcRunsLedger.from_secret(spark, secret, "test", "M")
    assert ledger.driver == "org.apache.derby.jdbc.EmbeddedDriver"
    ledger.migrate()
    try:
        ledger.insert("S", "o", [inp("i1")])
        assert [(r.input, r.output) for r in ledger.all()] == [("i1", "o")]
        assert ledger.delete("S", "o") == 1
    finally:
        ledger.drop()
