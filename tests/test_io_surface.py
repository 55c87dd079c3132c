"""Phase-4 I/O surface: secrets (S7), JDBC connections (S4/S5),
transactions (K4), catalog DDL (K5), error-audit sink (K8)."""

from __future__ import annotations

import sqlite3

import pytest

from etl_procedure_codes_crawler_spark.sinks.errors import (
    error_row,
    parse_run_spec,
    register_error,
)
from etl_procedure_codes_crawler_spark.sinks.jdbc import (
    create_table,
    execute_transaction,
)
from etl_procedure_codes_crawler_spark.sources.jdbc import (
    JdbcConnection,
    connection_from_secret,
)
from etl_procedure_codes_crawler_spark.sources.secrets import (
    DictSecretProvider,
    EnvSecretProvider,
    mask_secret_id,
)


class TestSecrets:
    def test_dict_provider_roundtrip(self):
        provider = DictSecretProvider({"db/creds": '{"user": "u"}'})
        assert provider.get_secret("db/creds") == '{"user": "u"}'

    def test_missing_secret_is_masked_in_error(self):
        provider = DictSecretProvider({})
        with pytest.raises(KeyError) as exc:
            provider.get_secret("prod/super-secret-name")
        assert "super-secret-name" not in str(exc.value)
        assert "***" in str(exc.value)

    def test_env_provider(self, monkeypatch):
        monkeypatch.setenv("MY_SECRET", "payload")
        assert EnvSecretProvider().get_secret("MY_SECRET") == "payload"

    def test_mask_keeps_first_half(self):
        # reference masking: secret_id[:len//2] + '***' (postgres.py:10)
        assert mask_secret_id("abcdef") == "abc***"
        assert mask_secret_id("") == "***"


class TestJdbcConnection:
    def test_url_and_options(self):
        conn = JdbcConnection(
            host="db.example", database="app", user="u", password="p"
        )
        assert conn.url == "jdbc:postgresql://db.example:5432/app"
        opts = conn.options()
        assert opts["driver"] == "org.postgresql.Driver"
        assert opts["user"] == "u" and opts["password"] == "p"

    def test_connection_from_secret_rds_convention(self):
        provider = DictSecretProvider(
            {
                "rds": '{"host": "h", "port": 5433, "dbname": "d",'
                ' "username": "u", "password": "p"}'
            }
        )
        conn = connection_from_secret(provider, "rds")
        assert conn.url == "jdbc:postgresql://h:5433/d"
        assert conn.user == "u"

    def test_connection_from_secret_overrides(self):
        provider = DictSecretProvider(
            {"rds": '{"host": "h", "dbname": "d", "user": "u", "password": "p"}'}
        )
        conn = connection_from_secret(provider, "rds", scheme="mysql", port=3306)
        assert conn.url == "jdbc:mysql://h:3306/d"


class TestExecuteTransaction:
    """K4 semantics against stdlib sqlite3 — same DB-API surface as
    psycopg2 (``utils/postgres.py:19-33``)."""

    def test_commit_on_success(self, tmp_path):
        db = str(tmp_path / "t.db")
        execute_transaction(
            lambda: sqlite3.connect(db),
            [
                "CREATE TABLE t (x INTEGER)",
                "INSERT INTO t VALUES (1)",
                "INSERT INTO t VALUES (2)",
            ],
        )
        with sqlite3.connect(db) as conn:
            assert conn.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 2

    def test_rollback_on_failure_is_atomic(self, tmp_path):
        db = str(tmp_path / "t.db")
        execute_transaction(
            lambda: sqlite3.connect(db), ["CREATE TABLE t (x INTEGER)"]
        )
        with pytest.raises(sqlite3.OperationalError):
            execute_transaction(
                lambda: sqlite3.connect(db),
                ["INSERT INTO t VALUES (1)", "INSERT INTO nonexistent VALUES (2)"],
            )
        with sqlite3.connect(db) as conn:
            # the successful INSERT must have been rolled back with the batch
            assert conn.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 0


class TestCatalogDdl:
    def test_create_table_and_describe(self, spark):
        create_table(
            spark, "ddl_smoke", {"id": "BIGINT", "name": "STRING"}
        )
        try:
            fields = {f.name for f in spark.table("ddl_smoke").schema.fields}
            assert fields == {"id", "name"}
            # idempotent under IF NOT EXISTS
            create_table(spark, "ddl_smoke", {"id": "BIGINT"})
        finally:
            spark.sql("DROP TABLE IF EXISTS ddl_smoke")


class TestErrorAudit:
    RUN_SPEC = '{"dag_id": "crawl", "task_id": "extract", "run_id": "r1"}'

    def test_parse_run_spec_json(self):
        assert parse_run_spec(self.RUN_SPEC)["dag_id"] == "crawl"

    def test_parse_run_spec_literal_eval_fallback(self):
        # Airflow-template style single-quoted payload (error_handler.py:15-19)
        spec = parse_run_spec("{'dag_id': 'crawl', 'task_id': 't', 'run_id': 'r'}")
        assert spec == {"dag_id": "crawl", "task_id": "t", "run_id": "r"}

    def test_parse_run_spec_rejects_non_mapping(self):
        with pytest.raises(ValueError):
            parse_run_spec("['not', 'a', 'dict']")

    def test_error_row_schema_and_nulls(self, spark):
        df = error_row(spark, '{"dag_id": "d"}', "boom")
        row = df.collect()[0]
        assert [f.name for f in df.schema.fields] == [
            "dag_id",
            "task_id",
            "run_id",
            "error",
        ]
        assert row.dag_id == "d" and row.task_id is None and row.error == "boom"

    def test_register_error_routes_to_sink(self, spark, tmp_path):
        out = str(tmp_path / "errors")
        register_error(
            spark,
            self.RUN_SPEC,
            "ValueError: bad page",
            sink=lambda df: df.write.mode("append").parquet(out),
        )
        written = spark.read.parquet(out).collect()
        assert len(written) == 1
        assert written[0].run_id == "r1"


class TestSqlTemplates:
    """S8: parameterized SQL replaces the reference's str.format
    interpolation (procedure_code.py:686-701)."""

    def test_named_parameter_binding(self, spark, sf_dir, tmp_path):
        from etl_procedure_codes_crawler_spark.sources.parquet import read_testdata
        from etl_procedure_codes_crawler_spark.sources.sqltemplate import (
            run_sql_template,
        )

        read_testdata(spark, sf_dir, "orders").createOrReplaceTempView("tpl_orders")
        try:
            sql_file = tmp_path / "codes.sql"
            sql_file.write_text(
                "SELECT o_orderkey FROM tpl_orders"
                " WHERE o_orderdate >= :logical_date AND o_totalprice > :floor"
            )
            out = run_sql_template(
                spark,
                str(sql_file),
                {"logical_date": "1999-01-01", "floor": 1000.0},
                from_file=True,
            )
            n = out.count()
            assert n > 0
            direct = spark.sql(
                "SELECT count(*) AS n FROM tpl_orders WHERE"
                " o_orderdate >= '1999-01-01' AND o_totalprice > 1000.0"
            ).collect()[0].n
            assert n == direct
        finally:
            spark.catalog.dropTempView("tpl_orders")

    def test_malicious_value_stays_a_value(self, spark):
        from etl_procedure_codes_crawler_spark.sources.sqltemplate import (
            run_sql_template,
        )

        # with .format this would change the query shape; as a bound
        # parameter it's just a string that matches nothing
        rows = run_sql_template(
            spark,
            "SELECT 1 AS x WHERE 'safe' = :v",
            {"v": "'); DROP TABLE t --"},
        ).collect()
        assert rows == []
