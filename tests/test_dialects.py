"""Golden-string parity with the reference's dialect unit tests
(reference ``destinations/dialects/{mysql,ansi,sqlserver,sqlite,kafka}.rs``
test modules and ``sql_renderer.rs:557-799`` round-trips)."""

from __future__ import annotations

import pytest

from pg2any_spark.functions.dialects import (
    AnsiDialect,
    KafkaDialect,
    MySqlDialect,
    ReplicaIdentityError,
    SqliteDialect,
    SqlServerDialect,
    parse_schema_mapping,
)


class TestQuoting:
    def test_mysql(self):
        assert MySqlDialect.quote_identifier("users") == "`users`"
        assert MySqlDialect.quote_identifier("back`tick") == "`back``tick`"
        assert MySqlDialect.quote_identifier("bra]cket") == "`bra]cket`"
        assert MySqlDialect.quote_identifier('double"quote') == '`double"quote`'

    def test_ansi(self):
        assert AnsiDialect.quote_identifier("users") == '"users"'
        assert AnsiDialect.quote_identifier('double"quote') == '"double""quote"'

    def test_sqlserver(self):
        assert SqlServerDialect.quote_identifier("users") == "[users]"
        assert SqlServerDialect.quote_identifier("bra]cket") == "[bra]]cket]"

    def test_qualify(self):
        assert MySqlDialect.qualify_table("public", "users") == "`public`.`users`"
        assert SqliteDialect.qualify_table("public", "users") == '"users"'  # schema dropped
        assert KafkaDialect.qualify_table("public", "users") == '"users"'


class TestValues:
    @pytest.mark.parametrize(
        "dialect", [MySqlDialect, AnsiDialect, SqlServerDialect, SqliteDialect]
    )
    def test_common(self, dialect):
        assert dialect.render_value(None) == "NULL"
        assert dialect.render_value("t") == "1"
        assert dialect.render_value("f") == "0"
        assert dialect.render_value("hello") == "'hello'"
        assert dialect.render_value("o'reilly") == "'o''reilly'"

    def test_backslash_mysql_only(self):
        assert MySqlDialect.render_value("back\\slash") == "'back\\\\slash'"
        assert AnsiDialect.render_value("back\\slash") == "'back\\slash'"

    def test_hex(self):
        assert MySqlDialect.render_value(b"\x00\xff\xab") == "X'00ffab'"
        assert SqlServerDialect.render_value(b"\xde\xad\xbe\xef") == "0xdeadbeef"
        assert AnsiDialect.render_hex(b"") == "X''"


class TestStatements:
    ROW = [("id", "1"), ("name", "o'reilly"), ("active", "t")]

    def test_insert(self):
        # wire values are text: "1" renders quoted, only t/f unquote
        assert MySqlDialect.render_insert("public", "t1", self.ROW) == (
            "INSERT INTO `public`.`t1` (`id`, `name`, `active`) VALUES ('1', 'o''reilly', 1);"
        )

    def test_update_default_identity(self):
        sql = MySqlDialect.render_update(
            "public", "t1", self.ROW, [("id", "1")], "default", ["id"]
        )
        assert sql == (
            "UPDATE `public`.`t1` SET `id` = '1', `name` = 'o''reilly', "
            "`active` = 1 WHERE `id` = '1';"
        )

    def test_delete_full_identity_with_null(self):
        sql = AnsiDialect.render_delete(
            "public", "t1", [("id", "7"), ("note", None)], "full", None
        )
        assert sql == 'DELETE FROM "public"."t1" WHERE "id" = \'7\' AND "note" IS NULL;'

    def test_nothing_identity_raises(self):
        with pytest.raises(ReplicaIdentityError):
            MySqlDialect.render_delete("public", "t1", [("id", "1")], "nothing", ["id"])

    def test_missing_keys_raises(self):
        with pytest.raises(ReplicaIdentityError):
            MySqlDialect.render_update("public", "t1", self.ROW, None, "default", [])

    def test_truncate(self):
        assert (
            MySqlDialect.render_truncate(["public.users"])
            == "TRUNCATE TABLE `public`.`users`;"
        )
        assert SqliteDialect.render_truncate(["public.users"]) == 'DELETE FROM "users";'
        assert KafkaDialect.render_truncate(["public.users"]) == ""
        # multi-table, default schema
        assert MySqlDialect.render_truncate(["users", "public.orders"]) == (
            "TRUNCATE TABLE `public`.`users`;\nTRUNCATE TABLE `public`.`orders`;"
        )


def test_schema_mapping():
    assert parse_schema_mapping("public:cdc_db, sales:analytics") == {
        "public": "cdc_db",
        "sales": "analytics",
    }
    with pytest.raises(ValueError):
        parse_schema_mapping("nocolon")
