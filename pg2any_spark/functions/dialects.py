"""Destination SQL dialects: byte-parity rendering layer.

Re-expresses the reference's dialect surface (quoting, literal
rendering, statement shapes) so a user can obtain the exact SQL text
the reference would emit. Behavior parity sources:

- quoting & literals: reference ``destinations/dialects/ansi.rs:10-73``,
  ``mysql.rs:8-69``, ``sqlserver.rs:8-67``, ``sqlite.rs:9-33``,
  ``kafka.rs:9-28``
- statement shapes: ``sql_renderer.rs:148-177`` (INSERT),
  ``205-234`` (UPDATE), ``263-289`` (DELETE), ``300-320`` (TRUNCATE)
- WHERE builder: ``sql_renderer.rs:323-377``

The renderers operate on plain Python values — they run driver-side
when composing statements for a JDBC statement sink. The distributed
hot path never round-trips through SQL text (apply_changes MERGEs
structurally); this module exists for output parity and for statement
sinks. Values follow the wire model: ``None`` = NULL, ``str`` = Text,
``bytes`` = Binary; booleans arrive as text ``t``/``f`` and render as
``1``/``0``.
"""

from __future__ import annotations

from dataclasses import dataclass


class ReplicaIdentityError(ValueError):
    pass


Value = None | str | bytes
Row = list[tuple[str, Value]]  # ordered (column, value) pairs


@dataclass(frozen=True)
class _Dialect:
    quote_open: str
    quote_close: str
    hex_prefix: str  # "X'" or "0x"
    hex_suffix: str  # "'" or ""
    escape_backslash: bool
    keep_schema: bool
    truncate_verb: str | None  # None = no truncate statement (Kafka)

    def quote_identifier(self, ident: str) -> str:
        body = ident.replace(self.quote_close, self.quote_close * 2)
        return f"{self.quote_open}{body}{self.quote_close}"

    def qualify_table(self, schema: str, table: str) -> str:
        if not self.keep_schema:
            return self.quote_identifier(table)
        return f"{self.quote_identifier(schema)}.{self.quote_identifier(table)}"

    def render_hex(self, data: bytes) -> str:
        return f"{self.hex_prefix}{data.hex()}{self.hex_suffix}"

    def render_value(self, value: Value) -> str:
        if value is None:
            return "NULL"
        if isinstance(value, bytes):
            return self.render_hex(value)
        if value == "t":
            return "1"
        if value == "f":
            return "0"
        s = value.replace("'", "''")
        if self.escape_backslash:
            s = s.replace("\\", "\\\\")
        return f"'{s}'"

    # -- statement shapes ---------------------------------------------------

    def render_insert(self, schema: str, table: str, new_data: Row) -> str:
        cols = ", ".join(self.quote_identifier(c) for c, _ in new_data)
        vals = ", ".join(self.render_value(v) for _, v in new_data)
        return f"INSERT INTO {self.qualify_table(schema, table)} ({cols}) VALUES ({vals});"

    def where_clause(
        self,
        replica_identity: str,
        key_columns: list[str],
        old_data: Row | None,
        new_data: Row | None,
    ) -> str:
        if replica_identity in ("default", "index"):
            if not key_columns:
                raise ReplicaIdentityError(
                    "No key columns found for UPDATE/DELETE with DEFAULT/INDEX replica identity"
                )
            data = dict(old_data if old_data is not None else (new_data or []))
            parts = []
            for col in key_columns:
                if col not in data:
                    raise ReplicaIdentityError(f"Key column {col} not found")
                parts.append(
                    f"{self.quote_identifier(col)} = {self.render_value(data[col])}"
                )
            return " AND ".join(parts)
        if replica_identity == "full":
            if old_data is None:
                raise ReplicaIdentityError("FULL replica identity requires old data")
            parts = []
            for col, val in old_data:
                q = self.quote_identifier(col)
                parts.append(f"{q} IS NULL" if val is None else f"{q} = {self.render_value(val)}")
            return " AND ".join(parts)
        raise ReplicaIdentityError(
            "Cannot generate WHERE clause with NOTHING replica identity"
        )

    def render_update(
        self,
        schema: str,
        table: str,
        new_data: Row,
        old_data: Row | None,
        replica_identity: str = "default",
        key_columns: list[str] | None = None,
    ) -> str:
        sets = ", ".join(
            f"{self.quote_identifier(c)} = {self.render_value(v)}" for c, v in new_data
        )
        where = self.where_clause(replica_identity, key_columns or [], old_data, new_data)
        return f"UPDATE {self.qualify_table(schema, table)} SET {sets} WHERE {where};"

    def render_delete(
        self,
        schema: str,
        table: str,
        old_data: Row,
        replica_identity: str = "default",
        key_columns: list[str] | None = None,
    ) -> str:
        where = self.where_clause(replica_identity, key_columns or [], old_data, None)
        return f"DELETE FROM {self.qualify_table(schema, table)} WHERE {where};"

    def render_truncate(self, tables: list[str]) -> str:
        """Multi-table truncate; ``schema.table`` specs split like the
        reference (default schema ``public``)."""
        stmts = []
        for spec in tables:
            if "." in spec and spec.count(".") == 1:
                schema, table = spec.split(".", 1)
            else:
                schema, table = "public", spec
            if self.truncate_verb is None:
                continue
            if self.truncate_verb == "DELETE FROM":
                stmts.append(f"DELETE FROM {self.quote_identifier(table)};")
            else:
                stmts.append(f"TRUNCATE TABLE {self.qualify_table(schema, table)};")
        return "\n".join(stmts)


AnsiDialect = _Dialect('"', '"', "X'", "'", False, True, "TRUNCATE TABLE")
MySqlDialect = _Dialect("`", "`", "X'", "'", True, True, "TRUNCATE TABLE")
SqlServerDialect = _Dialect("[", "]", "0x", "", False, True, "TRUNCATE TABLE")
SqliteDialect = _Dialect('"', '"', "X'", "'", False, False, "DELETE FROM")
KafkaDialect = _Dialect('"', '"', "X'", "'", False, False, None)

DIALECTS = {
    "ansi": AnsiDialect,
    "mysql": MySqlDialect,
    "sqlserver": SqlServerDialect,
    "sqlite": SqliteDialect,
    "kafka": KafkaDialect,
}


def parse_schema_mapping(spec: str) -> dict[str, str]:
    """Parse ``CDC_SCHEMA_MAPPING`` format ``source:dest,source2:dest2``
    (reference ``env.rs:180-208``)."""
    out: dict[str, str] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" not in part:
            raise ValueError(f"invalid schema mapping entry: {part!r}")
        src, dst = part.split(":", 1)
        out[src.strip()] = dst.strip()
    return out
