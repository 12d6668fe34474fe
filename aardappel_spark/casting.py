"""Late-bound value conversion: raw JSON fragments -> destination types.

Behavioral spec: the reference's ConvertToYDBValue type table
(/root/reference/internal/dst_table/gen_query.go:122-293) and SURVEY.md §1.3.
Wire values arrive as STRINGS (the literal JSON token text, produced by
parse.py's ``from_json``): numbers as their digits, YDB ``String`` (bytes)
as base64, ``Timestamp`` as a fixed micros layout, ``null`` as SQL NULL.

Key hazards handled:
  * Uint64 -> DECIMAL(20,0)  — LongType cannot hold 2**64-1
    (gen_query_test.go:59 exercises exactly that value);
  * YDB String (bytes) -> unbase64 -> BINARY (gen_query.go:253-262);
  * Timestamp fixed layout 'yyyy-MM-dd\\'T\\'HH:mm:ss[.SSSSSS]Z' in UTC
    (gen_query.go:218-228);
  * Date = uint32 days since epoch (gen_query.go:212-217);
  * unknown destination column -> hard error (gen_query.go:323-325);
  * PK arity mismatch -> hard error (gen_query.go:295-300).

All conversions are built-in column expressions — codegen-friendly,
no Python row work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# YDB logical type names (the engine's destination-schema vocabulary).
_NUMERIC = {
    "Int8": "tinyint",
    "Int16": "smallint",
    "Int32": "int",
    "Int64": "bigint",
    # unsigned: widen one step (SURVEY.md §1.3)
    "Uint8": "smallint",
    "Uint16": "int",
    "Uint32": "bigint",
    "Float": "float",
    "Double": "double",
}

TIMESTAMP_FMT = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"


def cast_fragment(col: Column, ydb_type: str) -> Column:
    """Cast one raw JSON-fragment string column to its destination type."""
    t = ydb_type
    # Optional<T> unwraps recursively (gen_query.go:124-143); nullability is
    # native in Spark so only the inner type matters.
    while t.startswith("Optional<") and t.endswith(">"):
        t = t[len("Optional<") : -1]

    if t in _NUMERIC:
        return col.cast(_NUMERIC[t])
    if t == "Bool":
        return col.cast("boolean")
    if t == "Uint64":
        return col.cast("decimal(20,0)")
    if t == "Date":
        return F.date_add(F.lit("1970-01-01").cast("date"), col.cast("int"))
    if t == "Timestamp":
        return F.to_timestamp(col, TIMESTAMP_FMT)
    if t == "Interval":
        return col.cast("long")  # microseconds
    if t == "String":
        return F.unbase64(col)
    if t in ("Utf8", "Json", "JSON", "Yson", "YSON", "Uuid", "UUID",
             "TzDate", "TzDatetime", "TzTimestamp"):
        return col.cast("string")
    raise ValueError(f"ConvertToValue: unsupported type: {ydb_type}")


class TableMeta:
    """Destination table metadata: ordered PK + column->YDB-type map.

    Mirrors TableMetaInfo (dst_table.go:20-24): schema discovered once,
    PK order is positional against the wire ``key[]`` array.
    """

    def __init__(self, name: str, primary_key: list[str], columns: dict[str, str]):
        self.name = name
        self.primary_key = list(primary_key)
        self.columns = dict(columns)
        for pk in self.primary_key:
            if pk not in self.columns:
                raise ValueError(f"primary key column {pk!r} not in schema")

    @property
    def value_columns(self) -> list[str]:
        return [c for c in self.columns if c not in self.primary_key]

    @classmethod
    def from_struct(cls, name: str, primary_key: list[str], schema: StructType) -> "TableMeta":
        """S6 schema discovery: derive the YDB-typed meta from a live
        Spark schema (the reference's DescribeTable-at-startup,
        dst_table.go:49-83 — here the destination table's own schema is
        the source of truth; PK order still comes from config)."""
        inverse = {
            "tinyint": "Int8",
            "smallint": "Int16",
            "int": "Int32",
            "bigint": "Int64",
            "float": "Float",
            "double": "Double",
            "boolean": "Bool",
            "date": "Date",
            "timestamp": "Timestamp",
            "timestamp_ntz": "Timestamp",
            "binary": "String",
            "string": "Utf8",
            "decimal(20,0)": "Uint64",
        }
        cols: dict[str, str] = {}
        for f in schema.fields:
            t = inverse.get(f.dataType.simpleString())
            if t is None:
                raise ValueError(
                    f"from_struct: unsupported destination type {f.dataType.simpleString()} for {f.name}"
                )
            cols[f.name] = t if (not f.nullable or f.name in primary_key) else f"Optional<{t}>"
        return cls(name, primary_key, cols)


def typed_mutations(compacted: DataFrame, meta: TableMeta) -> DataFrame:
    """Compacted mutations (compact.py output) -> typed wide rows.

    Output: one row per key with op + typed PK columns + typed value
    columns + per-column presence map retained as ``_present`` (absent
    column != null column — SURVEY.md §7 hard part #2).

    PK arity is checked at runtime (raise, gen_query.go:295-300); unknown
    columns are detected set-wise and raised (gen_query.go:323-325).
    """
    pk_n = len(meta.primary_key)
    known = F.array(*[F.lit(c) for c in meta.columns])
    unknown = F.array_except(F.map_keys("columns"), known)

    # Both validations are folded into the always-selected ``op`` column so
    # Catalyst's column pruning can never optimize the raise_error away.
    checked_op = (
        F.when(
            F.size("key") != pk_n,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"CheckPrimaryKeySize: len of primary key ({pk_n}) "
                        "is not equal to len of values: "
                    ),
                    F.col("key_json"),
                )
            ),
        )
        .when(
            F.size(unknown) > 0,
            F.raise_error(
                F.concat(
                    F.lit("column is not in dst table scheme: "),
                    F.array_join(unknown, ","),
                )
            ),
        )
        .otherwise(F.col("op"))
        .alias("op")
    )

    cols: list[Column] = [
        F.col("table_id"),
        F.col("key_json"),
        checked_op,
        F.col("step"),
        F.col("tx_id"),
        F.col("columns").alias("_columns"),
    ]
    for i, pk in enumerate(meta.primary_key):
        # F.get: a short key[] yields NULL here so the arity raise_error in
        # checked_op reports cleanly instead of an ANSI OOB crash
        cols.append(cast_fragment(F.get("key", i), meta.columns[pk]).alias(pk))
    for c in meta.value_columns:
        cols.append(
            cast_fragment(F.col("columns").getItem(c), meta.columns[c]).alias(c)
        )
    return compacted.select(*cols)
