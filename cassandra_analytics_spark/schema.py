"""CQL DDL → Spark schema translation (reference operators C1/C2).

The reference parses ``CREATE TABLE`` (+ ``CREATE TYPE`` UDTs) with the
real Cassandra grammar (``cassandra-four-zero-types/.../reader/
SchemaBuilder.java:161-183``) and converts the resulting ``CqlTable`` to a
``StructType`` with per-field role metadata (``data/DataLayer.java:95-129``,
converter table in ``cassandra-analytics-spark-converter/.../types/``).

This module re-implements both halves natively: a small recursive-descent
parser for the CQL we need, and the SURVEY §1.3 type-mapping table.
Counter and duration columns are rejected exactly like the reference
(``AbstractStreamScanner.java:84-91``, ``SparkDuration.java`` →
NotImplementedFeatures).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

DEFAULT_DECIMAL_PRECISION = 38  # BigNumberConfig defaults (BigNumberConfig.java)
DEFAULT_DECIMAL_SCALE = 19


@dataclass(frozen=True)
class BigNumberConfig:
    """Per-read decimal sizing knob (reference
    ``cassandra-analytics-common/.../bridge/BigNumberConfig.java``): CQL
    ``decimal`` maps to ``DecimalType(big_decimal_precision,
    big_decimal_scale)`` and ``varint`` to
    ``DecimalType(big_integer_precision, big_integer_scale)``. The
    defaults are the reference's 38/19 (note Spark's own SQL default is
    38/18 — the reference deliberately sizes one digit wider in scale)."""

    big_decimal_precision: int = DEFAULT_DECIMAL_PRECISION
    big_decimal_scale: int = DEFAULT_DECIMAL_SCALE
    big_integer_precision: int = DEFAULT_DECIMAL_PRECISION
    big_integer_scale: int = 0

    def __post_init__(self) -> None:
        for p in (self.big_decimal_precision, self.big_integer_precision):
            if not 1 <= p <= 38:
                raise ValueError(f"decimal precision out of range [1,38]: {p}")
        if not 0 <= self.big_decimal_scale <= self.big_decimal_precision:
            raise ValueError("big_decimal_scale must be in [0, precision]")
        if not 0 <= self.big_integer_scale <= self.big_integer_precision:
            raise ValueError("big_integer_scale must be in [0, precision]")


DEFAULT_BIG_NUMBER_CONFIG = BigNumberConfig()

PARTITION_KEY = "partition_key"
CLUSTERING = "clustering"
STATIC = "static"
REGULAR = "regular"


class UnsupportedCqlType(ValueError):
    """Raised for counter/duration, matching the reference's hard reject."""


@dataclass
class CqlColumn:
    name: str
    cql_type: str
    kind: str = REGULAR
    position: int = 0  # ordinal within its kind (pk index / ck index)
    order: str = "ASC"  # clustering sort order


@dataclass
class CqlTable:
    keyspace: str
    name: str
    columns: list[CqlColumn] = field(default_factory=list)

    @property
    def partition_keys(self) -> list[CqlColumn]:
        return sorted(
            (c for c in self.columns if c.kind == PARTITION_KEY),
            key=lambda c: c.position,
        )

    @property
    def clustering_keys(self) -> list[CqlColumn]:
        return sorted(
            (c for c in self.columns if c.kind == CLUSTERING),
            key=lambda c: c.position,
        )

    @property
    def static_columns(self) -> list[CqlColumn]:
        return [c for c in self.columns if c.kind == STATIC]


# --------------------------------------------------------------------------
# CQL type expression parser
# --------------------------------------------------------------------------

_TYPE_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|<|>|,|\(|\)|'[^']*'|\"[^\"]*\"")


def _tokenize_type(s: str) -> list[str]:
    return _TYPE_TOKEN.findall(s)


class _TypeParser:
    def __init__(
        self,
        tokens: list[str],
        udts: dict[str, dict[str, str]],
        big_numbers: BigNumberConfig = DEFAULT_BIG_NUMBER_CONFIG,
        expanding: frozenset[str] = frozenset(),
    ):
        self.tokens = tokens
        self.pos = 0
        self.udts = udts
        self.big_numbers = big_numbers
        # UDT names currently being expanded up the call stack: a UDT that
        # references itself (directly or through another UDT) has no finite
        # StructType, and Cassandra rejects such DDL — fail with a clear
        # error instead of RecursionError (round-8 continuation probe)
        self.expanding = expanding

    def peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def take(self) -> str:
        # a truncated expression ("list<int", "frozen<", "") must fail as
        # a malformed-type ValueError, not an IndexError from running off
        # the token list (round-8 continuation probe)
        if self.pos >= len(self.tokens):
            raise ValueError(
                f"unexpected end of CQL type expression (tokens: {self.tokens!r})"
            )
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.take()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r}")

    def parse(self) -> T.DataType:
        name = self.take().lower()
        if name == "frozen":
            # frozenness only affects serialization (SparkFrozen.java)
            self.expect("<")
            inner = self.parse()
            self.expect(">")
            return inner
        if name == "list" or name == "set":
            self.expect("<")
            elem = self.parse()
            self.expect(">")
            return T.ArrayType(elem)  # set→array loses set-ness (SparkSet.java)
        if name == "map":
            self.expect("<")
            key = self.parse()
            self.expect(",")
            val = self.parse()
            self.expect(">")
            return T.MapType(key, val)
        if name == "tuple":
            self.expect("<")
            fields = [self.parse()]
            while self.peek() == ",":
                self.take()
                fields.append(self.parse())
            self.expect(">")
            # tuple fields named "0","1",… (SparkTuple.java:49-54)
            return T.StructType(
                [T.StructField(str(i), f, True) for i, f in enumerate(fields)]
            )
        if name in self.udts:
            if name in self.expanding:
                raise ValueError(
                    f"recursive UDT reference: type {name!r} refers to itself "
                    f"(expansion chain: {sorted(self.expanding)}); Cassandra "
                    "rejects recursive UDT definitions"
                )
            inner = self.expanding | {name}
            return T.StructType(
                [
                    T.StructField(
                        fn,
                        parse_cql_type(ft, self.udts, self.big_numbers, _expanding=inner),
                        True,
                    )
                    for fn, ft in self.udts[name].items()
                ]
            )
        return _native_type(name, self.big_numbers)


def _native_type(
    name: str, big_numbers: BigNumberConfig = DEFAULT_BIG_NUMBER_CONFIG
) -> T.DataType:
    # SURVEY §1.3 table; converter classes cited per row.
    mapping: dict[str, T.DataType] = {
        "ascii": T.StringType(),  # StringFeatures.java:63-65
        "text": T.StringType(),
        "varchar": T.StringType(),
        "bigint": T.LongType(),  # LongFeatures.java:32-34
        "time": T.LongType(),  # nanos-since-midnight (SparkTime.java)
        "timestamp": T.TimestampType(),  # SparkTimestamp.java:40-62
        "int": T.IntegerType(),  # IntFeatures.java:32-34
        "smallint": T.ShortType(),  # SparkSmallInt.java:41
        "tinyint": T.ByteType(),  # SparkTinyInt.java:41
        "boolean": T.BooleanType(),  # SparkBoolean.java:40
        "double": T.DoubleType(),  # SparkDouble.java:41
        "float": T.FloatType(),  # SparkFloat.java:41
        "blob": T.BinaryType(),  # BinaryFeatures.java:41-43
        "inet": T.BinaryType(),  # SparkInet.java:39-56
        "date": T.DateType(),  # SparkDate.java:42-84
        "uuid": T.StringType(),  # UUIDFeatures.java:24
        "timeuuid": T.StringType(),
        "decimal": T.DecimalType(
            big_numbers.big_decimal_precision, big_numbers.big_decimal_scale
        ),  # SparkDecimal.java:43, sized by BigNumberConfig
        "varint": T.DecimalType(
            big_numbers.big_integer_precision, big_numbers.big_integer_scale
        ),  # SparkVarInt.java:44
        "empty": T.NullType(),  # converter/types/Empty.java
    }
    if name in ("counter", "duration"):
        # counter: AbstractStreamScanner.java:84-91; duration: SparkDuration.java
        raise UnsupportedCqlType(f"CQL type {name!r} is not supported")
    if name not in mapping:
        raise ValueError(f"unknown CQL type {name!r}")
    return mapping[name]


def parse_cql_type(
    s: str,
    udts: dict[str, dict[str, str]] | None = None,
    big_numbers: BigNumberConfig = DEFAULT_BIG_NUMBER_CONFIG,
    _expanding: frozenset[str] = frozenset(),
) -> T.DataType:
    """Parse a CQL type expression (possibly nested) to a Spark DataType."""
    parser = _TypeParser(_tokenize_type(s), udts or {}, big_numbers, _expanding)
    result = parser.parse()
    if parser.peek() is not None:
        raise ValueError(f"trailing tokens in type {s!r}")
    return result


# --------------------------------------------------------------------------
# CREATE TABLE / CREATE TYPE parsing
# --------------------------------------------------------------------------

_CREATE_TYPE = re.compile(
    r"CREATE\s+TYPE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?:(?P<ks>\"[^\"]+\"|\w+)\.)?(?P<name>\"[^\"]+\"|\w+)\s*\((?P<body>.*?)\)\s*;?",
    re.IGNORECASE | re.DOTALL,
)

_CREATE_TABLE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?:(?P<ks>\"[^\"]+\"|\w+)\.)?(?P<name>\"[^\"]+\"|\w+)\s*\(",
    re.IGNORECASE,
)

_CLUSTERING_ORDER = re.compile(
    r"CLUSTERING\s+ORDER\s+BY\s*\((?P<body>[^)]*)\)", re.IGNORECASE
)


def _unquote(ident: str) -> str:
    # case-preserving quoted identifiers (EndToEndTests.java:2408-2537)
    if ident.startswith('"') and ident.endswith('"'):
        return ident[1:-1]
    return ident.lower()


def _split_top_level(s: str) -> list[str]:
    """Split on commas not inside <>, (), or quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "<(":
            depth += 1
            cur.append(ch)
        elif ch in ">)":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def parse_udts(ddl: str) -> dict[str, dict[str, str]]:
    """Collect CREATE TYPE statements → {udt_name: {field: cql_type}}."""
    udts: dict[str, dict[str, str]] = {}
    for m in _CREATE_TYPE.finditer(ddl):
        fields: dict[str, str] = {}
        for part in _split_top_level(m.group("body")):
            toks = part.split(None, 1)
            if len(toks) == 2:
                fields[_unquote(toks[0])] = toks[1].strip()
        udts[_unquote(m.group("name"))] = fields
    return udts


def _extract_table_body(ddl: str, start: int) -> tuple[str, str]:
    """Return (column body, trailing clause) of the CREATE TABLE at
    ``start`` (index just past the opening paren)."""
    depth, i = 1, start
    while i < len(ddl) and depth:
        if ddl[i] == "(":
            depth += 1
        elif ddl[i] == ")":
            depth -= 1
        i += 1
    if depth:
        # running off the end used to return a silently-truncated body,
        # surfacing later as a cryptic "substring not found" from the
        # PRIMARY KEY clause parse (round-8 continuation probe)
        raise ValueError(
            "unterminated CREATE TABLE statement (unbalanced parentheses)"
        )
    return ddl[start : i - 1], ddl[i:]


def parse_create_table(ddl: str) -> CqlTable:
    """Parse a CREATE TABLE statement (plus any CREATE TYPEs in the same
    DDL string) into a :class:`CqlTable`.

    Handles: compound partition keys ``PRIMARY KEY ((a, b), c, d)``, inline
    primary keys, ``STATIC`` columns, ``CLUSTERING ORDER BY``, quoted
    identifiers, nested frozen/collection/UDT/tuple types — the shapes the
    reference's DDL cleaner handles (``utils/CqlUtils.java:121-227``).
    """
    udts = parse_udts(ddl)
    m = _CREATE_TABLE.search(ddl)
    if not m:
        raise ValueError("no CREATE TABLE statement found")
    keyspace = _unquote(m.group("ks")) if m.group("ks") else ""
    table_name = _unquote(m.group("name"))
    body, trailer = _extract_table_body(ddl, m.end())

    pk_names: list[str] = []
    ck_names: list[str] = []
    columns: list[CqlColumn] = []

    saw_pk_clause = False
    for part in _split_top_level(body):
        upper = part.upper()
        if upper.startswith("PRIMARY KEY"):
            # Cassandra rejects DDL with several PRIMARY KEY clauses; the
            # old code let the LAST one silently win (round-8 probe)
            if saw_pk_clause or pk_names:
                raise ValueError(
                    "multiple PRIMARY KEY definitions in CREATE TABLE"
                )
            saw_pk_clause = True
            if "(" not in part or ")" not in part:
                raise ValueError(
                    f"malformed PRIMARY KEY clause {part!r} (unbalanced "
                    "parentheses — is the CREATE TABLE statement truncated?)"
                )
            inner = part[part.index("(") + 1 : part.rindex(")")]
            keys = _split_top_level(inner)
            if keys and keys[0].startswith("("):
                pk_names = [
                    _unquote(k.strip()) for k in _split_top_level(keys[0][1:-1])
                ]
                ck_names = [_unquote(k.strip()) for k in keys[1:]]
            else:
                pk_names = [_unquote(keys[0].strip())]
                ck_names = [_unquote(k.strip()) for k in keys[1:]]
            continue
        toks = part.split(None, 1)
        if len(toks) != 2:
            continue
        name = _unquote(toks[0])
        rest = toks[1].strip()
        rest_upper = rest.upper()
        is_static = rest_upper.endswith(" STATIC")
        if is_static:
            rest = rest[: -len(" STATIC")].strip()
        inline_pk = rest_upper.endswith(" PRIMARY KEY")
        if inline_pk:
            if saw_pk_clause or pk_names:
                raise ValueError(
                    "multiple PRIMARY KEY definitions in CREATE TABLE"
                )
            rest = rest[: -len(" PRIMARY KEY")].strip()
            pk_names = [name]
        columns.append(
            CqlColumn(
                name=name,
                cql_type=rest,
                kind=STATIC if is_static else REGULAR,
            )
        )

    for i, pk in enumerate(pk_names):
        for col in columns:
            if col.name == pk:
                col.kind = PARTITION_KEY
                col.position = i
    for i, ck in enumerate(ck_names):
        for col in columns:
            if col.name == ck:
                col.kind = CLUSTERING
                col.position = i

    orders = _CLUSTERING_ORDER.search(trailer)
    if orders:
        for part in _split_top_level(orders.group("body")):
            toks = part.split()
            if len(toks) >= 2:
                cname = _unquote(toks[0])
                for col in columns:
                    if col.name == cname and col.kind == CLUSTERING:
                        col.order = toks[1].upper()

    if not pk_names:
        raise ValueError("CREATE TABLE has no PRIMARY KEY")
    # A PRIMARY KEY clause naming a column that does not exist (typo'd
    # DDL) would otherwise produce a CqlTable whose partition_keys list
    # is silently EMPTY — callers then fail far downstream with a
    # confusing missing-column error (round-7 hostile pass). Cassandra
    # itself rejects such DDL at parse time; match it.
    col_names = {c.name for c in columns}
    unknown = [k for k in (*pk_names, *ck_names) if k not in col_names]
    if unknown:
        raise ValueError(
            f"PRIMARY KEY references undefined column(s): {unknown} "
            f"(defined: {sorted(col_names)})"
        )
    # Cassandra rejects both of these at parse time; silently accepting
    # them produced (a) a CqlTable with two same-named columns BOTH marked
    # partition_key, (b) a column named in the partition-key list AND the
    # clustering list, where the clustering loop overwrote the kind and
    # left partition_keys EMPTY — the silent-downstream-failure class the
    # round-7 typo check was added for (round-8 continuation probe).
    if len(col_names) != len(columns):
        from collections import Counter

        dupes = [n for n, c in Counter(c.name for c in columns).items() if c > 1]
        raise ValueError(f"duplicate column definition(s) in CREATE TABLE: {dupes}")
    key_seq = [*pk_names, *ck_names]
    if len(set(key_seq)) != len(key_seq):
        dupes = sorted({k for k in key_seq if key_seq.count(k) > 1})
        raise ValueError(
            f"column(s) listed more than once in PRIMARY KEY: {dupes}"
        )
    return CqlTable(keyspace=keyspace, name=table_name, columns=columns)


# --------------------------------------------------------------------------
# CqlTable → StructType (C2: DataLayer.structType, DataLayer.java:95-129)
# --------------------------------------------------------------------------


def to_struct_type(
    table: CqlTable,
    big_numbers: BigNumberConfig = DEFAULT_BIG_NUMBER_CONFIG,
    udts: dict | None = None,
) -> T.StructType:
    """Ordered StructType with role metadata per field, mirroring
    ``DataLayer.fieldMetaData`` (``DataLayer.java:118-129``). The
    ``big_numbers`` knob sizes decimal/varint per read, as the
    reference's per-job ``BigNumberConfig`` option does.

    ``udts`` maps user-defined type names to their field dicts (the
    output of :func:`parse_udts`): parse_create_table keeps column types
    as RAW CQL strings, so a table whose DDL references a UDT cannot be
    converted without the definitions — pass them, or use
    :func:`schema_for_ddl`, which extracts both from one DDL string."""
    fields = []
    for col in table.columns:
        dtype = parse_cql_type(col.cql_type, udts or {}, big_numbers)
        meta = {
            "kind": col.kind,
            "position": col.position,
            "cqlType": col.cql_type,
        }
        if col.kind == CLUSTERING:
            meta["order"] = col.order
        nullable = col.kind not in (PARTITION_KEY, CLUSTERING)
        fields.append(T.StructField(col.name, dtype, nullable, metadata=meta))
    return T.StructType(fields)


def schema_for_ddl(
    ddl: str,
    big_numbers: BigNumberConfig = DEFAULT_BIG_NUMBER_CONFIG,
) -> T.StructType:
    """One-call C1+C2: DDL string → StructType with role metadata."""
    # resolve UDT references using the full DDL context
    return to_struct_type(
        parse_create_table(ddl), big_numbers, udts=parse_udts(ddl)
    )
