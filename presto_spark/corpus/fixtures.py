"""Corpus fixture tables, registered as temp views.

Three sources, all public:

* ``datatype`` / ``workers`` / ``empty`` — transcribed verbatim from
  the reference's dataset definitions
  (presto-product-tests/src/main/resources/sql-tests/datasets/
  {datatype,workers,empty}.{ddl,data}); the corpus goldens were
  computed over exactly these rows, so the transcription is pinned
  against the reference files by
  tests/test_product_corpus.py::test_fixtures_match_reference_datasets
  whenever the reference tree is present.
* ``nation`` / ``region`` — the TPC-H specification's fixed dimension
  tables (25 nations / 5 regions with spec-fixed keys and names; the
  same at every scale factor, which is why the corpus goldens over
  them are reproducible).  Comments are synthetic — dbgen randomizes
  them — so replay policy routes any comment-ordered case to
  execute-only.
* ``tiny_*`` — the `tpch.tiny.<t>` spellings: the presto-tpch
  connector exposes TPC-H columns WITHOUT the `x_` prefixes
  (presto-tpch/src/main/java/com/facebook/presto/tpch/TpchMetadata.java),
  so `tiny_nation` has nationkey/name/regionkey/comment.  For fact
  tables the tiny views rename this engine's sf-dir parquet — row
  VALUES differ from airlift's generator (execute-only territory),
  but names and types line up.
* ``partsupp`` — schema-only (empty): the driver testdata ships no
  partsupp, and corpus cases over it are execute-only.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# (datatype.data rows, datatype.ddl schema — reference
# sql-tests/datasets/datatype.{ddl,data}; \N → None)
DATATYPE_ROWS = [
    (12, 12.25, "String1", "1999-01-08", "1999-01-08 02:05:06", True, "123.22", "12345678901234567890.0123456789"),
    (25, 55.52, "test", "1952-01-05", "1989-01-08 04:05:06", False, "321.21", "-12345678901234567890.0123456789"),
    (964, 0.245, "Again", "1936-02-08", "2005-01-09 04:05:06", False, "333.82", "98765432109876543210.9876543210"),
    (100, 12.25, "testing", "1949-07-08", "2002-01-07 01:05:06", True, "-393.22", "-98765432109876543210.9876543210"),
    (100, 99.8777, "AGAIN", "1987-04-09", "2010-01-02 04:03:06", True, "000.00", "00000000000000000000.0000000000"),
    (5252, 12.25, "sample", "1987-04-09", "2010-01-02 04:03:06", True, "123.00", "00000000000000000001.0000000000"),
    (100, 9.8777, "STRING1", "1923-04-08", "2010-01-02 05:09:06", True, "010.01", "00000000000000000002.0000000000"),
    (8996, 98.8777, "again", "1987-04-09", "2010-01-02 04:03:06", False, "-000.01", "99999999999999999999.9999999999"),
    (100, 12.8788, "string1", "1922-04-02", "2010-01-02 02:05:06", True, "999.99", "-99999999999999999999.9999999999"),
    (5748, 67.87, "sample", "1987-04-06", "2010-01-02 04:03:06", True, "-999.99", "00000000000000000000.0000000001"),
    (5748, 67.87, "Sample", "1987-04-06", "2010-01-02 04:03:06", True, "181.18", "-00000000000000000000.0000000001"),
    (5748, 67.87, "sample", "1987-04-06", "2010-01-02 04:03:06", True, "181.18", "12345678901234567890.0123456789"),
    (5748, 67.87, "sample", "1987-04-06", "2010-01-02 04:03:06", True, "181.18", "12345678901234567890.0123456789"),
    (5000, 67.87, "testing", None, "2010-01-02 04:03:06", None, None, None),
    (6000, None, None, "1987-04-06", None, True, None, None),
    (None, 98.52, None, None, None, True, "181.18", None),
]

# (workers.data rows, workers.ddl schema)
WORKERS_ROWS = [
    (None, None, None, None, None, 1, "Marketing", 4000),
    (2, "Ann", "Turner", "2000-05-28", 2, 2, "R&D", 5000),
    (3, "Martin", "Smith", "2000-05-28", 2, 2, "R&D", 5000),
    (None, None, None, None, None, 3, "Finance", 3000),
    (4, "Joana", "Donne", "2002-04-05", 4, 4, "IT", 4000),
    (5, "Kate", "Grant", "2001-04-06", 5, 5, "HR", 2000),
    (6, "Christopher", "Johnson", "2001-04-06", 5, 5, "HR", 2000),
    (None, None, None, None, None, 6, "PR", 3000),
    (7, "George", "Cage", "2003-10-09", 7, 7, "CustomerService", 2300),
    (8, "Jacob", "Brown", "2003-10-09", 8, 8, "Production", 2400),
    (9, "John", "Black", "2004-05-09", 9, 9, "Quality", 3400),
    (None, None, None, None, None, 10, "Sales", 3500),
    (10, "Charlie", "Page", "2000-11-12", 11, None, None, None),
    (1, "Mary", "Parker", "1999-04-03", 12, None, None, None),
]

# TPC-H specification 4.2.3 (fixed dimension data; same in every
# dbgen output — validated against the reference's own
# tpch_connector/selectFromNationTiny.result golden).
NATIONS = [
    (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1),
    (3, "CANADA", 1), (4, "EGYPT", 4), (5, "ETHIOPIA", 0),
    (6, "FRANCE", 3), (7, "GERMANY", 3), (8, "INDIA", 2),
    (9, "INDONESIA", 2), (10, "IRAN", 4), (11, "IRAQ", 4),
    (12, "JAPAN", 2), (13, "JORDAN", 4), (14, "KENYA", 0),
    (15, "MOROCCO", 0), (16, "MOZAMBIQUE", 0), (17, "PERU", 1),
    (18, "CHINA", 2), (19, "ROMANIA", 3), (20, "SAUDI ARABIA", 4),
    (21, "VIETNAM", 2), (22, "RUSSIA", 3), (23, "UNITED KINGDOM", 3),
    (24, "UNITED STATES", 1),
]
REGIONS = [
    (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
    (3, "EUROPE"), (4, "MIDDLE EAST"),
]

# presto-tpch connector column names = spec names without the
# per-table prefix (TpchMetadata.java / airlift tpch Column enums).
_TINY_RENAMES = {
    "nation": "n_", "region": "r_", "customer": "c_", "orders": "o_",
    "lineitem": "l_", "part": "p_", "supplier": "s_", "partsupp": "ps_",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_view(spark, name: str, rows, cols: list[tuple[str, str]]):
    """CREATE OR REPLACE TEMP VIEW from literal rows with typed casts
    (one analysis-time VALUES relation — no Python-side conversion)."""
    col_sql = ", ".join(
        f"CAST(v.c{i} AS {typ}) AS {col}" for i, (col, typ) in enumerate(cols)
    )
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    if rows:
        vals = ",\n".join(
            "(" + ", ".join(_lit(c) for c in r) + ")" for r in rows)
        body = f"SELECT {col_sql} FROM (VALUES\n{vals}\n) AS v({names})"
    else:
        nulls = ", ".join(["NULL"] * len(cols))
        body = (f"SELECT {col_sql} FROM (VALUES ({nulls})) AS v({names}) "
                f"WHERE 1 = 0")
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {body}")


def register_fixtures(spark: SparkSession) -> None:
    """Register every corpus fixture view (idempotent)."""
    _values_view(spark, "datatype", DATATYPE_ROWS, [
        ("c_bigint", "BIGINT"), ("c_double", "DOUBLE"),
        ("c_string", "STRING"), ("c_date", "DATE"),
        ("c_timestamp", "TIMESTAMP_NTZ"), ("c_boolean", "BOOLEAN"),
        ("c_short_decimal", "DECIMAL(5,2)"),
        ("c_long_decimal", "DECIMAL(30,10)"),
    ])
    _values_view(spark, "workers", WORKERS_ROWS, [
        ("id_employee", "INT"), ("first_name", "STRING"),
        ("last_name", "STRING"), ("date_of_employment", "STRING"),
        ("department", "INT"), ("id_department", "INT"),
        ("name", "STRING"), ("salary", "INT"),
    ])
    _values_view(spark, "empty", [], [("c1", "INT"), ("c2", "STRING")])
    nation_rows = [
        (k, n, r, f"nation comment {k}") for k, n, r in NATIONS
    ]
    _values_view(spark, "nation", nation_rows, [
        ("n_nationkey", "BIGINT"), ("n_name", "STRING"),
        ("n_regionkey", "BIGINT"), ("n_comment", "STRING"),
    ])
    region_rows = [(k, n, f"region comment {k}") for k, n in REGIONS]
    _values_view(spark, "region", region_rows, [
        ("r_regionkey", "BIGINT"), ("r_name", "STRING"),
        ("r_comment", "STRING"),
    ])
    # partsupp: schema-only (driver testdata ships none)
    _values_view(spark, "partsupp", [], [
        ("ps_partkey", "BIGINT"), ("ps_suppkey", "BIGINT"),
        ("ps_availqty", "INT"), ("ps_supplycost", "DOUBLE"),
        ("ps_comment", "STRING"),
    ])


# Full TPC-H spec column sets (TPC-H specification 1.4 table
# definitions).  The driver's parquet testdata is a slim subset; the
# corpus's hive_tpch/window/with_clause queries reference spec columns
# the slim tables lack (l_commitdate, p_container, c_phone, ...), so
# the replay catalog extends each table with NULL-typed spec columns —
# names/types analyze, execute-only values.
TPCH_SPEC_COLUMNS: dict[str, list[tuple[str, str]]] = {
    "customer": [
        ("c_custkey", "BIGINT"), ("c_name", "STRING"),
        ("c_address", "STRING"), ("c_nationkey", "BIGINT"),
        ("c_phone", "STRING"), ("c_acctbal", "DOUBLE"),
        ("c_mktsegment", "STRING"), ("c_comment", "STRING"),
    ],
    "orders": [
        ("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
        ("o_orderstatus", "STRING"), ("o_totalprice", "DOUBLE"),
        ("o_orderdate", "DATE"), ("o_orderpriority", "STRING"),
        ("o_clerk", "STRING"), ("o_shippriority", "INT"),
        ("o_comment", "STRING"),
    ],
    "lineitem": [
        ("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
        ("l_suppkey", "BIGINT"), ("l_linenumber", "INT"),
        ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
        ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
        ("l_returnflag", "STRING"), ("l_linestatus", "STRING"),
        ("l_shipdate", "DATE"), ("l_commitdate", "DATE"),
        ("l_receiptdate", "DATE"), ("l_shipinstruct", "STRING"),
        ("l_shipmode", "STRING"), ("l_comment", "STRING"),
    ],
    "part": [
        ("p_partkey", "BIGINT"), ("p_name", "STRING"),
        ("p_mfgr", "STRING"), ("p_brand", "STRING"),
        ("p_type", "STRING"), ("p_size", "INT"),
        ("p_container", "STRING"), ("p_retailprice", "DOUBLE"),
        ("p_comment", "STRING"),
    ],
    "supplier": [
        ("s_suppkey", "BIGINT"), ("s_name", "STRING"),
        ("s_address", "STRING"), ("s_nationkey", "BIGINT"),
        ("s_phone", "STRING"), ("s_acctbal", "DOUBLE"),
        ("s_comment", "STRING"),
    ],
}


def register_spec_tpch(spark: SparkSession) -> None:
    """Pad the engine's slim TPC-H views out to the full spec column
    set (missing columns as typed NULLs, engine extras kept).  Built
    from the already-registered DataFrame so re-registering the same
    view name is not self-referential."""
    for t, cols in TPCH_SPEC_COLUMNS.items():
        df = spark.table(t)
        have = set(df.columns)
        spec_names = {c for c, _ in cols}
        sel = [
            c if c in have else f"CAST(NULL AS {ty}) AS {c}"
            for c, ty in cols
        ] + [c for c in df.columns if c not in spec_names]
        df.selectExpr(*sel).createOrReplaceTempView(t)


def register_tiny_views(spark: SparkSession) -> None:
    """`tpch.tiny.<t>` spellings → `tiny_<t>` views with the
    presto-tpch connector's unprefixed column names.  nation/region
    come from the spec fixtures (golden-safe); fact tables rename
    whatever `<t>` view is already registered (execute-only data)."""
    register_fixtures(spark)
    for t, prefix in _TINY_RENAMES.items():
        cols = spark.table(t).columns
        sel = ", ".join(
            f"{c} AS {c[len(prefix):] if c.startswith(prefix) else c}"
            for c in cols
        )
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW tiny_{t} AS "
            f"SELECT {sel} FROM {t}"
        )
