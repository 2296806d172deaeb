"""Product-test corpus replay (reference test strategy §5.5).

The reference ships a golden-output SQL corpus —
presto-product-tests/src/main/resources/sql-tests/testcases/: 372
`.sql` files with 326 paired `.result` files in tempto's textual
format, plus the fixture datasets they run on
(sql-tests/datasets/*.ddl/*.data).  This package replays that corpus
through the Engine facade:

* ``format`` — parsers for tempto's `.sql` / `.result` / `.data`
  formats and the typed row comparison their directives imply
  (delimiter / ignoreOrder / trimValues / ignoreExcessRows / types).
* ``fixtures`` — the corpus fixture tables (datatype / workers /
  empty, sql-tests/datasets) plus the spec-fixed TPC-H tiny
  nation/region, registered as temp views.
* ``tpcds_schema`` — the public TPC-DS schema (24 empty tables) so
  the corpus's 103 TPC-DS testcases analyze and execute.
* ``replay`` — corpus discovery, the per-case replay policy
  (golden-compare / execute-only / skip, each with a recorded
  reason), and the runner.

The goldens are a third correctness source next to pytest and the
DuckDB differential oracle: they were produced by the reference
engine itself, so a byte/typed match here is direct output parity
with the reference, not agreement with an independent reimplementation.
"""
