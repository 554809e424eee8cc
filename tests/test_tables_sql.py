"""Catalog + raw-SQL surface: load_tables registers temp views that
plain ``spark.sql`` can query — including the nanos-timestamp events
table — so users aren't locked into the DataFrame API."""

from __future__ import annotations

from drive_bc_datapipeline_spark.tables import TABLE_NAMES, load_tables

SF = "/root/testdata/sf0.001"


def test_load_tables_registers_all_views(spark):
    tables = load_tables(spark, SF)
    assert set(tables) == set(TABLE_NAMES)
    existing = {t.name for t in spark.catalog.listTables()}
    assert set(TABLE_NAMES) <= existing


def test_raw_sql_over_views(spark):
    load_tables(spark, SF)
    # cross-table SQL with joins and time functions, through the views
    row = spark.sql(
        """
        SELECT COUNT(*) AS n
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        """
    ).first()
    assert row.n > 0
    # events view works despite TIMESTAMP(NANOS) storage
    ev = spark.sql(
        "SELECT event_type, COUNT(*) AS c, MAX(hour(ts)) AS mh "
        "FROM events GROUP BY event_type"
    ).collect()
    assert len(ev) == 5
    assert all(0 <= r.mh <= 23 for r in ev)
