"""Golden ETL parity: our Spark pipeline on the reference's raw CSVs must
reproduce the committed transactions_merged.csv exactly (SURVEY.md 5.2#1) —
2,069 rows x 7 string columns, order-insensitive — plus the section 5.2#4
property/invariant suite.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

REF = "/root/reference/Financial-Transaction-Data-Warehouse-Interactive-Dashboard"
ACCOUNT = f"{REF}/raw_file/account-statement-1-1-2024-12-31-2024.csv"
SYMBOLS = f"{REF}/raw_file/symbols.csv"
COUNTRY = f"{REF}/raw_file/country.csv"
GOLDEN = f"{REF}/transactions_merged.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference data not present"
)


@pytest.fixture(scope="module")
def warehouse(spark):
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.etl import (
        run_etl,
    )

    return run_etl(spark, ACCOUNT, SYMBOLS, COUNTRY)


def test_gold_matches_reference_output(spark, warehouse):
    import duckdb

    got = Counter(tuple(r) for r in warehouse.gold.collect())
    want_rows = duckdb.sql(
        f"SELECT quarter, country_name, symbol, company_name, sector, industry,"
        f" transaction_type FROM read_csv('{GOLDEN}', header=true,"
        f" all_varchar=true)"
    ).fetchall()
    want = Counter(tuple(r) for r in want_rows)
    assert sum(got.values()) == 2069
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing={list(missing.items())[:5]} extra={list(extra.items())[:5]}"
    )


def test_row_conservation(spark, warehouse):
    """2,281 raw - 212 unknown-symbol rows = 2,069 fact rows."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.etl import (
        missing_symbol_report,
        read_raw,
    )

    account, symbols, _ = read_raw(spark, ACCOUNT, SYMBOLS, COUNTRY)
    assert account.count() == 2281
    dropped = account.join(
        symbols.select("symbol"),
        account["Symbol"] == symbols["symbol"],
        "left_anti",
    ).count()
    assert dropped == 212
    assert missing_symbol_report(account, symbols).count() == 18
    assert warehouse.fact_transactions.count() == 2069


def test_duplicate_transaction_ids_preserved(warehouse):
    """The non-unique 'PK' is load-bearing (SURVEY.md 1.4#4): no dedup."""
    fact = warehouse.fact_transactions
    n = fact.count()
    n_distinct = fact.select("transaction_id").distinct().count()
    assert n == 2069
    assert n - n_distinct > 0  # duplicates survive


def test_dim_cardinalities_and_key_density(warehouse):
    """Surrogate ids are dense 1..n over sorted natural keys."""
    for df, id_col, expected_n in [
        (warehouse.dim_time, "time_id", 4),
        (warehouse.dim_geography, "geography_id", 42),
        (warehouse.dim_symbol, "symbol_id", 3194),
        (warehouse.dim_transaction_type, "transaction_type_id", 3),
    ]:
        rows = df.select(id_col).collect()
        ids = sorted(r[0] for r in rows)
        assert ids == list(range(1, expected_n + 1)), id_col


def test_transaction_types_preserve_divident(warehouse):
    """'DIVIDENT' misspelling is data, not a bug (SURVEY.md 1.4#2)."""
    types = sorted(
        r[0] for r in warehouse.dim_transaction_type.select("transaction_type").collect()
    )
    assert types == ["BUY", "DIVIDENT", "SELL"]


def test_country_remap(warehouse):
    names = {
        r[0] for r in warehouse.dim_geography.select("country_name").collect()
    }
    assert "Taiwan, Province of China" in names
    assert "Türkiye" in names
    assert "Taiwan" not in names
    assert "Turkey" not in names


def test_fact_referential_integrity(warehouse):
    """Every FK in the fact resolves to a dim row (J1 inner semantics)."""
    fact = warehouse.fact_transactions
    for dim, key in [
        (warehouse.dim_time, "time_id"),
        (warehouse.dim_geography, "geography_id"),
        (warehouse.dim_symbol, "symbol_id"),
        (warehouse.dim_transaction_type, "transaction_type_id"),
    ]:
        orphans = fact.join(dim.select(key), key, "left_anti").count()
        assert orphans == 0, key


def test_gold_kpis_match_survey(warehouse):
    """Golden KPIs verified in the survey (FIXTURES.md section B)."""
    from pyspark.sql import functions as F

    gold = warehouse.gold.cache()
    row = gold.agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("transaction_type") == "BUY", 1)).alias("buy"),
        F.count(F.when(F.col("transaction_type") == "SELL", 1)).alias("sell"),
        F.count(
            F.when(F.col("transaction_type").contains("DIVID"), 1)
        ).alias("divid"),
    ).collect()[0]
    assert (row.total, row.buy, row.sell, row.divid) == (2069, 984, 989, 96)
    # distinct symbols KPI (streamlit.py:118)
    assert gold.select("symbol").distinct().count() == 111


def test_golden_business_queries(warehouse):
    """Q1/Q2/Q3 canned queries (streamlit.py:378-447) golden outputs."""
    from pyspark.sql import functions as F

    gold = warehouse.gold

    q1 = (
        gold.filter(
            (F.col("transaction_type") == "SELL") & (F.col("country_name") == "China")
        )
        .groupBy("sector")
        .count()
        .orderBy(F.desc("count"), F.asc("sector"))
        .limit(5)
        .collect()
    )
    assert [(r.sector, r["count"]) for r in q1] == [
        ("Communication Services", 37),
        ("Industrials", 32),
        ("Technology", 26),
        ("Consumer Cyclical", 17),
    ]

    q2 = (
        gold.filter(
            (F.col("transaction_type") == "BUY") & (F.col("quarter") == "Q4")
        )
        .groupBy("industry")
        .count()
        .orderBy(F.desc("count"), F.asc("industry"))
        .limit(5)
        .collect()
    )
    assert [(r.industry, r["count"]) for r in q2] == [
        ("Semiconductors", 18),
        ("Internet Content & Information", 15),
        ("Software - Infrastructure", 10),
        ("Internet Retail", 8),
        ("Diagnostics & Research", 7),
    ]

    q3 = (
        gold.filter(F.col("transaction_type").isin("BUY", "SELL"))
        .groupBy("quarter")
        .count()
        .orderBy(F.desc("count"), F.asc("quarter"))
        .collect()
    )
    assert [(r.quarter, r["count"]) for r in q3] == [
        ("Q1", 968),
        ("Q2", 522),
        ("Q3", 242),
        ("Q4", 241),
    ]


def test_measure_fact_variant(spark):
    """keep_measures=True carries the raw Unit quantity through fact and
    gold (SURVEY 1.2's commitment; the reference drops it at
    etl.ipynb:151). Golden check: per-quarter SUM(unit) must equal DuckDB
    aggregating the raw CSV directly (same symbol anti-filter), and the
    default (measureless) gold stays schema-identical to the reference.
    """
    import duckdb
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.etl import (
        run_etl,
    )

    wh = run_etl(spark, ACCOUNT, SYMBOLS, COUNTRY, keep_measures=True)
    assert "unit" in wh.fact_transactions.columns
    assert "unit" in wh.gold.columns

    got = {
        (r["quarter"], r["total_units"])
        for r in wh.gold.groupBy("quarter")
        .agg(F.sum("unit").alias("total_units"))
        .collect()
    }
    want = set(
        duckdb.sql(
            f"""
            WITH raw AS (
              SELECT * FROM read_csv('{ACCOUNT}', header=true, delim=';',
                                     all_varchar=true)
            ), syms AS (
              SELECT * FROM read_csv('{SYMBOLS}', header=true, delim=';')
            )
            SELECT 'Q' || quarter(strptime(raw.Date, '%d/%m/%Y %H:%M:%S'))
                     AS quarter,
                   CAST(sum(CAST(raw.Unit AS BIGINT)) AS BIGINT) AS total_units
            FROM raw SEMI JOIN syms ON raw.Symbol = syms.Symbol
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want

    default_gold = run_etl(spark, ACCOUNT, SYMBOLS, COUNTRY).gold
    assert "unit" not in default_gold.columns
    assert len(default_gold.columns) == 7
