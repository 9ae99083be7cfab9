from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"region_name", "nation_name", "order_month", "revenue", "n_items"} == set(df.columns)


def test_queries_have_callables_and_oracles(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert "flagship_star_revenue" in qs
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_headline_queries_run(spark, sf_dir):
    qs = entrymod.queries()
    for name in ["q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume"]:
        assert qs[name](spark, sf_dir).count() > 0
