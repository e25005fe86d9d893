"""Round-4 relational shapes: outer-join distribution (Q13), anti-join +
countDistinct (Q16), disjunctive pushdown (Q19), scalar-subquery +
windowed anti-join (Q22), ranked returns (Q10), nation-pair volume (Q7).

Value-level parity with DuckDB is the driver gate's job
(oracle_sql()); these tests pin the SEMANTIC corners and the physical
plan shapes that the hash comparison can't see.
"""

from __future__ import annotations

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_shapes", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q13_preserves_zero_order_customers(spark, entry):
    """The left outer join must keep customers with no qualifying
    orders; the c_count=0 histogram bucket existing (and the histogram
    totalling exactly the customer count) proves it wasn't silently an
    inner join."""
    rows = {
        r["c_count"]: r["custdist"]
        for r in entry.q_q13_order_distribution(spark, SF_DIR).collect()
    }
    n_cust = entry._read(spark, SF_DIR, "customer").count()
    assert 0 in rows, "zero-order customers dropped -> inner-join bug"
    assert sum(rows.values()) == n_cust


def test_q16_anti_join_is_broadcast_hash(spark, entry):
    """NOT IN (negative-balance suppliers) must compile to a broadcast
    LeftAnti hash join, and the part dimension must also broadcast — no
    shuffle on either small side."""
    plan = _plan(entry.q_q16_supplier_cnt(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q19_disjunction_pushed_to_both_scans(spark, entry):
    """Catalyst must push the OR-of-conjunctions (or at least its
    derived superset bounds) into BOTH parquet scans rather than
    filtering after the join."""
    plan = _plan(entry.q_q19_disjunctive_revenue(spark, SF_DIR))
    scans = [seg for seg in plan.split("FileScan parquet") if "DataFilters" in seg]
    li_scans = [s for s in scans if "l_quantity" in s.split("DataFilters")[1][:400]]
    part_scans = [s for s in scans if "p_size" in s.split("DataFilters")[1][:400]]
    assert li_scans, "quantity bounds not pushed to lineitem scan"
    assert part_scans, "brand/size disjunction not pushed to part scan"


def test_q22_threshold_is_exact_and_nonempty(spark, entry):
    """The above-average-balance threshold uses exact integer-scaled
    arithmetic (acctbal * n_pos > sum_pos): the query must return rows
    on this corpus (vacuous 0-row results would make the oracle hash
    comparison meaningless)."""
    df = entry.q_q22_idle_customers(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["numcust"] > 0 for r in rows)


def test_q10_limit_is_deterministic(spark, entry):
    """Ranking ties are broken by the unique c_custkey, so two runs
    must return the identical top-20."""
    a = [tuple(r) for r in entry.q_q10_returned_items(spark, SF_DIR).collect()]
    b = [tuple(r) for r in entry.q_q10_returned_items(spark, SF_DIR).collect()]
    assert a == b
    assert len(a) == 20
    revenues = [r[3] for r in a]
    assert revenues == sorted(revenues, reverse=True)


def test_q7_nation_filters_applied_before_fact_join(spark, entry):
    """Both nation legs must be broadcast and the pair set must be the
    two asymmetric (supp, cust) combinations only."""
    df = entry.q_q7_volume_shipping(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    pairs = {(r["supp_nation"], r["cust_nation"]) for r in df.collect()}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert len(pairs) == 2
