"""Error-bound attestations for the rows-only approximate sketches: the
driver can only check that they RUN (no cross-engine oracle exists for a
sketch), so the accuracy contract — the reason the sketch is trustworthy
as the 100 TB replacement for its exact twin — is pinned here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.plans.registry import all_queries
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """Greenwald-Khanna at accuracy=10000 bounds RANK error by
    n/accuracy; on the fixture that is a handful of rows, so the value
    must land within 1% of the exact interpolated percentile."""
    qs = all_queries()
    exact = {
        r["l_returnflag"]: (r["median_price"], r["p90_price"])
        for r in qs["q_agg_percentile"](spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["median_price_approx"], r["p90_price_approx"])
        for r in qs["q_agg_approx_percentile"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, (med_e, p90_e) in exact.items():
        med_a, p90_a = approx[flag]
        assert abs(med_a - med_e) / med_e < 0.01, (flag, med_a, med_e)
        assert abs(p90_a - p90_e) / p90_e < 0.01, (flag, p90_a, p90_e)


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """HyperLogLog++ at the engine's configured rsd must stay within 3
    standard deviations of the exact distinct count per group (the bound
    that justifies replacing the shuffle-heavy exact distinct at scale;
    q_hll_error reports the same per-group errors as a query)."""
    ev = load_table(spark, sf_dir, "events")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.05).alias("approx"),
        )
        .collect()
    )
    assert both
    for r in both:
        rel_err = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        assert rel_err < 0.15, (r["event_type"], r["approx"], r["exact"])
