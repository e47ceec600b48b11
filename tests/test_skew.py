"""Skew-mitigation combinators: salted results must equal unsalted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ifcb_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
)
from ifcb_data_pipeline_spark.sources.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: r
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("total"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: r
        for r in salted_aggregate(
            lineitem,
            keys=["l_returnflag"],
            aggs={
                "n": (None, "count", "sum"),
                "total": ("l_quantity", "sum", "sum"),
                "mx": ("l_extendedprice", "max", "max"),
            },
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k]["n"] == plain[k]["n"]
        assert salted[k]["total"] == pytest.approx(plain[k]["total"], rel=1e-12)
        assert salted[k]["mx"] == plain[k]["mx"]


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").limit(5000)
    part = load_table(spark, sf_dir, "part").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    plain = lineitem.join(F.broadcast(part), "l_partkey").count()
    salted = salted_broadcast_join(lineitem, part, "l_partkey").count()
    assert salted == plain
