"""Large-star/small-star connected components: agreement with
min-label propagation where both converge, correctness where only the
star variant can (high-diameter graphs), and the loud-failure contract
of the label-prop backstop."""

from __future__ import annotations

import random

import pytest

from data_pipeline_with_hdfs_sql_integration_spark.plans.clustering import (
    MAX_ITERATIONS,
    connected_components,
    connected_components_star,
)


def test_star_agrees_with_labelprop_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    df = spark.createDataFrame(edges, "x long, y long").filter("x <> y")
    a = sorted(map(tuple, connected_components(df, "x", "y").collect()))
    b = sorted(map(tuple, connected_components_star(df, "x", "y").collect()))
    assert a == b and len(a) > 0


def test_star_handles_high_diameter_path(spark):
    """A path longer than the label-prop round budget: the star variant
    must still label every node with the component min (O(log n)
    rounds), which is exactly the case the variant exists for."""
    n = MAX_ITERATIONS + 10
    edges = [(1000 + i, 1000 + i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "x long, y long")
    labels = dict(map(tuple, connected_components_star(df, "x", "y").collect()))
    assert set(labels.values()) == {1000}
    assert len(labels) == n + 1


def test_labelprop_fails_loudly_past_round_budget(spark):
    edges = [(1000 + i, 1000 + i + 1) for i in range(MAX_ITERATIONS + 10)]
    df = spark.createDataFrame(edges, "x long, y long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "x", "y")


def test_star_two_components_and_star_shape(spark):
    edges = [(5, 3), (3, 9), (20, 21)]
    df = spark.createDataFrame(edges, "x long, y long")
    labels = dict(map(tuple, connected_components_star(df, "x", "y").collect()))
    assert labels == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}
