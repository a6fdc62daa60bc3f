"""JSON-bag column helpers: inference from samples, schema'd parsing,
recursive flattening, single-field extraction, driver-data smoke."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsflex_spark.utils.semistructured import (
    flatten_struct,
    infer_json_schema,
    json_field,
    parse_json_col,
)


@pytest.fixture(scope="module")
def bag(spark):
    rows = [
        (1, '{"k": 7, "tag": "a", "geo": {"lat": 1.5, "lon": 2.5}}'),
        (2, '{"k": 9, "tag": "b", "geo": {"lat": 3.5, "lon": 4.5}}'),
        (3, '{"k": 11}'),
        (4, None),
        (5, "not json at all"),
    ]
    return spark.createDataFrame(rows, "id long, props string")


def test_infer_unions_fields(spark, bag):
    sch = infer_json_schema(bag, "props")
    names = {f.name for f in sch.fields}
    assert {"k", "tag", "geo"} <= names
    geo = [f for f in sch.fields if f.name == "geo"][0]
    assert isinstance(geo.dataType, T.StructType)


def test_parse_and_flatten(spark, bag):
    out = parse_json_col(bag, "props")
    assert "props_parsed" in out.columns
    flat = flatten_struct(out, "props_parsed", prefix="p")
    got = {r["id"]: r for r in flat.collect()}
    assert got[1]["p_k"] == 7 and got[1]["p_tag"] == "a"
    assert got[1]["p_geo_lat"] == 1.5 and got[2]["p_geo_lon"] == 4.5
    assert got[3]["p_tag"] is None          # missing field → NULL
    assert got[5]["p_k"] is None            # malformed → NULL (PERMISSIVE)
    assert "props_parsed" not in flat.columns


def test_explicit_schema_is_used(spark, bag):
    sch = T.StructType([T.StructField("k", T.LongType())])
    out = parse_json_col(bag, "props", schema=sch)
    f = out.schema["props_parsed"].dataType
    assert [x.name for x in f.fields] == ["k"]


def test_json_field_single_key(spark, bag):
    out = bag.select("id", json_field("props", "geo.lat").alias("lat")).collect()
    got = {r["id"]: r["lat"] for r in out}
    assert got[1] == "1.5" and got[3] is None


def test_flatten_non_struct_raises(spark, bag):
    with pytest.raises(ValueError):
        flatten_struct(bag, "props")


def test_driver_events_props(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    parsed = parse_json_col(ev, "props", sample=200)
    flat = flatten_struct(parsed, "props_parsed", prefix="props")
    assert "props_k" in flat.columns
    n = flat.where(F.col("props_k").isNotNull()).count()
    assert n > 0


def test_infer_fraction_sees_late_fields(spark):
    rows = [(i, '{"early": 1}') for i in range(500)] + [
        (i, '{"late": 2}') for i in range(500, 1000)
    ]
    df = spark.createDataFrame(rows, "id long, props string").coalesce(1)
    names_limit = {f.name for f in infer_json_schema(df, "props", sample=300).fields}
    names_frac = {
        f.name for f in infer_json_schema(df, "props", fraction=0.3).fields
    }
    assert "late" not in names_limit   # limit() never reached the tail
    assert {"early", "late"} <= names_frac
