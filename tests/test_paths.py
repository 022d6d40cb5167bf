"""Storage-path seam (sources/paths.py): scheme-agnostic joining and
cache-key normalization must treat local paths and object-store URIs
uniformly — the reference's hardcoded gs:// constants
(src/gcs/paths.py:1-4) become one configured root."""

from __future__ import annotations

from nyc_taxi_etl_pyspark_spark.sources.paths import (
    MedallionPaths,
    StorageLayout,
    is_local_uri,
    join_uri,
    normalize_uri,
    uri_scheme,
)


def test_join_uri_schemes():
    assert join_uri("/data/sf0.1", "lineitem.parquet") == "/data/sf0.1/lineitem.parquet"
    assert join_uri("/data/sf0.1/", "lineitem.parquet") == "/data/sf0.1/lineitem.parquet"
    assert join_uri("s3a://bucket/prefix/", "t", "x.parquet") == (
        "s3a://bucket/prefix/t/x.parquet"
    )
    assert join_uri("gs://b", "raw") == "gs://b/raw"
    assert join_uri("hdfs://nn:8020/warehouse", "db", "t") == (
        "hdfs://nn:8020/warehouse/db/t"
    )


def test_normalize_uri_does_not_mangle_schemes():
    # os.path.normpath would rewrite s3a://b -> s3a:/b; ours must not
    assert normalize_uri("s3a://bucket/p/") == "s3a://bucket/p"
    assert normalize_uri("/a//b/./c/") == "/a/b/c"
    assert normalize_uri("/a/b") == normalize_uri("/a/b/")


def test_scheme_predicates():
    assert uri_scheme("/local/path") == ""
    assert uri_scheme("file:///local/path") == "file"
    assert uri_scheme("s3a://b/k") == "s3a"
    assert is_local_uri("/x") and is_local_uri("file:///x")
    assert not is_local_uri("gs://b/x")


def test_storage_layout_and_medallion():
    lay = StorageLayout(root="s3a://lake/fixtures/sf1")
    assert lay.table("orders") == "s3a://lake/fixtures/sf1/orders.parquet"
    assert lay.scheme == "s3a" and not lay.is_local
    assert StorageLayout(root="/d", dir_per_table=True).table("t") == "/d/t"

    lake = MedallionPaths(root="gs://example-lake/nyc-taxi")
    assert lake.raw == "gs://example-lake/nyc-taxi/raw"
    assert lake.curated == "gs://example-lake/nyc-taxi/curated"
    assert lake.agg == "gs://example-lake/nyc-taxi/agg"
    assert lake.models == "gs://example-lake/nyc-taxi/models"


def test_load_table_goes_through_layout(spark, sf_dir):
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

    # trailing slash and plain form must dedupe to one cache entry
    a = load_table(spark, sf_dir, "region")
    b = load_table(spark, sf_dir + "/", "region")
    assert a is b
    assert a.count() == 5


def test_clear_cache_prunes_key_locks(spark, sf_dir):
    """ADVICE r3: the per-key lock dict must not grow monotonically —
    clear_cache() prunes it alongside the DataFrame cache, and a reload
    afterwards still works (fresh lock, fresh cache entry)."""
    from nyc_taxi_etl_pyspark_spark.sources import tables as T

    T.load_table(spark, sf_dir, "nation")
    T.load_table(spark, sf_dir, "region")
    assert len(T._KEY_LOCKS) >= 2
    T.clear_cache()
    assert T._KEY_LOCKS == {} and T._CACHE == {}
    assert T.load_table(spark, sf_dir, "nation").count() > 0
    assert len(T._KEY_LOCKS) == 1
