"""Spark-parallel corpus generation must be byte-identical to the serial
generator regardless of partitioning (the per-url determinism FIXTURES.md
promises — no global RNG state, no clock)."""

from ocr_spark import fixtures
from ocr_spark.genpages import pages_df


class TestGenPages:
    def test_parallel_generation_matches_serial(self, spark):
        par = {
            r.url: (bytes(r.html), r.lang, r.warc_ts)
            for r in pages_df(spark, 30, partitions=7).collect()
        }
        ser = {
            r["url"]: (r["html"], r["lang"], r["warc_ts"].replace(tzinfo=None))
            for r in fixtures.generate_pages_rows(30, with_crawl_text=False)
        }
        assert par.keys() == ser.keys()
        for url in ser:
            assert par[url][0] == ser[url][0], url  # payload bytes identical
            assert par[url][1] == ser[url][1]

    def test_partitioning_invariant(self, spark):
        a = sorted(
            (r.url, bytes(r.html)) for r in pages_df(spark, 20, partitions=1).collect()
        )
        b = sorted(
            (r.url, bytes(r.html)) for r in pages_df(spark, 20, partitions=13).collect()
        )
        assert a == b
