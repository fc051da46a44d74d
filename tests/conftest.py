import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    s = get_spark("ocr-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """Deterministic 60-doc pages table (covers kinds A/B/C, all langs)."""
    from ocr_spark.fixtures import write_pages_parquet

    path = tmp_path_factory.mktemp("data") / "pages.parquet"
    return str(write_pages_parquet(path, 60))
