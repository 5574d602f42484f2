import pytest

from jassjr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("jassjr_spark_tests", master="local[4]", shuffle_partitions=4)
    # plan-gate tests assert on full file paths inside plan strings; Spark
    # truncates FileScan Location at maxMetadataStringLength (default 100),
    # and pytest tmp paths sit right at that boundary — a run-number digit
    # can flip a path-substring assertion
    s.conf.set("spark.sql.maxMetadataStringLength", "2000")
    yield s
