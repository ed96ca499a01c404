import pytest

from polaroam_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="polaroam-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def make_pings(spark, rows):
    """rows: (uid, lat, lon, ts) tuples."""
    return spark.createDataFrame(
        rows, "uid string, latitude double, longitude double, timestamp long"
    )
