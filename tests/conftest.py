import pytest

from ner_backend_spark.spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("ner-backend-spark-tests", cores=4, shuffle_partitions=4)
    yield spark
    spark.stop()
