import pytest


@pytest.fixture(scope="session")
def spark():
    from table_transformer_spark.pipeline.session import get_spark

    spark = get_spark(app_name="ttspark-tests", cores=8,
                      shuffle_partitions=8)
    yield spark
    spark.stop()
