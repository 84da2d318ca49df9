import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extractor_spark.session import build_session

    s = build_session(
        "pytest", cores=8, shuffle_partitions=8, driver_memory="8g"
    )
    yield s
    s.stop()
