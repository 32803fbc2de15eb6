import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extraction_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        master="local[4]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()
