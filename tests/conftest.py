import pytest


@pytest.fixture(scope="session")
def spark():
    from m5_competition_kaggle_spark.session import get_spark

    # Small parallelism for tiny test frames — shuffle-partition count is
    # a per-session knob, not part of operator semantics.
    s = get_spark("tests", cpus=4)
    yield s
