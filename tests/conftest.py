import pytest

#: modules auto-marked into the slow `replay` tier (see pytest.ini) —
#: each replays thousands of reference golden files; together ~3 h
_REPLAY_MODULES = {
    "test_reference_replay",
    "test_reference_replay_functions",
    "test_reference_replay_joins",
    "test_reference_replay_ops",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _REPLAY_MODULES:
            item.add_marker(pytest.mark.replay)


@pytest.fixture(scope="session")
def spark():
    from tdengine_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s
