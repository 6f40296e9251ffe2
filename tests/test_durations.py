import pytest

from tdengine_spark.durations import parse_duration


def test_fixed_units():
    assert parse_duration("10s").microseconds == 10_000_000
    assert parse_duration("500a").microseconds == 500_000
    assert parse_duration("2m").microseconds == 120_000_000
    assert parse_duration("1h").seconds == 3600
    assert parse_duration("1d").seconds == 86400
    assert parse_duration("1w").seconds == 7 * 86400
    assert parse_duration("5u").microseconds == 5
    assert parse_duration(250).microseconds == 250_000  # bare int = ms


def test_calendar_units():
    n = parse_duration("1n")
    assert n.is_calendar
    with pytest.raises(ValueError):
        _ = n.microseconds
    assert parse_duration("1y").interval_string() == "1 years"
    assert parse_duration("3n").interval_string() == "3 months"


def test_bad_literals():
    with pytest.raises(ValueError):
        parse_duration("10x")
    with pytest.raises(ValueError):
        parse_duration("abc")
