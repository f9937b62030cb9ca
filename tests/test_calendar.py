import numpy as np
import pytest

from xsdba_tpu.utils.calendar import TimeIndex, date_range, is_leap_year, max_doy


def test_daily_standard_vs_numpy():
    t = date_range("2000-01-01", periods=1500, freq="D", calendar="standard")
    ref = np.arange("2000-01-01", 1500, dtype="datetime64[D]").astype("datetime64[D]")
    years = ref.astype("datetime64[Y]").astype(int) + 1970
    months = ref.astype("datetime64[M]").astype(int) % 12 + 1
    days = (ref - ref.astype("datetime64[M]")).astype(int) + 1
    np.testing.assert_array_equal(t.year, years)
    np.testing.assert_array_equal(t.month, months)
    np.testing.assert_array_equal(t.day, days)


def test_dayofyear_leap():
    t = date_range("2000-02-28", periods=3, freq="D")
    np.testing.assert_array_equal(t.day, [28, 29, 1])
    np.testing.assert_array_equal(t.dayofyear, [59, 60, 61])


def test_noleap():
    t = date_range("2001-02-27", periods=3, freq="D", calendar="noleap")
    np.testing.assert_array_equal(t.day, [27, 28, 1])
    assert t.max_doy == 365
    t4 = date_range("2004-02-27", periods=3, freq="D", calendar="noleap")
    np.testing.assert_array_equal(t4.day, [27, 28, 1])


def test_360_day():
    t = date_range("2000-02-28", periods=4, freq="D", calendar="360_day")
    np.testing.assert_array_equal(t.day, [28, 29, 30, 1])
    np.testing.assert_array_equal(t.month, [2, 2, 2, 3])
    assert t.max_doy == 360
    y = date_range("2000-01-01", periods=721, freq="D", calendar="360_day")
    assert y.year[-1] == 2002 and y.month[-1] == 1 and y.day[-1] == 1


def test_monthly_yearly():
    t = date_range("1999-11-01", periods=4, freq="MS")
    np.testing.assert_array_equal(t.month, [11, 12, 1, 2])
    np.testing.assert_array_equal(t.year, [1999, 1999, 2000, 2000])
    y = date_range("2000-01-01", periods=3, freq="YS")
    np.testing.assert_array_equal(y.year, [2000, 2001, 2002])


def test_season():
    t = date_range("2000-01-01", periods=366, freq="D")
    assert t.season[0] == 0  # Jan -> DJF
    assert t.season[59] == 0  # Feb 29 -> DJF? (Feb -> DJF)
    assert t.season[60] == 1  # Mar 1 -> MAM
    assert t.season[-1] == 0  # Dec 31 -> DJF


@pytest.mark.parametrize(
    "cal,expected", [("standard", 366), ("noleap", 365), ("all_leap", 366), ("360_day", 360)]
)
def test_max_doy(cal, expected):
    assert max_doy(cal) == expected


def test_leap_years():
    assert bool(is_leap_year(2000))
    assert not bool(is_leap_year(1900))
    assert bool(is_leap_year(1900, "julian"))
    assert bool(is_leap_year(2004))
    assert not bool(is_leap_year(2001))


def test_infer_freq():
    assert date_range("2000-01-01", periods=10, freq="D").infer_freq() == "D"
    t = TimeIndex(np.array([2000, 2000]), np.array([1, 2]), np.array([1, 1]))
    assert t.infer_freq() == "MS"


def test_long_range_roundtrip():
    t = date_range("1850-01-01", periods=150 * 366, freq="D")
    # dates must be strictly increasing with no gaps
    assert np.all(np.diff(t.ordinal) == 1)
    assert t.year[0] == 1850


def test_isoweek_matches_datetime_isocalendar():
    """Exact ISO weeks on the standard calendar vs python datetime
    (reference base.py:324-325 uses pandas isocalendar)."""
    import datetime as dt

    from xsdba_tpu.utils.calendar import date_range

    t = date_range("1998-12-25", periods=5000, freq="D", calendar="standard")
    got = t.isoweek
    want = np.array([
        dt.date(int(y), int(m), int(d)).isocalendar()[1]
        for y, m, d in zip(t.year, t.month, t.day)
    ])
    np.testing.assert_array_equal(got, want)


def test_week_grouping_uses_isoweek_on_standard():
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("2004-12-25", periods=30, freq="D", calendar="standard")
    g = Grouper("time.week").group_of(t)
    # 2004-12-27..2005-01-02 is ISO week 53
    import datetime as dt

    want = np.array([dt.date(int(y), int(m), int(d)).isocalendar()[1] - 1
                     for y, m, d in zip(t.year, t.month, t.day)])
    np.testing.assert_array_equal(g, want.astype(np.int32))
    # idealized calendars keep the doy-block fallback
    tn = date_range("2004-12-25", periods=30, freq="D", calendar="noleap")
    gn = Grouper("time.week").group_of(tn)
    np.testing.assert_array_equal(gn, np.minimum((tn.dayofyear - 1) // 7, 52))


def test_parse_offset_seconds_vs_anchored():
    """Plain 'S' is the seconds frequency — the anchored-suffix strip must
    not swallow it (only YS/MS/QS/YE/... carry anchor suffixes)."""
    from xsdba_tpu.utils.calendar import compare_offsets, construct_offset, parse_offset

    assert parse_offset("S") == (1, "S", True, None)
    assert compare_offsets("S", "<", "D")
    assert parse_offset("MS")[1:3] == ("M", True)
    assert parse_offset("ME")[1:3] == ("M", False)
    assert parse_offset("YS")[1:3] == ("Y", True)
    assert construct_offset(*parse_offset("S")) == "S"
