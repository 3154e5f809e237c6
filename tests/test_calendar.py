"""Calendar semantics: leap-aware hybrid dates (mod_calendar.f90) vs the
strict 365-day model calendar (mod_tsteps.f90 / mod_date) used by
multi-year free runs so 1460-cycle years stay phase-aligned with the
climatology tables (VERDICT r4 weak #5)."""

from speedy_ml_tpu.data.calendar import (ModelDate, day_of_year_365,
                                         hour_delta, hour_of_year_365,
                                         hours_into_year, leap_year)


def test_leap_rule():
    assert leap_year(1992) and leap_year(2000)
    assert not leap_year(1993) and not leap_year(1900)


def test_cal365_year_is_exactly_1460_cycles():
    d = ModelDate(1990, 2, 1, 0, cal365=True)
    for years in (1, 4, 20):
        e = d.advance_hours(years * 1460 * 6)
        assert (e.year, e.month, e.day, e.hour) == (1990 + years, 2, 1, 0)


def test_leap_aware_date_drifts_across_feb29():
    d = ModelDate(1990, 2, 1, 0)           # default: Feb 29 inserted 1992
    e = d.advance_hours(20 * 1460 * 6)
    assert (e.month, e.day) != (2, 1)      # the r4 flagship's slow drift


def test_cal365_never_visits_feb29():
    d = ModelDate(1992, 2, 28, 0, cal365=True)
    assert (d.advance_day().month, d.advance_day().day) == (3, 1)
    d = ModelDate(1992, 2, 28, 0)
    assert (d.advance_day().month, d.advance_day().day) == (2, 29)


def test_cal365_hour_of_year_alignment():
    d = ModelDate(1990, 1, 1, 0, cal365=True)
    for k in range(0, 12):
        assert hour_of_year_365(d) == (k * 2190) % 8760
        d = d.advance_hours(2190)
    # leap-aware dates pick up the +24h offset after Feb in leap years
    a = ModelDate(1992, 3, 1, 0)
    b = ModelDate(1992, 3, 1, 0, cal365=True)
    assert hours_into_year(a) - hours_into_year(b) == 24


def test_cal365_propagates_and_hour_delta():
    d = ModelDate(1991, 12, 31, 18, cal365=True)
    e = d.advance_hours(6)
    assert e.cal365 and (e.year, e.month, e.day, e.hour) == (1992, 1, 1, 0)
    assert hour_delta(d, d.advance_hours(8760)) == 8760
    assert day_of_year_365(ModelDate(1992, 12, 31, cal365=True)) == 364
