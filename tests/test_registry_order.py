"""Registry ordering contract for the driver's CORRECTNESS window.

The driver hash-checks the FIRST 50 registry entries in dict order.  r3
proved dict order silently starves whatever lands past position 50 (all
of Group B + the GROUP_A tail went unchecked).  Pin that the window always
contains (a) every query that has ever been driver-starved and (b) every
Group B training-data-pipeline query, so a future registry edit cannot
silently push hard-signal coverage off a query that needs it.
"""

from data_cube_utilities_spark import queries, queries_text

WINDOW = 50


def test_priority_queries_inside_driver_window():
    window = list(queries.registry())[:WINDOW]
    missing = [k for k in queries._PRIORITY if k not in window]
    assert not missing, f"priority queries fell out of the window: {missing}"


def test_all_group_b_inside_driver_window():
    window = set(list(queries.registry())[:WINDOW])
    missing = [k for k in queries_text.GROUP_B if k not in window]
    assert not missing, f"Group B starved again: {missing}"


def test_registry_is_complete_and_unchanged_membership():
    full = set(queries.GROUP_A) | set(queries_text.GROUP_B)
    reg = queries.registry()
    assert set(reg) == full
    # every entry keeps its (callable, sql) tuple intact
    for name, (fn, sql) in reg.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_tail_queries_are_long_green_veterans():
    """Only rows with 3 rounds of green driver history may sit past 50."""
    veterans = {
        "anti_join_quality_gate", "time_buffer", "asof_join", "ffill",
        "window_baseline", "topk", "mean_mosaic_int", "median_mosaic",
        "max_by_selector", "first_last_valid", "trend_slope", "find_gaps",
        "reduce_on_day", "frequency_counts", "cloud_coverage_table",
        "stacked_union", "acquisition_dates", "query_metadata",
        "pricing_summary", "overlapping_extents",
    }
    tail = set(list(queries.registry())[WINDOW:])
    assert tail <= veterans, f"non-veteran starved: {tail - veterans}"
