"""Registry ordering contract for the driver's CORRECTNESS window.

The driver hash-checks the FIRST 50 registry entries in dict order.  r3
proved dict order silently starves whatever lands past position 50; r4's
static priority list fixed that once but pinned the same 20 veterans past
the window forever (ADVICE r4).  The standing policy pinned here is a
ROTATION: entries are ordered stalest-driver-check first (from the
driver's own CORRECTNESS_r*.json history), so every query periodically
re-enters the hard-check window and no green can age indefinitely.
"""

from data_cube_utilities_spark import queries, queries_text

WINDOW = 50


def test_registry_is_complete_and_unchanged_membership():
    full = set(queries.GROUP_A) | set(queries_text.GROUP_B)
    reg = queries.registry()
    assert set(reg) == full
    # every entry keeps its (callable, sql) tuple intact
    for name, (fn, sql) in reg.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_rotation_orders_stalest_first():
    """The registry order must be non-decreasing in the rotation key
    (last-green round, n-green, insertion idx) — the rule itself, not a
    fixed membership list."""
    hist = queries._correctness_history()
    if not hist:
        return  # fresh checkout: static fallback order applies
    full = dict(queries.GROUP_A)
    full.update(queries_text.GROUP_B)
    order_idx = {n: i for i, n in enumerate(full)}
    key = queries._rotation_key(hist, order_idx)
    names = list(queries.registry())
    ks = [key(n) for n in names]
    assert ks == sorted(ks), "registry not ordered by rotation key"


def test_every_stale_query_reenters_the_window():
    """Any query NOT checked green in the latest recorded round must be
    inside the next window (slack permitting: there are at most WINDOW
    such entries in steady state)."""
    hist = queries._correctness_history()
    if not hist:
        return
    latest = max(r for r, _ in hist.values())
    names = list(queries.registry())
    window = set(names[:WINDOW])
    stale = [n for n in names
             if queries._correctness_history().get(n, (0, 0))[0] < latest]
    overflow = [n for n in stale[:WINDOW] if n not in window]
    assert not overflow, f"stale queries starved: {overflow}"


def test_never_checked_queries_lead_the_window():
    """A brand-new registry entry (no CORRECTNESS history at all) must
    sort ahead of everything with a green row."""
    hist = queries._correctness_history()
    if not hist:
        return
    names = list(queries.registry())
    seen_checked = False
    for n in names:
        if n in hist:
            seen_checked = True
        else:
            assert not seen_checked, f"never-checked {n} sits after checked rows"


def test_tail_is_freshest_green():
    """Whatever sits past the window must be the FRESHEST rows available.
    When stale rows (not green in the latest recorded round, including
    never-checked newcomers) fit in the window, none may be starved;
    when they outnumber the window (a burst of new operators), only the
    overflow may spill, and it must be exactly the stalest-first order's
    tail — i.e. the freshest of the stale, which re-enter first next
    round."""
    hist = queries._correctness_history()
    if not hist:
        return
    latest = max(r for r, _ in hist.values())
    names = list(queries.registry())
    stale = [n for n in names if hist.get(n, (0, 0))[0] < latest]
    tail_stale = [n for n in names[WINDOW:]
                  if hist.get(n, (0, 0))[0] < latest]
    if len(stale) <= WINDOW:
        assert not tail_stale, f"stale rows starved by rotation: {tail_stale}"
    else:
        # exactly the overflow spills, and it is the stale set's tail in
        # rotation order (freshest last-green first to re-enter)
        assert tail_stale == stale[WINDOW:], (
            f"rotation starved the wrong rows: {tail_stale}")
