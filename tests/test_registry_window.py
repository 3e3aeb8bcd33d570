"""Driver-window rotation invariants (VERDICT r2 task #1).

The driver checks only the FIRST ``DRIVER_WINDOW`` registry keys per
round; these tests pin the rotation so every key that needs a driver
row this round actually lands inside the window, and the keys rotated
out are exactly the twice-green set.
"""

from merlin_spark.queries.registry import (
    DRIVER_WINDOW,
    ORACLE_SQL,
    QUERIES,
    _BACK,
    _FRONT,
)


def test_front_keys_inside_driver_window():
    window = list(QUERIES)[:DRIVER_WINDOW]
    missing = [k for k in _FRONT if k in QUERIES and k not in window]
    assert not missing, f"priority keys outside the driver window: {missing}"


def test_only_back_keys_outside_window():
    outside = list(QUERIES)[DRIVER_WINDOW:]
    not_back = [k for k in outside if k not in _BACK]
    assert not not_back, (
        f"keys outside the 50-row window that are NOT in the twice-green "
        f"_BACK rotation list: {not_back} — grow _BACK or shrink the registry"
    )


def test_oracle_order_follows_query_order():
    qorder = [k for k in QUERIES if k in ORACLE_SQL]
    assert qorder == list(ORACLE_SQL)
