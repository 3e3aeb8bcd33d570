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


def test_window_independent_of_import_order():
    """ADVICE r3 #1: importing a query submodule BEFORE registry used to
    append its keys after the rotation ran, pushing _FRONT keys out of
    the 50-row driver window. The decorator now lives in `base` (no
    back-import) and registry rotates the full set itself, so the
    window must be identical whichever module a consumer imports first.
    Fresh interpreter per order — in-process module caching would mask
    the bug this test pins."""
    import subprocess
    import sys

    def window(first_import: str) -> list[str]:
        code = (
            f"import {first_import}\n"
            "from merlin_spark.queries import registry\n"
            "print('\\n'.join(list(registry.QUERIES)[:registry.DRIVER_WINDOW]))\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            check=True, cwd=__file__.rsplit("/tests/", 1)[0],
        )
        return out.stdout.strip().splitlines()

    registry_first = window("merlin_spark.queries.registry")
    submodule_first = window("merlin_spark.queries.multimodal")
    assert registry_first == submodule_first
    assert len(registry_first) == DRIVER_WINDOW
