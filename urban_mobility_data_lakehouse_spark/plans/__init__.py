from .explain import (  # noqa: F401
    assert_broadcast_join,
    assert_no_broadcast_join,
    formatted_plan,
    pushed_filters,
    scan_columns,
)
