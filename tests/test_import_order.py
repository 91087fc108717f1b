"""Import-order regression guard.

`dedup.exact` depends on `text.analysis`; a module-level import from
any `text/` module back into `dedup/` creates a cycle that only
detonates when `dedup` is imported FIRST (the driver's registry loader
does exactly that via `queries.dedup`).  The normal test suite imports
`text` first and never sees it, so this test re-imports the package in
a clean subprocess with the dangerous order.
"""

from __future__ import annotations

import subprocess
import sys


def test_dedup_first_import_order():
    code = (
        "import urban_mobility_data_lakehouse_spark.dedup; "
        "import urban_mobility_data_lakehouse_spark.text; "
        "import urban_mobility_data_lakehouse_spark.queries as q; "
        "q._load_all(); "
        "assert len(q.REGISTRY) >= 50, len(q.REGISTRY)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
