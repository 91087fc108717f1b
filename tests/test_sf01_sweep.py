"""Full oracle sweep at sf0.1 — the slow lane.

Band/bucket structures (minhash bands, simhash votes, LSH buckets,
IVF cells, packing bins) only develop interesting collision behavior
on larger corpora; the default sf0.001 lane can't catch a bug that
needs a populated bucket.  This sweep re-runs every oracle-checked
registry query at sf0.1 — 100× the default test scale, the same data
the bench runs on.

Off by default (it roughly doubles suite wall time); enable with
``SPARK_GRAFT_SLOW=1 python -m pytest tests/test_sf01_sweep.py -q``.
Last full run (with test_sf01_features.py): 53/53 passed in 185 s on
local[8] (2026-08-14).
"""

from __future__ import annotations

import os

import pytest

from urban_mobility_data_lakehouse_spark.queries import (
    REGISTRY,
    _load_all,
)

from .oracle_utils import assert_frames_match

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="sf0.1 oracle sweep is the slow lane; set SPARK_GRAFT_SLOW=1",
)

SF01_DIR = "/root/testdata/sf0.1"

_load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_sf01_oracle_sweep(spark, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF01_DIR)
    assert_frames_match(df, spec.oracle_for(SF01_DIR), SF01_DIR, name)
