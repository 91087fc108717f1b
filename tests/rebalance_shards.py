#!/usr/bin/env python3
"""Regenerate tests/.file_weights.json from the junit XMLs the last
`run_tests_parallel.sh` run left in /tmp — measured per-FILE wall
seconds that the shard splitter's greedy LPT packs against.  Run after
adding or materially changing test files; stale weights only cost
balance, never correctness."""

from __future__ import annotations

import glob
import json
import os
import xml.etree.ElementTree as ET

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    weights: dict[str, float] = {}
    for xmlf in ("/tmp/pytest_shard_a.xml", "/tmp/pytest_shard_b.xml"):
        if not os.path.exists(xmlf):
            continue
        for case in ET.parse(xmlf).getroot().iter("testcase"):
            cls = case.get("classname", "")
            # classname = tests.test_foo[.Class]; map to the file
            mod = cls.split(".")[1] if cls.startswith("tests.") else (
                cls.split(".")[0]
            )
            f = f"tests/{mod}.py"
            weights[f] = weights.get(f, 0.0) + float(
                case.get("time", 0.0)
            )
    # keep only files that still exist; round for a stable diff
    live = set(
        os.path.relpath(p, os.path.dirname(HERE))
        for p in glob.glob(os.path.join(HERE, "test_*.py"))
    )
    weights = {
        f: round(s, 1) for f, s in sorted(weights.items()) if f in live
    }
    out = os.path.join(HERE, ".file_weights.json")
    with open(out, "w") as fh:
        json.dump(weights, fh, indent=1, sort_keys=True)
        fh.write("\n")
    total = sum(weights.values())
    print(f"{out}: {len(weights)} files, {total:.0f}s total")


if __name__ == "__main__":
    main()
